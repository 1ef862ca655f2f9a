package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchGuard

/** The capture-protocol guard: a deliberately-empty artifact must
  * FAIL the check (the round-17 failure mode — a 0-byte
  * BENCH_SEQ_r17.json committed as if it were a record), and a real
  * capture line must pass. */
class BenchGuardSpec extends AnyFunSuite {
  test("a deliberately-empty artifact fails the guard") {
    assert(BenchGuard.validate("").isDefined)
    assert(BenchGuard.validate("   \n\n  ").isDefined)
  }

  test("a zero-byte FILE fails, a populated capture file passes") {
    val dir = java.nio.file.Files.createTempDirectory("benchguard")
    val empty = dir.resolve("BENCH_SEQ_rX.json")
    java.nio.file.Files.write(empty, Array.emptyByteArray)
    assert(BenchGuard.validateFile(empty).isDefined,
      "a zero-byte capture file must be rejected")
    assert(BenchGuard.validateFile(dir.resolve("missing.json")).isDefined)
    val good = dir.resolve("BENCH_good.json")
    java.nio.file.Files.write(good,
      ("""{"metric":"total","value":12.3,"unit":"sec","queries":{"q1":0.5}}"""
        + "\n").getBytes("UTF-8"))
    assert(BenchGuard.validateFile(good).isEmpty)
  }

  test("junk, non-object, metric-less and value-less lines all fail; " +
    "one valid line among noise passes") {
    assert(BenchGuard.validate("not json at all").isDefined)
    assert(BenchGuard.validate("[1,2,3]").isDefined)
    assert(BenchGuard.validate("""{"value":1.0}""").isDefined)
    assert(BenchGuard.validate("""{"metric":"total"}""").isDefined)
    assert(BenchGuard.validate("""{"metric":"total","value":"fast"}""").isDefined)
    // a real capture is 1+ lines; stderr noise around the metric line
    // must not fail a genuine record
    assert(BenchGuard.validate(
      "some log line\n" +
        """{"metric":"total","value":42.0,"unit":"sec"}""" + "\n").isEmpty)
  }

  test("the repo's two historical record shapes pass: nested composite " +
    "records and the driver wrapper with the metric line in a log field") {
    // the r9-style composite: metric records one level down
    assert(BenchGuard.validate(
      """{"note":"x","concurrent":{"metric":"total","value":13.9,"unit":"sec"},""" +
        """"sequential":{"metric":"total","value":48.9}}""").isEmpty)
    // the driver's pretty-printed wrapper: the bench's own stdout line
    // rides ESCAPED inside a captured-log string field
    assert(BenchGuard.validate(
      "{\n  \"n\": 1,\n  \"tail\": \"noise\\n{\\\"metric\\\":\\\"total\\\"," +
        "\\\"value\\\":56.3,\\\"unit\\\":\\\"sec\\\"}\\nmore\",\n" +
        "  \"parsed\": null\n}").isEmpty)
    // a pretty-printed document with NO metric anywhere still fails
    assert(BenchGuard.validate("{\n  \"n\": 1,\n  \"tail\": \"noise\"\n}").isDefined)
  }

  test("a truncated metric-like fragment BEFORE the real embedded line " +
    "does not mask it (all occurrences are scanned)") {
    // round-18 ADVICE: the old single-indexOf scan would try only the
    // truncated first fragment and reject a genuine record
    assert(BenchGuard.validate(
      "{\n  \"tail\": \"partial {\\\"metric\\\":\\\"tot\\n" +
        "{\\\"metric\\\":\\\"total\\\",\\\"value\\\":7.5,\\\"unit\\\":\\\"sec\\\"}\\n\"\n}")
      .isEmpty)
    // ...but ONLY invalid fragments still fail
    assert(BenchGuard.validate(
      "{\n  \"tail\": \"partial {\\\"metric\\\":\\\"tot\\n{\\\"metric\\\": oops\\n\"\n}")
      .isDefined)
  }

  test("commitRecord: a metric-less capture leaves NO artifact at the " +
    "final path; a valid one lands atomically; a prior record survives " +
    "a rejected overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("benchcommit")
    val p = dir.resolve("BENCH_SEQ_rX.json")
    // invalid content: rejected, nothing at the final path, no .tmp left
    assert(BenchGuard.commitRecord(p, "").isDefined)
    assert(!java.nio.file.Files.exists(p),
      "a rejected commit must leave nothing at the final path")
    assert(!java.nio.file.Files.exists(dir.resolve("BENCH_SEQ_rX.json.tmp")),
      "a rejected commit must clean up its temp file")
    // valid content lands and re-validates from disk
    val good = """{"metric":"total","value":1.5,"unit":"sec"}""" + "\n"
    assert(BenchGuard.commitRecord(p, good).isEmpty)
    assert(BenchGuard.validateFile(p).isEmpty)
    // a later INVALID capture cannot clobber the committed record
    assert(BenchGuard.commitRecord(p, "  \n").isDefined)
    assert(BenchGuard.validateFile(p).isEmpty,
      "a rejected re-commit must leave the prior record untouched")
  }

  test("ambient gate: a contaminated SEQUENTIAL record (the r19 class, " +
    "ambient 0.94) cannot land at a BENCH_SEQ path ungated; the " +
    "override demands a noisy_host flag; concurrent and clean records " +
    "are untouched") {
    def seqRec(ambient: Double, noisy: Boolean = false): String = {
      val nf = if (noisy) "\"noisy_host\":true," else ""
      s"""{"metric":"total","value":163.4,"unit":"sec","mode":"sequential",""" +
        s"""$nf"load":13.41,"load_ambient":$ambient,"queries":{"q1":0.5}}""" + "\n"
    }
    // the exact r19 failure: ambient 0.94, committed as an era baseline
    val dir = java.nio.file.Files.createTempDirectory("benchambient")
    val p = dir.resolve("BENCH_SEQ_r20.json")
    val reason = BenchGuard.commitRecord(p, seqRec(0.94))
    assert(reason.isDefined, "an ambient-0.94 sequential record must be refused")
    assert(reason.get.contains("0.94") && reason.get.contains("contaminated"))
    assert(!java.nio.file.Files.exists(p),
      "the contaminated record must not land at the record path")
    // a clean-protocol capture (r18's 0.16, and the boundary side 0.3) lands
    assert(BenchGuard.validate(seqRec(0.16)).isEmpty)
    assert(BenchGuard.validate(seqRec(0.3)).isEmpty)
    // the override alone is NOT enough: a deliberate noisy diagnostic
    // must also carry the record-level noisy_host flag
    assert(BenchGuard.validate(seqRec(0.94), allowNoisyAmbient = true).isDefined)
    assert(BenchGuard.validate(seqRec(0.94, noisy = true),
      allowNoisyAmbient = true).isEmpty)
    // ...and without the override the flag alone does not admit it
    assert(BenchGuard.validate(seqRec(0.94, noisy = true)).isDefined)
    // concurrent-mode records are not gated on ambient here (their
    // protocol tolerates load; the 2.0 noisy_host flag marks them)
    assert(BenchGuard.validate(
      """{"metric":"total","value":26.3,"unit":"sec","mode":"concurrent",""" +
        """"load":5.0,"load_ambient":1.37,"queries":{"q1":0.5}}""" + "\n").isEmpty)
    // the nested composite shape is gated too: a contaminated
    // sequential half cannot hide one level down
    assert(BenchGuard.validate(
      """{"concurrent":{"metric":"total","value":13.9,"mode":"concurrent"},""" +
        """"sequential":{"metric":"total","value":163.4,"mode":"sequential",""" +
        """"load_ambient":0.94}}""").isDefined)
  }
}
