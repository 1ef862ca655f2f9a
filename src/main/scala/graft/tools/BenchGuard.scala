package graft.tools

/** Guard for bench capture artifacts (`BENCH*.json`): a capture file
  * is only a record if it holds at least one parseable
  * `{"metric":...}` line with a numeric `value`. Round 17 committed a
  * ZERO-BYTE `BENCH_SEQ_r17.json` as if it were a capture — an empty
  * artifact is worse than a missing one because it reads as evidence
  * — so the capture workflow now runs this guard on every artifact
  * BEFORE committing it ([[main]] exits nonzero on the first invalid
  * file; the verify skill documents the step). Pure validation logic
  * in [[validate]] so the spec can exercise it without a filesystem.
  */
object BenchGuard {
  import com.fasterxml.jackson.databind.ObjectMapper

  private type Json = com.fasterxml.jackson.databind.JsonNode

  /** SEQUENTIAL records above this 1-min ambient load are refused as
    * era baselines: the capture protocol (NOTES) drains the host to
    * load < ~0.3 before launching sbt, and both documented
    * contamination incidents sat above it (r18 post-mortem 0.74 →
    * 165.9 s; r19's mislabeled 0.94 → 163.4 s vs the clean-era 118 s).
    * 0.5 splits the clean captures (0.16/0.27) from the contamination
    * band with margin on both sides. Concurrent-mode records are NOT
    * gated here: their protocol tolerates more ambient by design and
    * the 2.0 `noisy_host` flag already marks them. */
  val SeqAmbientCeiling = 0.5

  /** Env flag for committing a DELIBERATE noisy diagnostic — the
    * record must itself carry `"noisy_host":true` (capture it with
    * SPARK_GRAFT_BENCH_NOISY_LOAD lowered) so it can never be read as
    * a clean baseline. */
  val AllowAmbientEnv = "SPARK_GRAFT_BENCH_ALLOW_AMBIENT"

  private def metricObject(node: Json): Boolean =
    node != null && node.isObject && node.has("metric") &&
      node.has("value") && node.get("value").isNumber

  /** Every `{"metric":...}` line embedded in a captured-log string
    * (the driver's wrapper format carries the bench's stdout in a
    * `tail` field). Scans EVERY `{"metric"` occurrence, not just the
    * first: a truncated/invalid metric-like fragment earlier in the
    * log tail (e.g. a cut-off line from a previous rep) must not mask
    * a genuine record that follows it (round-18 ADVICE). */
  private def embeddedMetricLines(s: String, mapper: ObjectMapper): Seq[Json] = {
    val found = Seq.newBuilder[Json]
    var i = s.indexOf("{\"metric\"")
    while (i >= 0) {
      val line = s.substring(i).takeWhile(_ != '\n')
      try { val n = mapper.readTree(line); if (metricObject(n)) found += n }
      catch { case _: Exception => () }
      i = s.indexOf("{\"metric\"", i + 1)
    }
    found.result()
  }

  /** All metric records found in `content`, across every accepted
    * shape: a metric line among the lines (the Bench main's own
    * output); a pretty-printed/whole-document object that IS one,
    * NESTS one one level down (the r9 composite: `{"concurrent":
    * {...}, "sequential": {...}}`), or embeds one inside a
    * captured-log string field (the driver's `tail` wrapper). */
  private def collectRecords(content: String, mapper: ObjectMapper): Seq[Json] = {
    val fromLines = content.linesIterator.map(_.trim).filter(_.nonEmpty)
      .flatMap { l =>
        try { val n = mapper.readTree(l); if (metricObject(n)) Some(n) else None }
        catch { case _: Exception => None }
      }.toSeq
    val fromDoc =
      try {
        val root = mapper.readTree(content.trim)
        if (metricObject(root)) Seq(root)
        else if (root != null && root.isObject) {
          import scala.jdk.CollectionConverters._
          root.properties().asScala.toSeq.flatMap { e =>
            if (metricObject(e.getValue)) Seq(e.getValue)
            else if (e.getValue.isTextual)
              embeddedMetricLines(e.getValue.asText, mapper)
            else Seq.empty
          }
        } else Seq.empty
      } catch { case _: Exception => Seq.empty }
    fromLines ++ fromDoc
  }

  /** None if `content` holds a committable capture record;
    * Some(reason) otherwise. Two layers:
    *  1. at least one parseable `{"metric":...,"value":N}` record in
    *     any accepted shape (the r17 zero-byte class);
    *  2. no SEQUENTIAL record captured above [[SeqAmbientCeiling]]
    *     ambient (the r19 contaminated-baseline class) — unless
    *     `allowNoisyAmbient` AND the record itself is
    *     `noisy_host`-flagged, i.e. a deliberate diagnostic that can
    *     never be mistaken for a clean era baseline. */
  def validate(content: String, allowNoisyAmbient: Boolean = false): Option[String] = {
    if (content.trim.isEmpty)
      return Some("empty: no metric line (zero-byte or whitespace-only)")
    val mapper = new ObjectMapper
    val records = collectRecords(content, mapper)
    if (records.isEmpty)
      return Some("no parseable {\"metric\":...,\"value\":N} record " +
        "(as a line, a document, a nested field, or an embedded log line)")
    records.foreach { rec =>
      val seq = rec.path("mode").asText("") == "sequential"
      val amb = rec.path("load_ambient")
      if (seq && amb.isNumber && amb.asDouble > SeqAmbientCeiling) {
        if (!allowNoisyAmbient)
          return Some(f"sequential record captured at ambient ${amb.asDouble}%.2f " +
            f"> $SeqAmbientCeiling%.1f - a contaminated capture is worse than a " +
            "missing one (r19 post-mortem: 0.94 ambient read as a 1.385x " +
            s"regression); drain the host and recapture, or set $AllowAmbientEnv=1 " +
            "for a deliberate noisy diagnostic")
        if (!rec.path("noisy_host").asBoolean(false))
          return Some(f"ambient override set, but the sequential record " +
            f"(ambient ${amb.asDouble}%.2f) is not noisy_host-flagged - capture " +
            "deliberate diagnostics with SPARK_GRAFT_BENCH_NOISY_LOAD lowered so " +
            "the record can never read as a clean baseline")
      }
    }
    None
  }

  private def allowAmbientFromEnv: Boolean =
    sys.env.get(AllowAmbientEnv).exists(v => v == "1" || v == "true")

  def validateFile(path: java.nio.file.Path): Option[String] =
    if (!java.nio.file.Files.exists(path)) Some("file does not exist")
    else validate(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"),
      allowAmbientFromEnv)

  /** Guarded record commit — the temp+validate+rename discipline
    * `TableIO` uses for tables, applied to capture artifacts: write
    * `content` to `<path>.tmp`, [[validate]] what actually landed on
    * disk, and rename onto `path` only on pass. An interrupted or
    * metric-less capture therefore NEVER leaves a committable file at
    * the final path — the round-17 zero-byte-artifact failure mode is
    * structurally impossible, not just detectable after the fact.
    * Returns None on success, Some(reason) on rejection (the `.tmp`
    * is removed; whatever was previously at `path` is untouched). */
  def commitRecord(path: java.nio.file.Path, content: String): Option[String] = {
    import java.nio.file.{Files, StandardCopyOption}
    if (path.getParent != null) Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes("UTF-8"))
    validate(new String(Files.readAllBytes(tmp), "UTF-8"),
        allowAmbientFromEnv) match {
      case Some(reason) =>
        Files.deleteIfExists(tmp)
        Some(reason)
      case None =>
        Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING)
        None
    }
  }

  /** `runMain graft.tools.BenchGuard FILE...` — prints a verdict per
    * file, exits 1 if any is invalid. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchGuard FILE...")
    var bad = false
    for (f <- args) validateFile(java.nio.file.Paths.get(f)) match {
      case None => println(s"[benchguard] OK $f")
      case Some(reason) =>
        bad = true
        System.err.println(s"[benchguard] INVALID $f — $reason")
    }
    if (bad) sys.exit(1)
  }
}
