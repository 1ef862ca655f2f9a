package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench's FINAL stdout line (round-21 contract fix): the driver
  * keeps only a ~2000-char tail of the bench's output, and for twenty
  * rounds every line carrying the full per-query map (~5 KB at 184
  * queries) was truncated to an unparseable rump — `parsed: null` in
  * every BENCH_r*.json. The summary line must therefore (a) be a
  * complete standalone JSON object, (b) carry NO per-query map, and
  * (c) stay far under the tail window even together with sbt's
  * trailing `[success]` line, at any plausible query count. */
class BenchSummarySpec extends AnyFunSuite {
  private val mapper = new ObjectMapper

  private def line(noisy: Boolean = false, errors: Int = 0): String =
    graft.Bench.summaryJson(
      total = "148.71", sfName = "sf0.1", modeField = "\"mode\":\"sequential\",",
      noisyField = if (noisy) "\"noisy_host\":true," else "",
      errorsField = if (errors > 0) s""""errors":$errors,""" else "",
      load = 0.37, loadAmbient = 0.14, nQueries = 184)

  test("summary line is one complete JSON object with metric/value " +
    "and NO queries map") {
    val n = mapper.readTree(line())
    assert(n.isObject)
    assert(n.get("metric").asText == "total")
    assert(n.get("value").isNumber && n.get("value").asDouble == 148.71)
    assert(n.get("unit").asText == "sec")
    assert(n.get("sf").asText == "sf0.1")
    assert(n.get("mode").asText == "sequential")
    assert(n.get("n_queries").asInt == 184)
    assert(n.get("load_ambient").asDouble == 0.14)
    assert(!n.has("queries"),
      "the per-query map is what overflowed the driver's tail window " +
        "for 20 rounds; it lives in target/bench.json, pointed at by " +
        "the record field")
    assert(n.get("record").asText == "target/bench.json")
  }

  test("summary line fits the driver's 2000-char tail window with wide " +
    "margin (VERDICT r20: < 1 KB), flags included") {
    val worst = line(noisy = true, errors = 184)
    assert(worst.length < 1000, s"summary line is ${worst.length} chars")
    assert(!worst.contains("\n"))
    val n = mapper.readTree(worst)
    assert(n.get("noisy_host").asBoolean && n.get("errors").asInt == 184)
  }

  test("summary line passes BenchGuard as a metric record and inherits " +
    "the sequential ambient gate") {
    assert(graft.tools.BenchGuard.validate(line()).isEmpty)
    val contaminated = graft.Bench.summaryJson(
      "163.4", "sf0.1", "\"mode\":\"sequential\",", "", "", 13.41, 0.94, 184)
    assert(graft.tools.BenchGuard.validate(contaminated).isDefined,
      "a contaminated-ambient summary must still be refused as a record")
  }
}
