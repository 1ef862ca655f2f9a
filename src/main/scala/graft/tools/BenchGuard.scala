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

  private def metricObject(node: com.fasterxml.jackson.databind.JsonNode): Boolean =
    node != null && node.isObject && node.has("metric") &&
      node.has("value") && node.get("value").isNumber

  /** A `{"metric":...}` line embedded in a captured-log string (the
    * driver's wrapper format carries the bench's stdout in a `tail`
    * field). Scans EVERY `{"metric"` occurrence, not just the first:
    * a truncated/invalid metric-like fragment earlier in the log tail
    * (e.g. a cut-off line from a previous rep) must not mask a
    * genuine record that follows it (round-18 ADVICE). */
  private def embeddedMetricLine(s: String, mapper: ObjectMapper): Boolean = {
    var i = s.indexOf("{\"metric\"")
    while (i >= 0) {
      val line = s.substring(i).takeWhile(_ != '\n')
      val ok = try metricObject(mapper.readTree(line))
               catch { case _: Exception => false }
      if (ok) return true
      i = s.indexOf("{\"metric\"", i + 1)
    }
    false
  }

  /** None if `content` holds a capture record; Some(reason) otherwise.
    * Accepted shapes (every one must resolve to an object with
    * `"metric"` + numeric `"value"`):
    *  - a metric line among the lines (the Bench main's own output);
    *  - a pretty-printed/whole-document object that IS one, NESTS one
    *    one level down (the r9 composite: `{"concurrent": {...},
    *    "sequential": {...}}`), or embeds one inside a captured-log
    *    string field (the driver's `tail` wrapper). */
  def validate(content: String): Option[String] = {
    if (content.trim.isEmpty)
      return Some("empty: no metric line (zero-byte or whitespace-only)")
    val mapper = new ObjectMapper
    val lineOk = content.linesIterator.map(_.trim).filter(_.nonEmpty).exists {
      l => try metricObject(mapper.readTree(l)) catch { case _: Exception => false }
    }
    val docOk = lineOk || {
      try {
        val root = mapper.readTree(content.trim)
        metricObject(root) || (root != null && root.isObject && {
          import scala.jdk.CollectionConverters._
          root.properties().asScala.exists { e =>
            metricObject(e.getValue) ||
              (e.getValue.isTextual &&
                embeddedMetricLine(e.getValue.asText, mapper))
          }
        })
      } catch { case _: Exception => false }
    }
    if (docOk) None
    else Some("no parseable {\"metric\":...,\"value\":N} record " +
      "(as a line, a document, a nested field, or an embedded log line)")
  }

  def validateFile(path: java.nio.file.Path): Option[String] =
    if (!java.nio.file.Files.exists(path)) Some("file does not exist")
    else validate(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))

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
    validate(new String(Files.readAllBytes(tmp), "UTF-8")) match {
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
