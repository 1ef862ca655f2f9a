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

  /** None if `content` contains a valid metric line; Some(reason)
    * otherwise. */
  def validate(content: String): Option[String] = {
    if (content.trim.isEmpty)
      return Some("empty: no metric line (zero-byte or whitespace-only)")
    val mapper = new ObjectMapper
    val lines = content.linesIterator.map(_.trim).filter(_.nonEmpty)
    val problems = scala.collection.mutable.ListBuffer.empty[String]
    val ok = lines.exists { l =>
      try {
        val node = mapper.readTree(l)
        if (!node.isObject) { problems += "line is not a JSON object"; false }
        else if (!node.has("metric")) { problems += "no \"metric\" field"; false }
        else if (!node.has("value") || !node.get("value").isNumber) {
          problems += "no numeric \"value\" field"; false
        } else true
      } catch {
        case e: Exception => problems += s"unparseable JSON: $e"; false
      }
    }
    if (ok) None
    else Some(s"no valid metric line: ${problems.distinct.mkString("; ")}")
  }

  def validateFile(path: java.nio.file.Path): Option[String] =
    if (!java.nio.file.Files.exists(path)) Some("file does not exist")
    else validate(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))

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
