package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The session the correctness dump (and the fuzz runner) drives:
    * UTC, gate extensions, shuffle partitions = cores — one definition
    * so a fuzz pass can never diverge from the driver gate on session
    * config alone. */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName ...] — extra names restrict the
    // dump to those queries (local iteration; the driver passes two)
    val sfDir = args(0); val outDir = args(1)
    val only = args.drop(2).toSet
    val spark = session()
    run(spark, sfDir, outDir, only)
    spark.stop()
  }

  /** One full correctness dump: every (filtered) gate query's result →
    * `outDir/<name>/` parquet, plus `outDir/oracle_sql.json`. Factored
    * out of [[main]] so `graft.tools.Fuzz` can run the dump repeatedly
    * (one corpus per seed) inside a single session. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Set[String]): Unit = {
    // schema-drift preflight: name the table + actual type loudly BEFORE
    // the gate turns a silent testdata regeneration into 15 red queries
    SchemaCanary.drift(spark, sfDir)
      .foreach(m => System.err.println(s"[verify] $m"))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // several builders localCheckpoint() a tokenized intermediate;
      // those storage blocks are otherwise reclaimed only when the
      // ContextCleaner GCs the RDD — drop them as each query finishes
      // so the dumps don't accumulate block-manager memory. The sweep
      // skips Shared cores (the pair graph / components / quality
      // scan later queries still read — a blanket unpersist would
      // break them: localCheckpoint lineage can't recompute)
      Shared.sweepTransient(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
