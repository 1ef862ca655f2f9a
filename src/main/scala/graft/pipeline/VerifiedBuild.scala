package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's most valuable end-to-end job — the verified-dataset
  * build (SURVEY §7.2): scan a datapoint table, run the pure validator
  * chain, keep clean rows, summarize, atomically publish.
  *
  * Replaces `scripts/validate_all_prod_dps.py` +
  * `scripts/create_verified_csv.py` with ONE Spark job: the reference
  * needed a task queue and a 4-process worker pool purely because
  * Python lacks a cluster scheduler; here the scan/validate/filter is a
  * single distributed dataflow and the docker stages (disabled by
  * default — `--docker` to enable) bound their own parallelism.
  *
  * Usage: VerifiedBuild <input.csv> <outDir> [--docker]
  */
object VerifiedBuild {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val outDir = args(1)
    val runDocker = args.contains("--docker")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-verified-build")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dps = TableIO.readCsv(spark, input).cache()
    val verified = Validators.verifiedDataset(
      spark, dps, new SubprocessRunner, runDocker = runDocker)

    TableIO.archiveSnapshotIfExists(s"$outDir/latest_verified", s"$outDir/archive")
    TableIO.atomicOverwrite(verified, s"$outDir/latest_verified",
      format = "csv", quoteAll = true)

    val total = dps.count()
    val kept = verified.count()
    val hist = dps.groupBy(col("difficulty")).count()
      .collect().map(r => s"${r.get(0)}=${r.get(1)}").sorted.mkString(", ")
    println(s"[verified-build] total=$total verified=$kept difficulty{$hist}")
    spark.stop()
  }
}
