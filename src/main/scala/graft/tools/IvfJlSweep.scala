package graft.tools

import graft.{Tables => T}
import graft.scale.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off dial sweep for the q128/q88 ivf_jl arm: recall@5 vs brute
  * truth per probe count, per SF dir passed in argv. */
object IvfJlSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ivfjlsweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    for (dir <- args) {
      val emb = T.embeddings(spark, dir)
      val truth = Similarity.knnBrute(emb)
        .select(col("q_id"), col("c_id")).localCheckpoint()
      val nTruth = truth.count()
      for (probes <- Seq(1, 2, 3, 4)) {
        val hits = Similarity.annIvfJl(emb, nProbes = probes)
          .select(col("q_id"), col("c_id"))
          .join(truth, Seq("q_id", "c_id"), "left_semi").count()
        println(f"[ivfjlsweep] $dir probes=$probes recall=${hits.toDouble / nTruth}%.3f")
      }
    }
    spark.stop()
  }
}
