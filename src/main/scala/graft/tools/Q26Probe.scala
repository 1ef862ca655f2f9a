package graft.tools

import graft.functions.MinHashExpression.minhashBandHashes
import graft.functions.PortableFuncs._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Q26Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    println("scan partitions: " + docs.rdd.getNumPartitions)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("words only") {
      docs.select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 4).count()
    }
    time("bands via kernel") {
      docs.select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 4)
        .select(col("doc_id"),
          posexplode(minhashBandHashes(col("ws"), 4, 16, 4)).as(Seq("b", "bv")))
        .count()
    }
    spark.stop()
  }
}
