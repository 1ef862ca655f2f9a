package graft.tools

import graft.scale.{Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 design probe for the concentrated-embedding near-dup
  * chain: measures how the candidate-pair volume of q173's cross-modal
  * near-dup responds to (a) SemDeDup cell partitioning (argmax cosine
  * over the first-k seed centroids — q95's machinery), (b)
  * data-dependent hyperplanes (sign planes pointed along seed-centroid
  * DIFFERENCES — on L2-normalized vectors sign(v·(c_a − c_b)) is
  * exactly "closer to a than to b", a real splitter where the fixed
  * pseudo-random planes put ~the whole corpus in one bucket), and (c)
  * their composition. Prints, per scheme: group count, max group size,
  * and Σ d(d−1)/2 (the candidate pair volume a (group-equality)
  * self-join owes) vs the one-bucket baseline n(n−1)/2.
  */
object MediaCellProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = graft.Tables.documents(spark, sf)
    val emb = Multimodal.extractFeatures(spark,
        Multimodal.syntheticAssets(docs), dim = Multimodal.MediaAnnDim)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()

    val n = emb.count()
    println(s"n=$n  baseline pairs=${n * (n - 1) / 2}")

    def report(label: String, grouped: DataFrame, keys: Seq[String]): Unit = {
      val occ = grouped.groupBy(keys.map(col): _*).agg(count(lit(1)).as("d"))
        .agg(count(lit(1)).as("groups"), max(col("d")).as("max_d"),
          sum(col("d") * (col("d") - 1) / 2).as("pairs"))
        .collect()(0)
      println(f"$label%-22s groups=${occ.getLong(0)}%-6d max_d=${occ.getLong(1)}%-7d cand_pairs=${occ.getDouble(2).toLong}")
    }

    // (a) seed-centroid cells, q95 machinery, k = 16 and 64
    for (k <- Seq(16, 64)) {
      val cents = Similarity.seedCentroidList(emb, k)
      val assigned = emb.select(col("vec_id"),
        graft.functions.VectorExpressions.argMaxCosine(
          graft.functions.PortableFuncs.toDoubleArray(col("embedding")), cents).as("cell_id"))
      report(s"cells k=$k", assigned, Seq("cell_id"))
    }

    // (b) difference planes: plane_p = c_{off+2p} - c_{off+2p+1};
    // off=16 decorrelates the planes from the k=16 cell seeds
    for ((nPlanes, off) <- Seq((8, 0), (8, 16))) {
      val cents = Similarity.seedCentroidList(emb, off + 2 * nPlanes)
        .drop(off).map { case (i, v) => (i - off, v) }.toMap
      val v = graft.functions.PortableFuncs.toDoubleArray(col("embedding"))
      val bucket = (0 until nPlanes).map { p =>
        val diff = cents(2L * p).zip(cents(2L * p + 1)).map { case (a, b) => a - b }
        when(graft.functions.PortableFuncs.dotProduct(v,
          array(diff.map(lit): _*)) > 0d, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
      val b = emb.select(col("vec_id"), bucket.as("bucket"))
      report(s"diffplanes p=$nPlanes off=$off", b, Seq("bucket"))

      // (c) composed: cell x diff-bucket
      val cents16 = Similarity.seedCentroidList(emb, 16)
      val both = emb.select(col("vec_id"),
        graft.functions.VectorExpressions.argMaxCosine(v, cents16).as("cell_id"),
        bucket.as("bucket"))
      report(s"cells16 x planes$nPlanes off=$off", both, Seq("cell_id", "bucket"))
    }
    spark.stop()
  }
}
