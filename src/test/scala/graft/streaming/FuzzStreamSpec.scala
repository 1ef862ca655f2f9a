package graft.streaming

import graft.SparkSpec
import graft.scale.{Dedup, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The streaming twins on a RANDOMIZED corpus (round-18 prescription 6):
  * the fixed-fixture reconciliation specs pin stream ≡ batch on one
  * hand-planted draw; this suite replays a seeded [[graft.tools.FuzzGen]]
  * corpus — exact-duplicate documents, an all-identical embedding block,
  * epsilon near-copies, degenerate texts — through
  * [[NearDupMaintenance]] / [[CelledNearDupMaintenance]] with
  * OUT-OF-ORDER batches and CROSS-BATCH duplicate delivery, and
  * reconciles every verdict against the corresponding batch board.
  * The corpus is bit-deterministic per seed (FuzzGenSpec), so a red run
  * here is a permanent repro. */
class FuzzStreamSpec extends SparkSpec {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("fuzzstream").toString
    graft.tools.FuzzGen.write(spark, 11L, dir) // normal profile
    dir
  }

  test("SIMHASH stream ≡ q174 batch board on a fuzz corpus under " +
    "out-of-order batches and cross-batch duplicate delivery") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the fuzz documents table carries exact dups and near-dups across
    // any boundary by construction (25% / 12% draws)
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val boundary = 200L
    val frozen = docs.filter(col("doc_id") < boundary)
    val idx = NearDupMaintenance.buildFrozenIndex(frozen, maxDist = 5)
      .localCheckpoint()
    val src = MemoryStream[DocArrival]
    val q = NearDupMaintenance.matches(src.toDS(), idx, maxDist = 5)
      .writeStream.format("memory").queryName("fuzz_ndm")
      .outputMode("update").start()
    try {
      val arrivals = docs.filter(col("doc_id") >= boundary)
        .collect().map(r => DocArrival(r.getLong(0),
          ts((r.getLong(0) % 60).toInt), r.getString(1)))
      // out-of-order: deterministic shuffle, split into three batches,
      // with the FIRST batch's head re-delivered in the LAST batch
      val shuffled = new scala.util.Random(5).shuffle(arrivals.toSeq)
      val (b1, rest) = shuffled.splitAt(shuffled.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      src.addData(b3 ++ b1.take(5): _*); q.processAllAvailable()
      val all = spark.table("fuzz_ndm").as[NearDupVerdict].collect()
      // cross-batch re-delivery must not flip any verdict
      assert(all.groupBy(_.doc_id).forall(_._2.toSet.size == 1),
        "re-delivery across batches changed a verdict")
      val got = all.groupBy(_.doc_id).map { case (k, vs) => k -> vs.last }
      val board = Dedup.incrementalNearDup(docs,
          Dedup.simhashPairs(docs, maxDist = 5), boundary)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("matched"), r.getAs[Long]("n_matches"),
            r.getAs[Long]("n_clusters"),
            Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong)))).toMap
      assert(got.keySet === board.keySet,
        s"spine mismatch: missing ${board.keySet -- got.keySet}, " +
          s"extra ${got.keySet -- board.keySet}")
      for ((id, (matched, nm, nc, cl)) <- board)
        assert((got(id).matched, got(id).n_matches, got(id).n_clusters,
          got(id).cluster) === ((matched, nm, nc, cl)), s"doc $id")
      // the randomized draw really exercised both strata
      assert(got.values.exists(_.matched), "no matched arrival — the " +
        "fuzz corpus's duplicate draws never crossed the boundary")
      assert(got.values.exists(!_.matched), "no unmatched arrival")
    } finally q.stop()
  }

  test("CELLED stream ≡ q184 batch board on a fuzz corpus under " +
    "out-of-order batches and cross-batch duplicate delivery") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$corpusDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    // boundary INSIDE the identical/epsilon anchor block (ids 0-29):
    // frozen keeps the identical block, arrivals 25-29 are epsilon
    // near-copies that MUST match it; the gaussian tail is unmatched
    val boundary = 25L
    val minCos = 0.9
    val frozen = emb.filter(col("vec_id") < boundary)
    val seeds = Similarity.seedCentroidList(
      Similarity.nonZeroNorm(frozen), Similarity.IvfCells)
    val idx = CelledNearDupMaintenance.buildFrozenIndex(frozen, minCos)
      .localCheckpoint()
    val src = MemoryStream[VecArrival]
    val q = CelledNearDupMaintenance.matches(src.toDS(), idx, seeds, minCos)
      .writeStream.format("memory").queryName("fuzz_cndm")
      .outputMode("update").start()
    try {
      val arrivals = emb.filter(col("vec_id") >= boundary)
        .collect().map(r => VecArrival(r.getLong(0),
          ts((r.getLong(0) % 60).toInt),
          r.getSeq[Float](1).map(_.toDouble).toArray))
      val shuffled = new scala.util.Random(17).shuffle(arrivals.toSeq)
      val (b1, b2) = shuffled.splitAt(shuffled.size / 2)
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2 ++ b1.take(5): _*); q.processAllAvailable()
      val all = spark.table("fuzz_cndm").as[NearDupVerdict].collect()
      assert(all.groupBy(_.doc_id).forall(_._2.toSet.size == 1),
        "re-delivery across batches changed a verdict")
      val got = all.groupBy(_.doc_id).map { case (k, vs) => k -> vs.last }
      val keyed = Dedup.celledKeyedVectors(emb, seeds).localCheckpoint()
      val pairs = Dedup.embeddingNearDupCelledFrom(keyed, minCos,
        inputMaterialized = true)
      val board = Dedup.incrementalNearDupCelled(keyed, pairs, boundary)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Boolean]("matched"), r.getAs[Long]("n_matches"),
            r.getAs[Long]("n_clusters"),
            Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong)))).toMap
      assert(got.keySet === board.keySet,
        s"spine mismatch: missing ${board.keySet -- got.keySet}, " +
          s"extra ${got.keySet -- board.keySet}")
      for ((id, (matched, nm, nc, cl)) <- board)
        assert((got(id).matched, got(id).n_matches, got(id).n_clusters,
          got(id).cluster) === ((matched, nm, nc, cl)), s"vec $id")
      // the epsilon near-copies of the frozen anchor block must match
      assert((25L until 30L).forall(id => got(id).matched),
        "epsilon near-copies of the frozen anchor block must match it")
      assert(got.values.exists(!_.matched), "no unmatched arrival")
    } finally q.stop()
  }
}
