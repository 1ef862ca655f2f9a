package graft.streaming

import graft.SparkSpec
import graft.scale.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** [[NearDupMaintenance]] — the streaming twin of the q174 batch
  * board. The contract under test: the stream's verdicts equal the
  * batch board's rows for every signature-bearing arrival (the
  * reconciliation that makes "gate at arrival, publish at batch" one
  * consistent registry), and duplicate delivery is idempotent. */
class NearDupMaintenanceSpec extends SparkSpec {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  /** The q174 fixture shape: a frozen template family + frozen noise
    * below the boundary; new template copies (must match) and new
    * noise (must not) above it. */
  private val boundary = 200L
  private def fixture = {
    val tmpl = (1 to 50).map(i => s"w${i % 19}").mkString(" ")
    val rnd = new scala.util.Random(131)
    (1 to 60).map(i => (i.toLong, tmpl + s" v${i % 5}")) ++
      (61 to 199).map(i =>
        (i.toLong, (1 to 40).map(_ => s"z${rnd.nextInt(8000)}").mkString(" "))) ++
      (200 to 215).map(i => (i.toLong, tmpl + s" v${i % 5}")) ++
      (216 to 230).map(i =>
        (i.toLong, (1 to 40).map(_ => s"q${rnd.nextInt(8000)}").mkString(" ")))
  }

  test("stream verdicts reconcile with the FULL q174 batch board — " +
    "matched stats AND the matched=false spine rows") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = fixture
    val docs = all.toDF("doc_id", "text")
    val frozen = docs.filter(col("doc_id") < boundary)
    val idx = NearDupMaintenance.buildFrozenIndex(frozen, maxDist = 5)
      .localCheckpoint()
    val src = MemoryStream[DocArrival]
    val q = NearDupMaintenance.matches(src.toDS(), idx, maxDist = 5)
      .writeStream.format("memory").queryName("ndm")
      .outputMode("update").start()
    try {
      src.addData(all.filter(_._1 >= boundary).map { case (id, t) =>
        DocArrival(id, ts((id % 60).toInt), t) }: _*)
      q.processAllAvailable()
      val got = spark.table("ndm").as[NearDupVerdict].collect()
        .groupBy(_.doc_id).map { case (k, vs) => k -> vs.last }
      // batch reference: the q174 board over the same corpus
      val board = Dedup.incrementalNearDup(docs,
          Dedup.simhashPairs(docs, maxDist = 5), boundary)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("matched"), r.getAs[Long]("n_matches"),
            r.getAs[Long]("n_clusters"),
            Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong)))).toMap
      // the stream ALONE answers the whole board: every board row has
      // a verdict, matched or not, with identical stats — and no
      // verdict exists outside the board (same signature universe)
      assert(got.keySet === board.keySet,
        s"verdict spine != board spine: missing ${board.keySet -- got.keySet}," +
          s" extra ${got.keySet -- board.keySet}")
      for ((id, (matched, nm, nc, cl)) <- board) {
        val v = got(id)
        assert((v.matched, v.n_matches, v.n_clusters, v.cluster) ===
          ((matched, nm, nc, cl)), s"doc $id")
      }
      // the unmatched stratum really exercised: the new-noise docs
      // must all carry explicit matched=false rows
      val noiseIds = (216L to 230L)
      assert(noiseIds.forall(id => got.contains(id) && !got(id).matched),
        "new noise docs must emit matched=false spine rows")
      // the planted structure really fired: every new template copy
      // got a verdict, all joining the same frozen cluster
      val tmplIds = (200L to 215L)
      assert(tmplIds.forall(got.contains), "template copies must match")
      assert(tmplIds.map(got(_).cluster).toSet.size === 1)
    } finally q.stop()
  }

  test("duplicate delivery is idempotent: re-sending an arrival " +
    "re-emits the SAME verdict (state folds, never double-counts)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = fixture
    val frozen = all.toDF("doc_id", "text").filter(col("doc_id") < boundary)
    val idx = NearDupMaintenance.buildFrozenIndex(frozen, maxDist = 5)
      .localCheckpoint()
    val src = MemoryStream[DocArrival]
    val q = NearDupMaintenance.matches(src.toDS(), idx, maxDist = 5)
      .writeStream.format("memory").queryName("ndm2")
      .outputMode("update").start()
    try {
      val a = DocArrival(201L, ts(1), all.find(_._1 == 201L).get._2)
      // an UNMATCHED arrival rides the same contract: its spine row is
      // a stateless deterministic recompute, so re-delivery re-derives
      // the identical matched=false verdict
      val u = DocArrival(216L, ts(2), all.find(_._1 == 216L).get._2)
      src.addData(a, u); q.processAllAvailable()
      val first = spark.table("ndm2").as[NearDupVerdict].collect().toSeq
      src.addData(a, u); q.processAllAvailable() // second batch, same docs
      val after = spark.table("ndm2").as[NearDupVerdict].collect().toSeq
      assert(first.size === 2)
      assert(after.size === 4, "update mode re-emits the verdicts")
      assert(after.toSet.size === 2, "re-delivery must not change them")
      assert(after.toSet.map((v: NearDupVerdict) => (v.doc_id, v.matched)) ===
        Set((201L, true), (216L, false)))
    } finally q.stop()
  }

  /** The celled reconciliation contract at one band geometry: stream
    * verdicts ≡ the FULL q184 batch board (matched stats AND
    * matched=false spine rows) under duplicate delivery. Run at the
    * shipped dial and at a moved one — the stream and the batch derive
    * their band words from the same kernels and the same (nBands,
    * bandBits) constants, so the keys must stay bit-identical when the
    * dial moves, not just at the value it shipped with. */
  private def celledReconcileAt(nBands: Int, bandBits: Int,
      queryName: String): Unit = {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.scale.Similarity
    val rnd = new scala.util.Random(97)
    val dim = 12
    val boundary = 60L
    // clustered draw + planted structure (the q184 spec's fixture):
    // new 100 duplicates frozen 20; frozen 30/31 duplicate each other
    // and new 101 joins that cluster; noise supplies unmatched arrivals
    val bases = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val raw = (0 until 110).map { i =>
      val b = bases(rnd.nextInt(bases.length))
      (i.toLong, b.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }.toArray
    raw(100) = (100L, raw(20)._2)
    raw(31) = (31L, raw(30)._2)
    raw(101) = (101L, raw(30)._2)
    val emb = raw.toSeq.toDF("vec_id", "embedding").localCheckpoint()
    val minCos = 0.9
    val frozen = emb.filter(col("vec_id") < boundary)
    // seeds = first IvfCells rows, all frozen — the SAME plan-constant
    // list the batch chain keys the full corpus on
    val seeds = Similarity.seedCentroidList(frozen, Similarity.IvfCells)
    val idx = CelledNearDupMaintenance.buildFrozenIndex(frozen, minCos,
        nBands = nBands, bandBits = bandBits)
      .localCheckpoint()
    val src = MemoryStream[VecArrival]
    val q = CelledNearDupMaintenance.matches(src.toDS(), idx, seeds, minCos,
        nBands = nBands, bandBits = bandBits)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("update").start()
    try {
      val arrivals = raw.filter(_._1 >= boundary).map { case (id, v) =>
        // the stream carries doubles; cast EXACTLY like the batch
        // tables do (float32 → double, the toDoubleArray contract)
        VecArrival(id, ts((id % 60).toInt), v.map(_.toDouble).toArray) }
      src.addData(arrivals.toIndexedSeq: _*)
      q.processAllAvailable()
      // duplicate delivery: one matched and one unmatched arrival again
      src.addData(arrivals.find(_.vec_id == 100L).get,
        arrivals.find(a => a.vec_id != 100L && a.vec_id != 101L).get)
      q.processAllAvailable()
      val got = spark.table(queryName).as[NearDupVerdict].collect()
        .groupBy(_.doc_id).map { case (k, vs) => k -> vs.last }
      // re-delivered rows must all agree with the final verdict
      assert(spark.table(queryName).as[NearDupVerdict].collect()
        .groupBy(_.doc_id).forall(_._2.toSet.size == 1),
        "re-delivery changed a verdict")
      // batch reference: the q184 board over the same corpus, at the
      // SAME geometry
      val keyed = graft.scale.Dedup.celledKeyedVectors(emb, seeds)
        .localCheckpoint()
      val pairs = graft.scale.Dedup.embeddingNearDupCelledFrom(keyed,
        minCos, inputMaterialized = true,
        nBands = nBands, bandBits = bandBits)
      val board = graft.scale.Dedup
        .incrementalNearDupCelled(keyed, pairs, boundary)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Boolean]("matched"), r.getAs[Long]("n_matches"),
            r.getAs[Long]("n_clusters"),
            Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong)))).toMap
      assert(got.keySet === board.keySet,
        s"verdict spine != board spine: missing ${board.keySet -- got.keySet}," +
          s" extra ${got.keySet -- board.keySet}")
      for ((id, (matched, nm, nc, cl)) <- board) {
        val v = got(id)
        assert((v.matched, v.n_matches, v.n_clusters, v.cluster) ===
          ((matched, nm, nc, cl)), s"vec $id")
      }
      // planted strata fired: the exact duplicate matched, the cluster
      // join matched, and some arrivals are explicit matched=false
      assert(got(100L).matched && got(101L).matched)
      assert(got.values.exists(!_.matched),
        "no unmatched arrival — the spine contract is untested")
    } finally q.stop()
  }

  test("CELLED stream verdicts reconcile with the FULL q184 batch " +
    "board — matched stats AND matched=false spine rows — and " +
    "duplicate delivery re-emits the same verdicts") {
    celledReconcileAt(graft.scale.Dedup.CelledBands,
      graft.scale.Dedup.CelledBandBits, "cndm")
  }

  test("CELLED stream ≡ batch holds when the band-geometry dial " +
    "moves: a 4x2-bit index and stream agree bit-for-bit too") {
    assert((4, 2) !=
      ((graft.scale.Dedup.CelledBands, graft.scale.Dedup.CelledBandBits)),
      "pick a NON-shipped geometry or the test is the one above")
    celledReconcileAt(nBands = 4, bandBits = 2, "cndm4x2")
  }
}
