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

  test("stream verdicts reconcile with the q174 batch board, and " +
    "unmatched arrivals stay silent") {
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
      for ((id, (matched, nm, nc, cl)) <- board) {
        if (matched) {
          val v = got.getOrElse(id, fail(s"doc $id: board matched but no verdict"))
          assert((v.n_matches, v.n_clusters, v.cluster) === ((nm, nc, cl)),
            s"doc $id")
        } else assert(!got.contains(id), s"doc $id: verdict for an unmatched doc")
      }
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
      src.addData(a); q.processAllAvailable()
      val first = spark.table("ndm2").as[NearDupVerdict].collect().toSeq
      src.addData(a); q.processAllAvailable() // second batch, same doc
      val after = spark.table("ndm2").as[NearDupVerdict].collect().toSeq
      assert(first.size === 1)
      assert(after.size === 2, "update mode re-emits the verdict")
      assert(after.toSet.size === 1, "re-delivery must not change it")
    } finally q.stop()
  }
}
