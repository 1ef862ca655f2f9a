package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class IndexMaintenanceSpec extends SparkSpec {

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  // two orthogonal unit centroids: cell 0 points along x, cell 1 along y
  val cents: Array[(Long, Array[Double])] = Array(
    0L -> Array(1.0, 0.0),
    1L -> Array(0.0, 1.0))

  test("assignCell picks the highest-cosine centroid, min id on ties") {
    assert(IndexMaintenance.assignCell(Array(0.9, 0.1), cents)._1 === 0L)
    assert(IndexMaintenance.assignCell(Array(0.1, 0.9), cents)._1 === 1L)
    // exact diagonal: equal cosine to both — smallest cell id wins
    assert(IndexMaintenance.assignCell(Array(1.0, 1.0), cents)._1 === 0L)
    // zero vector matches nothing well; still assigned deterministically
    assert(IndexMaintenance.assignCell(Array(0.0, 0.0), cents)._1 === 0L)
    // NaN embedding: every cosine comparison fails — rejected loudly
    // instead of silently accumulating state under phantom cell -1
    intercept[IllegalArgumentException](
      IndexMaintenance.assignCell(Array(Double.NaN, 1.0), cents))
  }

  test("a large single-cell batch streams through the state fold, and " +
    "the decimal sum makes means independent of arrival order") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 50k arrivals, ALL nearest cell 0, one micro-batch — the shape
    // that would have buffered the whole batch in one task under the
    // old sort-for-determinism fold; values vary so the sum is not
    // trivially order-invariant for doubles
    val arrivals = (0 until 50000).map { i =>
      VecArrival(i.toLong, ts(i % 60), Array(1.0, 1e-7 * (i % 997)))
    }
    def run(data: Seq[VecArrival], name: String): CellUpdate = {
      val src = MemoryStream[VecArrival]
      val q = IndexMaintenance.maintainIvf(src.toDS(), cents)
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        src.addData(data: _*)
        q.processAllAvailable()
        spark.table(name).as[CellUpdate].collect().head
      } finally q.stop()
    }
    val fwd = run(arrivals, "ivf_fwd")
    val rev = run(arrivals.reverse, "ivf_rev")
    assert(fwd.cell_id === 0L && fwd.n_batch === 50000L)
    // bit-identical means either way round: decimal addition is
    // associative, so iteration order cannot move the sum by an ulp
    assert(java.lang.Double.doubleToLongBits(fwd.mean_cos) ===
      java.lang.Double.doubleToLongBits(rev.mean_cos))
    assert(java.lang.Double.doubleToLongBits(fwd.batch_mean_cos) ===
      java.lang.Double.doubleToLongBits(rev.batch_mean_cos))
    assert(fwd.mean_cos > 0.999999 && fwd.mean_cos <= 1.0)
  }

  test("cell totals accumulate across micro-batches and drift flags a " +
    "rebuild when member cosine degrades") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[VecArrival]
    val q = IndexMaintenance.maintainIvf(src.toDS(), cents, driftThreshold = 0.9)
      .writeStream.format("memory").queryName("ivfm").outputMode("update").start()
    try {
      // batch 1: two well-aligned vectors for cell 0, one for cell 1
      src.addData(
        VecArrival(1, ts(0), Array(2.0, 0.0)),
        VecArrival(2, ts(1), Array(3.0, 0.0)),
        VecArrival(3, ts(2), Array(0.0, 5.0)))
      q.processAllAvailable()
      val b1 = spark.table("ivfm").as[CellUpdate].collect()
        .map(u => u.cell_id -> u).toMap
      assert(b1(0L).n_total === 2 && b1(0L).n_batch === 2)
      assert(b1(1L).n_total === 1)
      assert(!b1(0L).rebuild && !b1(1L).rebuild, "aligned members: no rebuild")
      // batch 2: drifted vectors still nearest to cell 0 but far
      // off-axis (cos ≈ 0.74-0.78 < 0.9) — the BATCH mean crosses the
      // threshold immediately even though only 2 of 4 lifetime members
      // drifted (a lifetime-mean detector would dilute the signal as
      // the index grows; the batch mean is history-independent)
      src.addData(
        VecArrival(4, ts(3), Array(1.0, 0.9)),
        VecArrival(5, ts(4), Array(1.0, 0.8)))
      q.processAllAvailable()
      val b2 = spark.table("ivfm").as[CellUpdate].collect()
        .filter(_.n_total === 4).head
      assert(b2.cell_id === 0L && b2.n_batch === 2)
      assert(b2.batch_mean_cos < 0.8 && b2.rebuild,
        s"drifted batch should flag rebuild, batch_mean=${b2.batch_mean_cos}")
      // lifetime mean lags the batch mean — it still counts the two
      // perfectly-aligned founders
      assert(b2.mean_cos > b2.batch_mean_cos)
    } finally q.stop()
  }

  test("PQ maintenance flags retrain on exactly the drifted subspace") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 2 subspaces × 2-dim codes; codes span the axes in both subspaces
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val src = MemoryStream[VecArrival]
    val q = IndexMaintenance.maintainPq(src.toDS(), books, errThreshold = 0.3)
      .writeStream.format("memory").queryName("pqm").outputMode("update").start()
    try {
      // batch 1: on-codebook vectors — zero error everywhere
      src.addData(
        VecArrival(1, ts(0), Array(1.0, 0.0, 0.0, 1.0)),
        VecArrival(2, ts(1), Array(0.0, 1.0, 1.0, 0.0)))
      q.processAllAvailable()
      val b1 = spark.table("pqm").as[SubspaceUpdate].collect()
        .map(u => u.m -> u).toMap
      assert(b1(0).n_total === 2 && b1(1).n_total === 2)
      assert(!b1(0).retrain && !b1(1).retrain)
      assert(b1(0).batch_mean_err === 0.0 && b1(1).batch_mean_err === 0.0)
      // batch 2: subspace 0 drifts off-codebook (err 0.5), subspace 1
      // stays on it — only codebook 0 needs re-k-means
      src.addData(VecArrival(3, ts(2), Array(0.5, 0.5, 0.0, 1.0)))
      q.processAllAvailable()
      val b2 = spark.table("pqm").as[SubspaceUpdate].collect()
        .filter(_.n_total === 3).map(u => u.m -> u).toMap
      assert(b2(0).retrain && b2(0).batch_mean_err === 0.5,
        s"subspace 0 should retrain: ${b2(0)}")
      assert(!b2(1).retrain && b2(1).batch_mean_err === 0.0)
    } finally q.stop()
  }

  test("streamed per-subspace error sums to the batch pqCodes SSE " +
    "bit-for-bit on the embeddings table") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    import graft.scale.Similarity.{PqSubspaces, PqSubDim}
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = emb.select(col("vec_id"),
      graft.functions.PortableFuncs.toDoubleArray(col("embedding")).as("v"))
      .as[(Long, Array[Double])].collect()
    // the codebook the batch side actually codes against: the TRAINED
    // one (collected once — exactly how a streaming job receives it)
    val books = {
      val cb = graft.scale.Similarity.pqTrainedCents(emb).collect().map(r =>
        (r.getAs[Int]("k"), r.getAs[Int]("m"), r.getAs[Seq[Double]]("cv").toArray))
      Array.tabulate(PqSubspaces) { m =>
        cb.filter(_._2 == m).sortBy(_._1).map(_._3)
      }
    }
    val batchSse = graft.scale.Similarity.pqCodes(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.foreach { case (id, v) =>
      val streamed = (0 until PqSubspaces)
        .map(m => IndexMaintenance.subspaceErr(v, m, books(m), PqSubDim)).sum
      assert(streamed === batchSse(id), s"vec $id SSE stream/batch differ")
    }
  }

  test("streamed assignment agrees with the batch ivfCells argmax on " +
    "the embeddings table sample") {
    val spark2 = spark
    import spark2.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val rows = emb.select(col("vec_id"),
      graft.functions.PortableFuncs.toDoubleArray(col("embedding")).as("v"))
      .as[(Long, Array[Double])].collect()
    val centArr = rows.filter(_._1 < graft.scale.Similarity.IvfCells)
      .map { case (id, v) => id -> v }
    val batch = graft.scale.Similarity.ivfCells(emb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, v) =>
      val streamed = IndexMaintenance.assignCell(v, centArr)._1
      assert(streamed === batch(id), s"vec $id: stream/batch argmax differ")
    }
  }
}
