package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics + plan battery for the JL sign projection (q115) and its
  * distortion gate (q116). The projection is pinned against a plain
  * Scala reference; the JL property itself (pairwise distance
  * preservation in expectation) is exercised on random vectors.
  */
class JlProjectionSpec extends SparkSpec {

  private def toDf(vecs: Seq[(Long, Array[Float])]) = {
    val spark2 = spark
    import spark2.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  private def refProject(v: Array[Float]): Array[Double] =
    (0 until Similarity.JlDims).map { k =>
      // the same sequential fold order as the dot kernel
      var acc = 0.0
      for (j <- 0 until Similarity.Dim)
        acc += v(j).toDouble * Similarity.jlSigns(k)(j)
      acc
    }.toArray

  test("jlSigns is a ±1 matrix with both signs present in every row") {
    assert(Similarity.jlSigns.size === Similarity.JlDims)
    for (row <- Similarity.jlSigns) {
      assert(row.size === Similarity.Dim)
      assert(row.forall(s => s == 1.0 || s == -1.0))
      assert(row.contains(1.0) && row.contains(-1.0))
    }
    // rows differ from each other (independent projections)
    assert(Similarity.jlSigns.distinct.size === Similarity.JlDims)
  }

  test("jlProject matches the plain Scala reference bit-for-bit") {
    val rnd = new scala.util.Random(41)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val got = Similarity.jlProject(toDf(vecs)).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("k")) ->
        r.getAs[Double]("y")).toMap
    assert(got.size === 20 * Similarity.JlDims)
    for ((id, v) <- vecs; (y, k) <- refProject(v).zipWithIndex)
      assert(got((id, k)) === y, s"vec $id dim $k")
  }

  test("jlProject preserves pairwise squared distances in aggregate (JL lemma)") {
    val rnd = new scala.util.Random(43)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val proj = Similarity.jlProject(toDf(vecs)).collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getAs[Int]("k")).map(_.getAs[Double]("y"))
      }
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    def pd2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum / Similarity.JlDims
    // per-pair distortion has high variance at m=8; the MEAN over many
    // pairs concentrates near 1 — that is the JL-in-expectation claim
    val ratios = for {
      i <- 0 until 40; j <- (i + 1) until 40
      t = d2(vecs(i)._2, vecs(j)._2) if t > 0
    } yield pd2(proj(i.toLong), proj(j.toLong)) / t
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean pairwise distortion $mean")
  }

  test("jlAudit gates the mean distortion and repeats it exactly") {
    val rnd = new scala.util.Random(47)
    val df = toDf((0 until 50).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))))
    val row = Similarity.jlAudit(df).collect().head
    assert(row.getAs[Long]("n_vecs") === 50)
    val mean = row.getAs[Double]("mean_distortion")
    assert(row.getAs[Double]("min_distortion") <= mean &&
      mean <= row.getAs[Double]("max_distortion"))
    assert(row.getAs[Boolean]("ok") ===
      (mean >= Similarity.JlAuditLo && mean <= Similarity.JlAuditHi))
    // impossible bounds flip the gate on the same data
    val red = Similarity.jlAudit(df, lo = 2.0, hi = 3.0).collect().head
    assert(!red.getAs[Boolean]("ok"))
  }

  test("jlAudit excludes zero vectors instead of dividing by zero") {
    val rnd = new scala.util.Random(53)
    val df = toDf(Seq((0L, Array.fill(64)(0f))) ++
      (1 until 10).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat()))))
    assert(Similarity.jlAudit(df).collect().head.getAs[Long]("n_vecs") === 9)
  }

  test("annJl with a full-width shortlist equals knnBrute exactly") {
    val rnd = new scala.util.Random(59)
    val df = toDf((0 until 40).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))).repartition(8)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Double]("cos"), r.getAs[Int]("rank"))).toSet
    // refine·k ≥ corpus → the shortlist is the whole corpus and the
    // exact re-rank IS the brute-force ranking, ties and all
    assert(rows(Similarity.annJl(df, refine = 40)) === rows(Similarity.knnBrute(df)))
  }

  test("annJl finds clustered neighbors at the production refine") {
    // 4 tight clusters: each query's true top-k is its own cluster,
    // which the projected ranking preserves easily (JL separates far
    // angles; only near-uniform data needs the wide shortlist)
    val rnd = new scala.util.Random(61)
    val centers = Array.fill(4)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val df = toDf((0 until 48).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + rnd.nextFloat() * 0.05f))
    }).repartition(8)
    val truth = Similarity.knnBrute(df)
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.annJl(df, refine = 4)
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"clustered recall $recall")
  }

  test("q115 plans as scan + projection: zero joins, zero hash shuffles") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Similarity.jlProject(
        graft.Tables.embeddings(spark, "/root/testdata/sf0.001"))
      val plan = df.queryExecution.executedPlan
      assert(!plan.toString.contains("Join"), s"unexpected join:\n$plan")
      val hashed = plan.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning.toString.contains("hashpartitioning"))
      assert(hashed.isEmpty, s"unexpected hash shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
