package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Skew.boundedSelfPairs]] — the hot-bucket-safe within-key pair
  * generator behind the MinHash band / SimHash chunk self-joins. The
  * contract under test: output is EXACTLY the plain self-join's, for
  * any hotDf (routing changes, results don't), and a hot key's pair
  * emission spreads across grid regions instead of one task. */
class SkewBoundedPairsSpec extends SparkSpec {

  /** Naive all-pairs reference over (key, id, payload) triples. */
  private def naive(rows: Seq[(String, Long, Long)])
      : Set[(Long, Long, Long, Long)] =
    rows.groupBy(_._1).values.flatMap { grp =>
      for {
        a <- grp; b <- grp
        if a._2 < b._2
      } yield (a._2, b._2, a._3, b._3)
    }.toSet

  test("boundedSelfPairs equals the plain self-join on random multisets " +
    "with planted hot keys, for every routing regime") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- Seq(17, 29, 43)) {
      val rnd = new scala.util.Random(seed)
      // Zipf-ish key draw over 12 keys + one planted mega-key holding
      // a third of the rows; ids unique per key, payload = f(id)
      var next = 0L
      val rows = (0 until 900).map { _ =>
        val k = if (rnd.nextInt(3) == 0) "HOT"
                else s"k${math.min(rnd.nextInt(12), rnd.nextInt(12))}"
        next += 1 + rnd.nextInt(3)
        (k, next, next * 7L % 1000L)
      }
      val ref = naive(rows)
      val df = rows.toDF("k", "doc_id", "p")
      // hotDf below / inside / above every key size — including the
      // degenerate hotDf=1 (EVERY key rides the grid): identical output
      for (hotDf <- Seq(1L, 4L, 64L, 1000000L)) {
        val got = Skew.boundedSelfPairs(df, Seq("k"), "doc_id",
            payload = Seq("p"), hotDf = hotDf)
          .collect()
          .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
            r.getAs[Long]("p_a"), r.getAs[Long]("p_b"))).toSet
        assert(got === ref, s"seed=$seed hotDf=$hotDf")
      }
    }
  }

  test("boundedSelfPairs handles composite keys and no payload") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (rnd.nextInt(3), rnd.nextInt(4).toLong, i.toLong)
    }
    val ref = rows.groupBy(r => (r._1, r._2)).values.flatMap { g =>
      for { a <- g; b <- g if a._3 < b._3 } yield (a._3, b._3)
    }.toSet
    val got = Skew.boundedSelfPairs(rows.toDF("b", "bv", "doc_id"),
        Seq("b", "bv"), "doc_id", hotDf = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === ref)
  }

  test("grid routing spreads a hot key: max per-region emission is a " +
    "small fraction of the key's total pair volume, regions partition it") {
    val spark2 = spark
    import spark2.implicits._
    val hotDf = 16L
    val d = 400
    val ids = (1 to d).map(_.toLong * 13L)
    // reconstruct the implementation's routing arithmetic with the
    // SAME Spark expressions (g = ceil(df/hotDf), group =
    // pmod(xxhash64(id), g)) — an independent occupancy audit
    val g = math.ceil(d.toDouble / hotDf).toLong
    val groups = ids.toDF("id")
      .select(col("id"), pmod(xxhash64(col("id")), lit(g)).as("grp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = groups.values.groupBy(identity).view.mapValues(_.size.toLong)
    val regionPairs = (for {
      i <- 0L until g; j <- i until g
    } yield {
      val si = sizes.getOrElse(i, 0L); val sj = sizes.getOrElse(j, 0L)
      if (i == j) si * (si - 1) / 2 else si * sj
    })
    val total = d.toLong * (d - 1) / 2
    assert(regionPairs.sum === total, "regions must partition the volume")
    // the bound: a region emits ~(d/g)^2 ≈ hotDf^2 pairs, not d^2/2.
    // hash imbalance gives slack — assert 8x under the naive funnel
    // and within 6x of the ideal region load
    val ideal = (d.toDouble / g) * (d.toDouble / g)
    assert(regionPairs.max <= (6 * ideal).toLong,
      s"max region ${regionPairs.max} vs ideal $ideal")
    assert(regionPairs.max * 8 < total,
      s"max region ${regionPairs.max} is not a small fraction of $total")
    // and the operator's OUTPUT over that key is still exact
    val rows = ids.map(id => ("K", id, 0L))
    val got = Skew.boundedSelfPairs(rows.toDF("k", "doc_id", "p"),
        Seq("k"), "doc_id", hotDf = hotDf)
      .agg(count(lit(1))).head().getLong(0)
    assert(got === total)
  }

  test("emission-bound property: the operator's OWN grid sides emit " +
    "≈ hotDf² rows per region on planted mega-buckets of any size, " +
    "and the regions partition the key's pair volume exactly") {
    val spark2 = spark
    import spark2.implicits._
    // gridSides is the exact construction boundedSelfPairs joins —
    // auditing it (not a reconstruction) pins the per-task guarantee:
    // a region's join task materializes |lhs ∩ region| × |rhs ∩ region|
    // rows before the diagonal keep-filter, so THAT product is the
    // per-task emission the scaladoc bounds
    for ((d, hotDf) <- Seq((200, 16L), (1000, 16L), (5000, 64L))) {
      val hotRows = (1 to d).map(i => ("K", i.toLong * 13L, d.toLong))
        .toDF("k", "__id", "__df")
      val (lhs, rhs) = Skew.gridSides(hotRows, Seq("k"), Nil, hotDf)
      val lc = lhs.groupBy(col("__ri"), col("__rj"))
        .agg(count(lit(1)).as("nl"))
      val rc = rhs.groupBy(col("__ri"), col("__rj"))
        .agg(count(lit(1)).as("nr"))
      val regions = lc.join(rc, Seq("__ri", "__rj"), "full_outer")
        .select(col("__ri"), col("__rj"),
          coalesce(col("nl"), lit(0L)).as("nl"),
          coalesce(col("nr"), lit(0L)).as("nr"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val g = math.ceil(d.toDouble / hotDf).toLong
      // every region is a (i ≤ j) cell of the g×g grid
      assert(regions.forall { case (i, j, _, _) => i >= 0 && i <= j && j < g })
      // exactly-once: kept pairs across regions == C(d, 2). Off-diagonal
      // regions keep the full nl × nr block; the diagonal keeps the
      // id-ordered half of an n × n block (nl = nr = group size there)
      val kept = regions.map { case (i, j, nl, nr) =>
        if (i == j) nl * (nl - 1) / 2 else nl * nr }.sum
      val total = d.toLong * (d - 1) / 2
      assert(kept === total, s"d=$d hotDf=$hotDf: regions must partition")
      // the bound itself: per-task emission ≈ hotDf² with hash-
      // imbalance slack, and never a funnel of the whole volume
      val maxEmit = regions.map { case (_, _, nl, nr) => nl * nr }.max
      assert(maxEmit <= 8 * hotDf * hotDf,
        s"d=$d hotDf=$hotDf: max region emission $maxEmit breaches the bound")
      assert(maxEmit * 8 < total,
        s"d=$d hotDf=$hotDf: max region $maxEmit is not a small fraction")
    }
  }
}
