package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Boundary-equality property for the q48 cumulative-distribution
  * reformulation: [[CoreQueries.cumDistPercentiles]] must equal the
  * ANSI `percentile_disc WITHIN GROUP` aggregate VALUE-FOR-VALUE on
  * group sizes that straddle every quantile boundary — the precondition
  * the round-7 notes set before allowing the reformulation to ship.
  */
class PercentilesSpec extends SparkSpec {

  private def referenceForm(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g")).agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").as("p50"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)").as("p90"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY v)").as("p99"),
      count(lit(1)).as("n"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Any]("g").toString ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap

  test("cumDist reformulation equals percentile_disc on every group " +
    "size 1..60 — all p50/p90/p99 boundaries crossed") {
    val spark2 = spark
    import spark2.implicits._
    // group k has exactly k rows; values descend so sortedness is not
    // accidental, and collide (i/3) so duplicate values hit the
    // cum-count path, not just distinct runs
    val rows = for {
      k <- 1 to 60
      i <- 0 until k
    } yield (s"g$k", ((k - i) / 3).toDouble)
    val df = rows.toDF("g", "v")
    val got = asMap(CoreQueries.cumDistPercentiles(df, "g", "v"))
    val want = asMap(referenceForm(df))
    assert(got.keySet === want.keySet)
    got.keySet.foreach { g =>
      assert(got(g) === want(g), s"group $g diverged")
    }
    // the distributed prefix-sum sibling produces the identical table
    val dist = asMap(CoreQueries.cumDistPercentilesDistributed(df, "g", "v"))
    assert(dist === want)
  }

  test("cumDist reformulation equals percentile_disc on exact-boundary " +
    "group sizes (q·n integral: 100, 200, 300) and off-by-one neighbors") {
    val spark2 = spark
    import spark2.implicits._
    // at n=100/200/300 every threshold p·n/100 is an integer — the
    // dangerous case the round-7 note feared double arithmetic on
    val rows = for {
      k <- Seq(99, 100, 101, 199, 200, 201, 299, 300, 301)
      i <- 0 until k
    } yield (s"n$k", (i % 37).toDouble * 1.5)
    val df = rows.toDF("g", "v")
    val got = asMap(CoreQueries.cumDistPercentiles(df, "g", "v"))
    val want = asMap(referenceForm(df))
    got.keySet.foreach { g =>
      assert(got(g) === want(g), s"group $g diverged")
    }
  }

  test("a null value fails loudly instead of silently shifting thresholds") {
    val spark2 = spark
    import spark2.implicits._
    // percentile_disc would skip the null while the oracle's COUNT(*)
    // counts it — the reformulation refuses to guess and raises
    val df = Seq(("g1", Some(1.0)), ("g1", None), ("g1", Some(3.0)))
      .toDF("g", "v")
    val e = intercept[Exception] {
      CoreQueries.cumDistPercentiles(df, "g", "v").collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(x => Option(x.getMessage)).mkString(" | "))
    assert(rootMsg(e).contains("cumDistPercentiles: null value"))
    val e2 = intercept[Exception] {
      CoreQueries.cumDistPercentilesDistributed(df, "g", "v").collect()
    }
    assert(rootMsg(e2).contains("cumDistPercentiles: null value"))
  }

  test("q48 over lineitem matches the percentile_disc formulation") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val got = asMap(CoreQueries.cumDistPercentiles(li, "g", "v"))
    val want = asMap(referenceForm(li))
    assert(got === want)
  }
}
