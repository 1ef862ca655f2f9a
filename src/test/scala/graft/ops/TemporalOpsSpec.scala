package graft.ops

import graft.SparkSpec
import graft.scale.Skew
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  def trades = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, "A", ts("2026-01-01 10:00:05"), 100.0),
      (2L, "A", ts("2026-01-01 10:00:10"), 101.0),
      (3L, "B", ts("2026-01-01 10:00:03"), 50.0),
      (4L, "C", ts("2026-01-01 10:00:07"), 7.0) // no quotes for C
    ).toDF("trade_id", "sym", "ts", "px")
  }

  def quotes = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("A", ts("2026-01-01 10:00:01"), 99.0),
      ("A", ts("2026-01-01 10:00:05"), 99.5),  // tie with trade 1 → matches
      ("A", ts("2026-01-01 10:00:09"), 100.5),
      ("B", ts("2026-01-01 10:00:04"), 49.0)   // AFTER trade 3 → no match
    ).toDF("sym", "ts", "bid")
  }

  test("asofJoin attaches the latest right row at-or-before each left ts") {
    val out = TemporalOps.asofJoin(trades, quotes, Seq("sym"), "ts", "ts",
      Seq("ts", "bid")).collect()
      .map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[Timestamp]("ts_r")), Option(r.getAs[Any]("bid_r")))).toMap
    assert(out(1L) === (Some(ts("2026-01-01 10:00:05")), Some(99.5))) // tie matches
    assert(out(2L) === (Some(ts("2026-01-01 10:00:09")), Some(100.5))) // latest, not first
    assert(out(3L) === (None, None)) // only a LATER quote exists
    assert(out(4L) === (None, None)) // key never quoted
    assert(out.size === 4)           // left-outer: every trade kept
  }

  test("asofJoin equals the brute-force definition on random data") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val left = (0 until 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts(f"2026-01-01 10:00:${rnd.nextInt(50)}%02d")))
      .toDF("id", "k", "ts")
    val right = (0 until 100).map(i =>
      (s"k${rnd.nextInt(5)}", ts(f"2026-01-01 10:00:${rnd.nextInt(50)}%02d"), i.toDouble))
      .toDF("k", "ts", "v")
      // unique (k, ts) so "the latest right row" is well-defined
      .groupBy("k", "ts").agg(max("v").as("v"))
    val got = TemporalOps.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("v_r"))).toMap
    val rightRows = right.collect().map(r =>
      (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val expected = left.collect().map { r =>
      val (id, k, t) = (r.getLong(0), r.getString(1), r.getTimestamp(2))
      val m = rightRows.filter(q => q._1 == k && !q._2.after(t))
      id -> (if (m.isEmpty) None else Some(m.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got === expected)
  }

  test("rangeJoin returns exactly the pairs inside [ts, ts+W], both inclusive") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, "A", ts("2026-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("A", ts("2026-01-01 09:59:59"), "before"),
      ("A", ts("2026-01-01 10:00:00"), "start-tie"),
      ("A", ts("2026-01-01 10:04:59"), "inside"),
      ("A", ts("2026-01-01 10:05:00"), "end-tie"),
      ("A", ts("2026-01-01 10:05:01"), "after"),
      ("B", ts("2026-01-01 10:00:01"), "wrong-key")
    ).toDF("k", "ts", "label")
    val got = TemporalOps.rangeJoin(left, right, Seq("k"), "ts", "ts", 300L,
      Seq("label")).select("label_r").collect().map(_.getString(0)).sorted
    assert(got === Array("end-tie", "inside", "start-tie"))
  }

  test("rangeJoin equals the brute-force range filter on random data") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(23)
    val left = (0 until 120).map(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", ts(f"2026-01-01 10:${rnd.nextInt(40)}%02d:${rnd.nextInt(60)}%02d")))
      .toDF("id", "k", "ts")
    val right = (0 until 120).map(i =>
      (s"k${rnd.nextInt(4)}", ts(f"2026-01-01 10:${rnd.nextInt(40)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
      .toDF("k", "ts", "rid")
    val w = 180L
    val got = TemporalOps.rangeJoin(left, right, Seq("k"), "ts", "ts", w, Seq("rid"))
      .select("id", "rid_r").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ls = left.collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val rs = right.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val expected = (for {
      (id, k, lt) <- ls
      (rk, rt, rid) <- rs
      if rk == k && !rt.before(lt) && rt.getTime <= lt.getTime + w * 1000
    } yield (id, rid)).toSet
    assert(got === expected)
  }

  test("rangeJoin bin-bucketing produces no duplicate pairs") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    val left = (0 until 100).map(i =>
      (i.toLong, s"k${rnd.nextInt(3)}", ts(f"2026-01-01 10:${rnd.nextInt(30)}%02d:${rnd.nextInt(60)}%02d")))
      .toDF("id", "k", "ts")
    val right = (0 until 100).map(i =>
      (s"k${rnd.nextInt(3)}", ts(f"2026-01-01 10:${rnd.nextInt(30)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
      .toDF("k", "ts", "rid")
    val pairs = TemporalOps.rangeJoin(left, right, Seq("k"), "ts", "ts", 120L, Seq("rid"))
      .select("id", "rid_r").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === pairs.distinct.length)
  }

  test("saltedJoin returns exactly the plain-join result") {
    val spark2 = spark
    import spark2.implicits._
    // one hot key (k=1) with 500 rows — the salting target
    val left = ((0 until 500).map(i => (1L, s"v$i")) ++
      (0 until 50).map(i => (i.toLong + 2, s"w$i"))).toDF("lk", "lv")
    val right = (1L to 30L).map(k => (k, s"r$k")).toDF("rk", "rv")
    val plain = left.join(right, col("lk") === col("rk"))
      .select("lk", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(left, right, "lk", "rk", salts = 8)
      .select("lk", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted === plain)
    // left-outer keeps unmatched left rows exactly once
    val lo = Skew.saltedJoin(left, right, "lk", "rk", salts = 8, joinType = "left")
    assert(lo.count() === 500 + 50)
    assert(lo.filter(col("rv").isNull).count() === 50 - 29)
  }

  test("saltedJoin semi/anti match the unsalted joins; right/full outer rejected") {
    val spark2 = spark
    import spark2.implicits._
    val left = ((0 until 200).map(i => (1L, s"v$i")) ++
      (0 until 40).map(i => (i.toLong + 2, s"w$i"))).toDF("lk", "lv")
    val right = (1L to 20L).map(k => (k, s"r$k")).toDF("rk", "rv")
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = left.join(right, col("lk") === col("rk"), jt)
        .collect().map(_.toSeq).sortBy(_.toString)
      val salted = Skew.saltedJoin(left, right, "lk", "rk", salts = 8, joinType = jt)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(salted === plain, jt)
    }
    for (jt <- Seq("right", "full", "full_outer"))
      intercept[IllegalArgumentException](
        Skew.saltedJoin(left, right, "lk", "rk", salts = 2, joinType = jt))
  }
}
