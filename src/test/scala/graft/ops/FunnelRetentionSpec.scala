package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Semantics battery for the funnel fold and the cohort retention
  * shape (q113/q114). The funnel's greedy-earliest cascade is pinned
  * against hand-worked orderings — including the cases a naive
  * "has all three event types" count gets wrong.
  */
class FunnelRetentionSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (u, t, ty) => (u, ts(t), ty) }
      .toDF("user_id", "ts", "event_type")
  }

  test("funnel: ordering matters — a click BEFORE the first view does not convert") {
    val e = ev(
      // u1: view → click → purchase, in order: reaches stage 3
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 10:01:00", "click"),
      (1L, "2026-01-01 10:02:00", "purchase"),
      // u2: click precedes the only view; purchase follows the view but
      // no click does → reaches stage 1 only (naive set-membership
      // counting would claim stage 3)
      (2L, "2026-01-01 09:00:00", "click"),
      (2L, "2026-01-01 10:00:00", "view"),
      (2L, "2026-01-01 11:00:00", "purchase"),
      // u3: view then click, purchase never → stage 2
      (3L, "2026-01-01 10:00:00", "view"),
      (3L, "2026-01-01 10:05:00", "click"),
      // u4: untracked event type only → in the base, no stages
      (4L, "2026-01-01 10:00:00", "view"))
    val out = TemporalOps.funnel(e).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("users"), r.getAs[Any]("conv_rate"))).toMap
    assert(out("view")._1 === 4L)     // every user has a view
    assert(out("click")._1 === 2L)    // u1, u3 (u2's click was too early)
    assert(out("purchase")._1 === 1L) // u1 only
    assert(out("view")._2 === 1.0)    // 4 of 4 users reach stage 1
    assert(out("click")._2 === 0.5)   // 2 of 4
    assert(out("purchase")._2 === 0.5) // 1 of 2
  }

  test("funnelLatency: per-transition delays use the greedy-earliest " +
    "chain timestamps; percentiles are exact discrete picks") {
    val e = ev(
      // u1: view 10:00 → click 10:01 (60s) → purchase 10:03 (120s)
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 10:01:00", "click"),
      (1L, "2026-01-01 10:03:00", "purchase"),
      // u2: pre-view click ignored; later click at +300s counts; a
      // second click is NOT the chain's (earliest qualifying wins)
      (2L, "2026-01-01 09:00:00", "click"),
      (2L, "2026-01-01 10:00:00", "view"),
      (2L, "2026-01-01 10:05:00", "click"),
      (2L, "2026-01-01 10:06:00", "click"),
      // u3: view only → contributes no transition
      (3L, "2026-01-01 10:00:00", "view"))
    val out = TemporalOps.funnelLatency(e).collect()
      .map(r => r.getAs[String]("transition") ->
        (r.getAs[Long]("p50"), r.getAs[Long]("p90"), r.getAs[Long]("p99"),
          r.getAs[Long]("n"))).toMap
    // view->click delays: u1 60s, u2 300s → p50 = 60s (disc pick),
    // p90/p99 = 300s
    assert(out("view->click") === ((60000000L, 300000000L, 300000000L, 2L)))
    // click->purchase: u1 only, 120s
    assert(out("click->purchase") ===
      ((120000000L, 120000000L, 120000000L, 1L)))
  }

  test("funnel: a stage tie on ts does NOT advance (strictly-after contract)") {
    val e = ev(
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 10:00:00", "click"),   // same instant as the view
      (1L, "2026-01-01 10:01:00", "purchase"),
      (2L, "2026-01-01 10:00:00", "view"),
      (2L, "2026-01-01 10:00:01", "click"),   // strictly after
      (2L, "2026-01-01 10:00:02", "purchase"))
    val out = TemporalOps.funnel(e).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(out("view") === 2L)
    assert(out("click") === 1L)    // u1's tied click is not after the view
    assert(out("purchase") === 1L) // u2 completes; u1 is stuck at stage 1
  }

  test("funnel: greedy-earliest uses the FIRST qualifying event per stage") {
    // u1 has two views; the later one is followed by no click, but the
    // EARLIER one is — greedy must anchor at the earliest view
    val e = ev(
      (1L, "2026-01-01 09:00:00", "view"),
      (1L, "2026-01-01 09:30:00", "click"),
      (1L, "2026-01-01 10:00:00", "view"))
    val out = TemporalOps.funnel(e).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(out("click") === 1L)
  }

  test("funnel: empty stage downstream yields zero users and null conv_rate") {
    val e = ev((1L, "2026-01-01 10:00:00", "click")) // no view anywhere
    val rows = TemporalOps.funnel(e).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("users"), Option(r.getAs[Any]("conv_rate")))).toMap
    assert(rows("view") === ((0L, Some(0.0))))   // 0 of 1 base user
    assert(rows("click")._1 === 0L)
    assert(rows("click")._2 === None)            // 0-user denominator → null
    assert(rows("purchase")._2 === None)
  }

  test("funnel: a corpus with NO tracked event at all reads 0 users per " +
    "stage, never NULL (fuzz seed 711 — the oracle's COUNT(*) is 0)") {
    // the single event matches no funnel stage → the per-user table is
    // EMPTY and every stage sum aggregates zero rows; pre-r20 the
    // sums surfaced as NULL users while DuckDB's COUNT subqueries
    // read 0 — a silent cross-engine divergence on degenerate corpora
    val e = ev((1L, "2026-01-01 10:00:00", "signup"))
    for (out <- Seq(TemporalOps.funnel(e), TemporalOps.funnelWindow(e))) {
      val rows = out.collect()
        .map(r => r.getAs[String]("stage") ->
          (r.getAs[Any]("users"), Option(r.getAs[Any]("conv_rate")))).toMap
      assert(rows.size === 3)
      rows.foreach { case (stage, (users, conv)) =>
        assert(users === 0L, s"stage $stage users must be 0, not $users")
        assert(conv === None, s"stage $stage conv_rate over a 0 base is null")
      }
    }
  }

  test("funnel plans exactly ONE data-sized shuffle (the per-user groupBy)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = TemporalOps.funnel(graft.Tables.events(spark, "/root/testdata/sf0.001"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = df.queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      // one hash exchange on user_id moves event data; the only other
      // exchange is the SinglePartition gather of per-task count
      // partials (constant-size rows) into the one-row stage summary
      val hashed = exchanges.filter(_.outputPartitioning.toString.contains("hashpartitioning"))
      assert(hashed.size === 1, s"expected 1 data shuffle:\n$plan")
      assert(hashed.head.outputPartitioning.toString.contains("user_id"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("retention: cohorts by first-seen day, distinct users per week offset") {
    val e = ev(
      // u1 first seen Jan 1; active Jan 1 (w0), Jan 5 (w0, dup-collapsed),
      // Jan 9 (w1), Jan 29 (w4)
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-05 10:00:00", "click"),
      (1L, "2026-01-05 18:00:00", "view"),
      (1L, "2026-01-09 10:00:00", "view"),
      (1L, "2026-01-29 10:00:00", "purchase"),
      // u2 same cohort day, only week 0
      (2L, "2026-01-01 23:00:00", "view"),
      // u3 a different cohort, weeks 0 and 1
      (3L, "2026-01-02 10:00:00", "view"),
      (3L, "2026-01-10 10:00:00", "view"))
    val out = TemporalOps.retention(e).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("week_off")) -> r.getAs[Long]("users")).toMap
    assert(out === Map(
      ("2026-01-01", 0L) -> 2L,
      ("2026-01-01", 1L) -> 1L,
      ("2026-01-01", 4L) -> 1L,
      ("2026-01-02", 0L) -> 1L,
      ("2026-01-02", 1L) -> 1L))
  }

  test("funnelWindow: an expired first anchor does not block a later chain") {
    // u1: view@10:00 (clicks are > 1h away), view@11:30, click@11:45,
    // purchase@12:00 — with a 1-hour window the 10:00 anchor expires
    // but the 11:30 one converts; greedy-earliest anchoring would say
    // stage 1 only
    val e = ev(
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 11:30:00", "view"),
      (1L, "2026-01-01 11:45:00", "click"),
      (1L, "2026-01-01 12:00:00", "purchase"),
      // u2: chain spread wider than the window at the last hop
      (2L, "2026-01-01 10:00:00", "view"),
      (2L, "2026-01-01 10:30:00", "click"),
      (2L, "2026-01-01 11:30:00", "purchase"))
    val out = TemporalOps.funnelWindow(e, windowSec = 3600L).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(out === Map("view" -> 2L, "click" -> 2L, "purchase" -> 1L))
    // the plain funnel (no window) converts both
    val plain = TemporalOps.funnel(e).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(plain("purchase") === 2L)
  }

  test("funnelWindow: max-anchor state still finds the small-anchor chain " +
    "recorded earlier (the Pareto case)") {
    // views@10:03 and @10:05; click@10:04 (only valid for the 10:03
    // anchor); purchase@10:04:30 with a 2-minute window: the chain
    // (10:03 → 10:04 → 10:04:30) converts — a DP that kept only the
    // later 10:05 anchor for stage 1 but forgot 10:03's recorded
    // stage-2 completion would miss it
    val e = ev(
      (1L, "2026-01-01 10:03:00", "view"),
      (1L, "2026-01-01 10:04:00", "click"),
      (1L, "2026-01-01 10:05:00", "view"),
      (1L, "2026-01-01 10:04:30", "purchase"))
    val out = TemporalOps.funnelWindow(e, windowSec = 120L).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(out === Map("view" -> 1L, "click" -> 1L, "purchase" -> 1L))
  }

  test("funnelWindow: same-ts events never chain (strict ordering)") {
    val e = ev(
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 10:00:00", "click"),
      (1L, "2026-01-01 10:00:30", "purchase"),
      (2L, "2026-01-01 10:00:00", "view"),
      (2L, "2026-01-01 10:00:10", "click"),
      (2L, "2026-01-01 10:00:20", "purchase"))
    val out = TemporalOps.funnelWindow(e, windowSec = 3600L).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(out === Map("view" -> 2L, "click" -> 1L, "purchase" -> 1L))
  }

  test("funnelWindow: window binds every stage to ITS chain's anchor") {
    // view@10:00, click@10:50, purchase@11:20: click is inside the
    // 1-hour window of the anchor but the purchase is not → stage 2
    val e = ev(
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 10:50:00", "click"),
      (1L, "2026-01-01 11:20:00", "purchase"))
    val out = TemporalOps.funnelWindow(e, windowSec = 3600L).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(out === Map("view" -> 1L, "click" -> 1L, "purchase" -> 0L))
  }

  test("rateAnomaly: exact lower median per type, 25%-above flag boundary") {
    val spark2 = spark
    import spark2.implicits._
    // type A over 5 days: counts 4,4,4,4,8 → median 4; 8 > 5 → anomaly.
    // type B over 4 days: counts 3,4,4,5 → lower median (rank 2) = 4;
    // 5·4 = 5·med·... flag needs n·4 > med·5 = 20 → n=5 exactly 20 → NOT
    // flagged (strict), pinning the 25% boundary as exclusive.
    def day(d: Int, n: Int, ty: String) = (0 until n).map(i =>
      (ty, Timestamp.valueOf(f"2026-02-$d%02d 10:${i % 60}%02d:00")))
    val e = (day(1, 4, "A") ++ day(2, 4, "A") ++ day(3, 4, "A") ++
      day(4, 4, "A") ++ day(5, 8, "A") ++
      day(1, 3, "B") ++ day(2, 4, "B") ++ day(3, 4, "B") ++ day(4, 5, "B"))
      .toDF("event_type", "ts")
    val out = TemporalOps.rateAnomaly(e).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("med"), r.getAs[Boolean]("anomaly")))
      .toMap
    assert(out(("2026-02-05", "A")) === ((8L, 4L, true)))
    assert(out(("2026-02-01", "A")) === ((4L, 4L, false)))
    assert(out(("2026-02-04", "B")) === ((5L, 4L, false))) // exactly +25%
    assert(out(("2026-02-01", "B")) === ((3L, 4L, false)))
    assert(out.size === 9)
  }

  test("transitions: consecutive pairs per user, row-normalized shares") {
    val spark2 = spark
    import spark2.implicits._
    // u1: A→B→A; u2: A→A — streams never chain across users
    val e = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "A"),
      (2L, 1L, ts("2026-01-01 10:01:00"), "B"),
      (3L, 1L, ts("2026-01-01 10:02:00"), "A"),
      (4L, 2L, ts("2026-01-01 10:00:00"), "A"),
      (5L, 2L, ts("2026-01-01 10:05:00"), "A")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = TemporalOps.transitions(e).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("share"))).toMap
    assert(out === Map(
      ("A", "B") -> ((1L, 0.5)),
      ("A", "A") -> ((1L, 0.5)),
      ("B", "A") -> ((1L, 1.0))))
  }

  test("transitions: same-ts ordering falls back to event_id") {
    val spark2 = spark
    import spark2.implicits._
    val e = Seq(
      (10L, 1L, ts("2026-01-01 10:00:00"), "A"),
      (11L, 1L, ts("2026-01-01 10:00:00"), "B")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = TemporalOps.transitions(e).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")))
    assert(out.toSeq === Seq(("A", "B")))
  }

  test("rfm: quartile scores split by rank, best = 4, segment label") {
    val spark2 = spark
    import spark2.implicits._
    // 4 users with strictly increasing activity: user i has i+1 events
    // of value 10·(i+1) each, last active day 2026-01-0(i+1) → user 4
    // is most recent, most frequent, highest value → R4F4M4
    val e = (0 until 4).flatMap { i =>
      (0 to i).map(j =>
        ((i * 10 + j).toLong, (i + 1).toLong,
          ts(f"2026-01-0${i + 1} 10:0$j%01d:00"), "view", 10.0 * (i + 1)))
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = TemporalOps.rfm(e).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("r_days"), r.getAs[Long]("n_events"),
          r.getAs[Double]("monetary"), r.getAs[String]("segment"))).toMap
    assert(out(4L) === ((0L, 4L, 160.0, "R4F4M4")))
    assert(out(1L) === ((3L, 1L, 10.0, "R1F1M1")))
    assert(out(2L) === ((2L, 2L, 40.0, "R2F2M2")))
    assert(out(3L) === ((1L, 3L, 90.0, "R3F3M3")))
  }

  test("sessionStats: gap split, integer-exact durations, q22 reconciliation") {
    val spark2 = spark
    import spark2.implicits._
    // u1: session A = 10:00–10:20 (3 events), 40-min gap, session B =
    // 11:00 alone → 2 sessions, mean (1200 + 0)/2 = 600 s, max 1200
    val e = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00")),
      (2L, 1L, ts("2026-01-01 10:10:00")),
      (3L, 1L, ts("2026-01-01 10:20:00")),
      (4L, 1L, ts("2026-01-01 11:00:00")),
      (5L, 2L, ts("2026-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = TemporalOps.sessionStats(e).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
          r.getAs[Double]("mean_session_sec"),
          r.getAs[Long]("max_session_sec"))).toMap
    assert(out(1L) === ((2L, 4L, 600.0, 1200L)))
    assert(out(2L) === ((1L, 1L, 0.0, 0L)))
    assert(out.values.map(_._1).sum === 3L) // total sessions
  }

  test("retention: day boundaries — day 6 is week 0, day 7 is week 1") {
    val e = ev(
      (1L, "2026-01-01 00:00:00", "view"),
      (1L, "2026-01-07 23:59:59", "view"),  // day diff 6 → week 0
      (1L, "2026-01-08 00:00:00", "view"))  // day diff 7 → week 1
    val out = TemporalOps.retention(e).collect()
      .map(r => r.getAs[Long]("week_off") -> r.getAs[Long]("users")).toMap
    assert(out === Map(0L -> 1L, 1L -> 1L))
  }
}
