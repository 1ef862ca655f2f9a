package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed counts advance with the watermark and drop late data") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.windowedCounts(src.toDF(), watermark = "10 minutes",
        windowLen = "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      src.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(5), 1, "view", 2.0),
        Event(3, ts(9), 2, "click", 3.0))
      q.processAllAvailable()
      // nothing emitted yet: watermark hasn't passed the first window
      assert(spark.table("wc").count() === 0)
      // an event 25 min later pushes the watermark past 10:10
      src.addData(Event(4, ts(34), 1, "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
      assert(rows === Set(
        ("2026-01-01 10:00:00.0", "view", 2L),
        ("2026-01-01 10:00:00.0", "click", 1L)))
      // a late event behind the watermark is dropped, not re-aggregated
      src.addData(Event(5, ts(1), 1, "view", 9.0))
      q.processAllAvailable()
      assert(spark.table("wc").count() === 2)
    } finally q.stop()
  }

  test("streaming dedupe by event_id within watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.dedupe(src.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      src.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(1, ts(0), 1, "view", 1.0), // same batch dup
        Event(2, ts(1), 1, "view", 1.0))
      q.processAllAvailable()
      src.addData(Event(1, ts(2), 1, "view", 1.0)) // cross-batch dup
      q.processAllAvailable()
      assert(spark.table("dd").select("event_id").as[Long].collect().sorted
        === Array(1L, 2L))
    } finally q.stop()
  }

  test("funnelGate advances match batch q113 and emit exactly once") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.funnelGate(src.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      // u1 completes in order across two batches; u2's click precedes
      // the view (no conversion); u3 ties the click on the view's ts
      src.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(1), 1, "click", 1.0),
        Event(3, ts(0), 2, "click", 1.0),
        Event(4, ts(1), 2, "view", 1.0),
        Event(5, ts(0), 3, "view", 1.0),
        Event(6, ts(0), 3, "click", 1.0))
      q.processAllAvailable()
      val b1 = spark.table("funnel").as[FunnelAdvance].collect()
      assert(b1.map(a => (a.user_id, a.stage_idx, a.stage)).toSet ===
        Set((1L, 1, "view"), (1L, 2, "click"), (2L, 1, "view"), (3L, 1, "view")))
      // later batch: u1 purchases (advance), u2 purchases after its
      // view but never clicked (stuck at stage 1 — no emission), u3's
      // DUPLICATE view must not re-emit stage 1
      src.addData(
        Event(7, ts(2), 1, "purchase", 1.0),
        Event(8, ts(2), 2, "purchase", 1.0),
        Event(9, ts(2), 3, "view", 1.0))
      q.processAllAvailable()
      val all = spark.table("funnel").as[FunnelAdvance].collect()
      assert(all.length === 5)
      assert(all.count(a => a.user_id == 1L && a.stage == "purchase") === 1)
      // exactly-once per (user, stage)
      assert(all.map(a => (a.user_id, a.stage_idx)).distinct.length === all.length)
      // streamed-in-order result == batch q113 per-stage user counts
      val streamed = all.groupBy(_.stage_idx).view.mapValues(_.length).toMap
      val batch = graft.ops.TemporalOps.funnel(
        Seq((1L, ts(0), "view"), (1L, ts(1), "click"), (2L, ts(0), "click"),
          (2L, ts(1), "view"), (3L, ts(0), "view"), (3L, ts(0), "click"),
          (1L, ts(2), "purchase"), (2L, ts(2), "purchase"), (3L, ts(2), "view"))
          .toDF("user_id", "ts", "event_type")).collect()
        .map(r => r.getAs[Int]("stage_idx") -> r.getAs[Long]("users")).toMap
      assert(batch.forall { case (i, n) => streamed.getOrElse(i, 0) === n.toInt })
    } finally q.stop()
  }

  test("funnelGate keeps the terminal marker: post-completion events never re-emit") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.funnelGate(src.toDS())
      .writeStream.format("memory").queryName("funnel2").outputMode("append").start()
    try {
      src.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(1), 1, "click", 1.0),
        Event(3, ts(2), 1, "purchase", 1.0))
      q.processAllAvailable()
      assert(spark.table("funnel2").count() === 3)
      // a full second pass through the funnel events after completion
      src.addData(
        Event(4, ts(3), 1, "view", 1.0),
        Event(5, ts(4), 1, "click", 1.0),
        Event(6, ts(5), 1, "purchase", 1.0))
      q.processAllAvailable()
      assert(spark.table("funnel2").count() === 3)
    } finally q.stop()
  }

  test("retentionMonitor matches batch q114 and emits once per (user, week)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(day: String, hm: String) = Timestamp.valueOf(s"2026-01-$day $hm:00")
    val src = MemoryStream[Event]
    val q = EventStreams.retentionMonitor(src.toDS())
      .writeStream.format("memory").queryName("ret").outputMode("append").start()
    try {
      // u1 first seen Jan 1: active Jan 1 (w0), Jan 5 (w0 dup), Jan 9 (w1)
      // u2 first seen Jan 2: active Jan 2 (w0)
      src.addData(
        Event(1, at("01", "10:00"), 1, "view", 1.0),
        Event(2, at("05", "10:00"), 1, "click", 1.0),
        Event(3, at("09", "10:00"), 1, "view", 1.0),
        Event(4, at("02", "10:00"), 2, "view", 1.0))
      q.processAllAvailable()
      // second batch: u1 again in w1 (dup across batches) and in w4;
      // u2 in w1 (Jan 10 is day diff 8 → week 1)
      src.addData(
        Event(5, at("10", "10:00"), 1, "view", 1.0),
        Event(6, at("29", "10:00"), 1, "purchase", 1.0),
        Event(7, at("10", "10:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ret").as[RetentionAdvance].collect()
      assert(rows.map(r => (r.user_id, r.cohort_day.toString, r.week_off)).toSet ===
        Set((1L, "2026-01-01", 0L), (1L, "2026-01-01", 1L), (1L, "2026-01-01", 4L),
          (2L, "2026-01-02", 0L), (2L, "2026-01-02", 1L)))
      assert(rows.length === 5) // exactly once per (user, week)
      // streamed counts == batch q114 on the same events
      val batch = graft.ops.TemporalOps.retention(
        Seq((1L, at("01", "10:00")), (1L, at("05", "10:00")),
          (1L, at("09", "10:00")), (2L, at("02", "10:00")),
          (1L, at("10", "10:00")), (1L, at("29", "10:00")),
          (2L, at("10", "10:00"))).toDF("user_id", "ts")).collect()
        .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
          r.getAs[Long]("week_off")) -> r.getAs[Long]("users")).toMap
      val streamed = rows.groupBy(r => (r.cohort_day.toString, r.week_off))
        .view.mapValues(_.length.toLong).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("funnelGate late event: a stage-1 event arriving AFTER its " +
    "higher-stage sibling's batch pins the documented stream/batch divergence") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.funnelGate(src.toDS())
      .writeStream.format("memory").queryName("funnel3").outputMode("append").start()
    try {
      // batch 1: the click (stage 2 by event time) arrives first — the
      // user has no stage-1 state yet, so it folds away unprocessed
      src.addData(Event(1, ts(2), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("funnel3").count() === 0)
      // batch 2: the view arrives LATE (lower ts, later batch) — it
      // still opens stage 1 (first stage has no strictly-after guard),
      // but the click is gone: streaming stays at stage 1 forever
      src.addData(Event(2, ts(0), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("funnel3").as[FunnelAdvance].collect()
      assert(rows.map(a => (a.user_id, a.stage_idx)).toSet === Set((1L, 1)))
      // the batch recount over the SAME events (event-time order) sees
      // view@0 then click@2 and reaches stage 2 — this asymmetry is
      // funnelGate's documented arrival-order caveat, pinned here
      val batch = graft.ops.TemporalOps.funnel(
        Seq((1L, ts(2), "click"), (1L, ts(0), "view"))
          .toDF("user_id", "ts", "event_type")).collect()
        .map(r => r.getAs[Int]("stage_idx") -> r.getAs[Long]("users")).toMap
      assert(batch(2) === 1L, "batch recount must reach stage 2")
    } finally q.stop()
  }

  test("retentionMonitor late event: pre-cohort stragglers drop " +
    "uniformly (negative week via floorDiv), never alias into week 0") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(day: String) = Timestamp.valueOf(s"2026-01-$day 10:00:00")
    val src = MemoryStream[Event]
    val q = EventStreams.retentionMonitor(src.toDS())
      .writeStream.format("memory").queryName("ret2").outputMode("append").start()
    try {
      src.addData(Event(1, at("10"), 1, "view", 1.0))
      q.processAllAvailable()
      // two pre-cohort stragglers: 3 days early (would alias to week 0
      // under trunc-toward-zero division) and 8 days early (week -2
      // either way). Both must drop; the cohort day must not move.
      src.addData(Event(2, at("07"), 1, "view", 1.0),
        Event(3, at("02"), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ret2").as[RetentionAdvance].collect()
      assert(rows.map(r => (r.user_id, r.cohort_day.toString, r.week_off)).toSet
        === Set((1L, "2026-01-10", 0L)))
      // documented divergence, pinned: the batch recount over all three
      // events cohorts the user at the TRUE first day (Jan 2) and sees
      // weeks 0 and 1
      val batch = graft.ops.TemporalOps.retention(
        Seq((1L, at("10")), (1L, at("07")), (1L, at("02")))
          .toDF("user_id", "ts")).collect()
        .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
          r.getAs[Long]("week_off"))).toSet
      assert(batch === Set(("2026-01-02", 0L), ("2026-01-02", 1L)))
    } finally q.stop()
  }

  test("driftMonitor reference vocabulary is bounded in code: top-V " +
    "by frequency, never the full vocabulary") {
    val spark2 = spark
    import spark2.implicits._
    // 100 distinct tokens, token i repeated (100 - i) times — far more
    // distinct tokens than the cap
    val text = (0 until 100).flatMap(i =>
      Seq.fill(100 - i)(f"t$i%02d")).mkString(" ")
    val ref = Seq(text).toDF("text")
    val vocab = EventStreams.refVocab(ref, maxVocab = 16)
    assert(vocab.size === 16, s"cap must bind: ${vocab.size}")
    // and it kept the MOST FREQUENT 16, with their true counts
    assert(vocab === (0 until 16).map(i => f"t$i%02d" -> (100L - i)).toMap)
  }

  test("sessionize closes sessions on gap timeout and on intra-batch gaps") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.sessionize(src.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a 40-min gap
      // inside the same user's stream -> first session closes in-batch
      src.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(5), 1, "view", 2.0),
        Event(3, ts(45), 1, "view", 3.0))
      q.processAllAvailable()
      val inBatch = spark.table("sess").as[Session].collect()
      assert(inBatch.length === 1)
      assert(inBatch.head.n_events === 2 && inBatch.head.total_value === 3.0)
      assert(inBatch.head.start === ts(0) && inBatch.head.end === ts(5))
      // advancing event time far ahead times out the open session
      src.addData(Event(9, Timestamp.valueOf("2026-01-01 13:00:00"), 2, "view", 0.0))
      q.processAllAvailable()
      src.addData(Event(10, Timestamp.valueOf("2026-01-01 14:00:00"), 2, "view", 0.0))
      q.processAllAvailable()
      val all = spark.table("sess").as[Session].collect()
      assert(all.exists(s => s.user_id === 1L && s.n_events === 1L && s.start === ts(45)))
    } finally q.stop()
  }

  test("sessionStatsMonitor: one update per session close, running " +
    "rollup equals batch q124 on the in-order stream, late events " +
    "merge into the open session (pinned)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.sessionStatsMonitor(src.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sstats")
      .outputMode("append").start()
    try {
      // user 1: session A (10:00-10:05, 2 events), 40-min gap, session
      // B opens at 10:45; a LATE event (10:02 < open B's start, and
      // pre-watermark) arrives in the same batch as B — the fold sorts
      // the batch by ts, so it lands in A before the gap break
      src.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(5), 1, "view", 2.0),
        Event(3, ts(45), 1, "view", 3.0),
        Event(4, ts(2), 1, "click", 0.5))
      q.processAllAvailable()
      val first = spark.table("sstats").as[SessionStatsUpdate].collect()
      // exactly one close so far (session A, now 3 events, 5 min)
      assert(first.toSeq === Seq(SessionStatsUpdate(1L, 1L, 3L, 300.0,
        300L, ts(5))))
      // user 1 session B closes via event-time timeout once another
      // user's events push the watermark (1h) past B.end + gap
      src.addData(Event(9, Timestamp.valueOf("2026-01-01 14:00:00"), 2, "view", 0.0))
      q.processAllAvailable()
      src.addData(Event(10, Timestamp.valueOf("2026-01-01 15:00:00"), 2, "view", 0.0))
      q.processAllAvailable()
      val all = spark.table("sstats").as[SessionStatsUpdate].collect()
      val u1 = all.filter(_.user_id == 1L).sortBy(_.n_sessions)
      assert(u1.length === 2, s"one update per close: ${u1.toSeq}")
      // the final row IS batch q124 over user 1's events (ms precision)
      val batchRow = graft.ops.TemporalOps.sessionStats(
        Seq((1L, ts(0), 1L), (2L, ts(5), 1L), (4L, ts(2), 1L),
          (3L, ts(45), 1L))
          .toDF("event_id", "ts", "user_id")).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_sessions"),
          r.getAs[Long]("n_events"), r.getAs[Double]("mean_session_sec"),
          r.getAs[Long]("max_session_sec")))
        .find(_._1 == 1L).get
      val last = u1.last
      assert((last.user_id, last.n_sessions, last.n_events,
        last.mean_session_sec, last.max_session_sec) === batchRow)
    } finally q.stop()
  }

  test("sessionStatsMonitor cross-batch late event: older than the open " +
    "session's end merges into it without moving start (pinned rule)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.sessionStatsMonitor(src.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sstats_late")
      .outputMode("append").start()
    try {
      // batch 1 opens the session at [10:10, 10:20]
      src.addData(Event(1, ts(10), 1, "view", 1.0), Event(2, ts(20), 1, "view", 1.0))
      q.processAllAvailable()
      // batch 2 delivers a LATE event (10:05, BEFORE the open start and
      // above the 1h watermark) — the published rule: it merges into
      // the open session, start stays 10:10, end stays 10:20
      src.addData(Event(3, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      // timeout the session via another user's watermark advance
      src.addData(Event(9, Timestamp.valueOf("2026-01-01 13:00:00"), 2, "view", 0.0))
      q.processAllAvailable()
      src.addData(Event(10, Timestamp.valueOf("2026-01-01 14:00:00"), 2, "view", 0.0))
      q.processAllAvailable()
      val u1 = spark.table("sstats_late").as[SessionStatsUpdate].collect()
        .filter(_.user_id == 1L)
      assert(u1.length === 1)
      // 3 events in ONE session; duration reads 10 min (start unmoved)
      assert(u1.head.n_events === 3L)
      assert(u1.head.max_session_sec === 600L)
      assert(u1.head.last_end === ts(20))
    } finally q.stop()
  }

  test("parquet sink with checkpoint survives restart without duplicating windows") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val src = MemoryStream[Event]
    def start() = EventStreams.toParquetSink(
      EventStreams.windowedCounts(src.toDF(), "10 minutes", "10 minutes"),
      s"$dir/out", s"$dir/ckpt").start()
    var q = start()
    try {
      src.addData(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(34), 1, "view", 1.0))
      q.processAllAvailable()
      q.stop()
      q = start() // restart from the checkpoint
      src.addData(Event(3, Timestamp.valueOf("2026-01-01 11:30:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
      // each closed window appears exactly once across the restart
      assert(out.groupBy("window_start", "event_type").count()
        .filter(col("count") > 1).count() === 0)
      assert(out.count() >= 2)
    } finally q.stop()
  }

  test("upsert sink keeps a continuously-correct latest-value table") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val src = MemoryStream[Event]
    val counts = src.toDF().groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val q = EventStreams.toUpsertSink(counts, s"$dir/t", s"$dir/ckpt",
      "event_type").start()
    try {
      src.addData(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(1), 1, "view", 1.0))
      q.processAllAvailable()
      src.addData(Event(3, ts(2), 1, "view", 1.0), Event(4, ts(3), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/t").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // latest value per key, not an append history
      assert(out === Map("view" -> 3L, "click" -> 1L))
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks inside the lookback only") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.intervalJoin(src.toDF(), lookbackMin = 10)
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      src.addData(
        Event(1, Timestamp.valueOf("2026-01-01 09:50:00"), 1, "click", 1.0), // outside lookback
        Event(2, ts(0), 1, "click", 2.0),       // 10:00 — inside
        Event(3, ts(5), 1, "click", 3.0),       // 10:05 — inside
        Event(4, ts(9), 2, "click", 4.0),       // other user
        Event(5, ts(8), 1, "purchase", 99.0),   // 10:08
        Event(6, ts(9), 1, "click", 5.0))       // 10:09 — after the purchase
      q.processAllAvailable()
      val got = spark.table("ij").collect()
        .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Double]("click_value"))).toSet
      assert(got === Set((5L, 2.0), (5L, 3.0)))
    } finally q.stop()
  }

  test("modality gate: pairs emit when both sides arrive, dangling " +
    "sides emit only after the watermark closes their window") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsSrc = MemoryStream[Doc]
    val vecsSrc = MemoryStream[graft.streaming.VecArrival]
    val q = EventStreams.modalityGate(
        docsSrc.toDF(), vecsSrc.toDF(),
        watermark = "10 minutes", toleranceMin = 5)
      .writeStream.format("memory").queryName("mg").outputMode("append").start()
    try {
      def vec(i: Int) = Array.fill(4)(i.toDouble)
      // doc 1 gets its vector 2 min later (paired); doc 2 never gets
      // one (text_only); vec 9 has no doc (vec_only)
      docsSrc.addData(
        Doc(1L, ts(0), "paired doc"),
        Doc(2L, ts(1), "orphan doc"))
      vecsSrc.addData(
        graft.streaming.VecArrival(1L, ts(2), vec(1)),
        graft.streaming.VecArrival(9L, ts(3), vec(9)))
      q.processAllAvailable()
      // advance BOTH watermarks far past every window, then flush
      docsSrc.addData(Doc(100L, ts(120), "late watermark driver"))
      vecsSrc.addData(graft.streaming.VecArrival(100L, ts(121), vec(0)))
      q.processAllAvailable()
      val got = spark.table("mg").collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toSet
      assert(got.contains(1L -> "paired"))
      assert(got.contains(2L -> "text_only"))
      assert(got.contains(9L -> "vec_only"))
      // the paired row never ALSO emits as dangling
      assert(!got.contains(1L -> "text_only") && !got.contains(1L -> "vec_only"))
    } finally q.stop()
  }

  test("streaming as-of enrichment carries the latest preceding click per user") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.enrichAsof(src.toDS())
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    try {
      // out-of-order WITHIN the batch: purchase arrives before its click
      // in arrival order but after in event time → still enriched
      src.addData(
        Event(10, ts(8), 1, "purchase", 50.0),
        Event(1, ts(2), 1, "click", 1.5),
        Event(2, ts(5), 1, "click", 2.5),
        Event(11, ts(3), 2, "purchase", 9.0)) // user 2 never clicked
      q.processAllAvailable()
      // state carries across batches
      src.addData(Event(12, ts(20), 1, "purchase", 60.0))
      q.processAllAvailable()
      val got = spark.table("asof").as[EnrichedPurchase].collect()
        .map(e => e.event_id -> e.click_value).toMap
      assert(got === Map(10L -> Some(2.5), 11L -> None, 12L -> Some(2.5)))
    } finally q.stop()
  }

  test("streaming near-dup: same-signature docs marked dup of the first " +
    "claimant, within and across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = "the quick brown fox jumps over the lazy dog and keeps running"
    val textB = "a completely different document about compilers and type theory"
    val src = MemoryStream[Doc]
    val q = EventStreams.dedupeNear(src.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("nd").outputMode("append").start()
    try {
      src.addData(
        Doc(1, ts(0), textA),
        Doc(2, ts(1), textA),   // same-batch dup of 1
        Doc(3, ts(2), textB))
      q.processAllAvailable()
      src.addData(
        Doc(4, ts(3), textA),  // cross-batch dup of 1
        Doc(5, ts(4), "???"),  // wordless: no signature, passes through
        Doc(6, ts(5), "!!!"))  // also wordless: NOT a dup of 5
      q.processAllAvailable()
      val verdicts = spark.table("nd").as[DedupVerdict].collect()
        .map(v => v.doc_id -> v.dup_of).toMap
      assert(verdicts === Map(1L -> None, 2L -> Some(1L),
        3L -> None, 4L -> Some(1L), 5L -> None, 6L -> None))
      // signatures agree with the batch kernel on the same text
      val sigs = spark.table("nd").as[DedupVerdict].collect()
        .map(v => v.doc_id -> v.sig).toMap
      assert(sigs(1L) === sigs(2L) && sigs(1L) === sigs(4L))
      assert(sigs(1L) !== sigs(3L))
    } finally q.stop()
  }

  test("decontaminateGate verdicts equal the batch decontaminate on the " +
    "same corpus; wordless docs pass clean") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalText = "which ocean borders the coast of chile on the western side exactly"
    val evalDocs = Seq((1L, evalText)).toDF("doc_id", "text")
    val quoting = s"some training document that quotes $evalText verbatim in full"
    val clean = "an unrelated training document about compilers and type systems theory"
    val src = MemoryStream[Doc]
    // fpp = 0.5 stresses the exact-confirm tier, same as the q93 spec
    val q = EventStreams.decontaminateGate(src.toDS(), evalDocs, fpp = 0.5)
      .writeStream.format("memory").queryName("cg").outputMode("append").start()
    try {
      src.addData(Doc(30, ts(0), quoting), Doc(31, ts(1), clean),
        Doc(32, ts(2), "???"))
      q.processAllAvailable()
      val out = spark.table("cg").as[ContamVerdict].collect()
        .map(v => v.doc_id -> v).toMap
      // batch reference on the identical corpus split
      val batch = graft.scale.Dedup.decontaminate(
        (Seq((1L, evalText), (30L, quoting), (31L, clean)))
          .toDF("doc_id", "text"), evalMaxId = 25L)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getAs[Boolean]("contaminated")))).toMap
      Seq(30L, 31L).foreach { id =>
        assert((out(id).n_shingles, out(id).n_overlap, out(id).contaminated)
          === batch(id), s"doc $id diverges from the batch verdict")
      }
      assert(out(30L).contaminated && !out(31L).contaminated)
      assert(out(32L) === ContamVerdict(32L, ts(2), 0L, 0L, contaminated = false))
    } finally q.stop()
  }

  test("funnelMonitor: window sums equal the batch q150 funnel's " +
    "per-row stages on a shared fixture; windows close on the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the q150 spec fixture (one doc drops at each per-row stage); the
    // exact dup of `good` SURVIVES here — dedup is not a per-row gate
    val good = (1 to 15)
      .map(i => f"the w$i%02d and x$i%02d").mkString(" ")
    val fixture = Seq(
      good, "", (1 to 60).map(i => f"xq$i%02d").mkString(" "),
      Seq.fill(30)("the cat").mkString(" "),
      "the the " + (1 to 58).map(i => f"w$i%02d ,,").mkString(" "),
      good + " contact me at john@example.com now", good)
    val src = MemoryStream[(Timestamp, String)]
    val q = EventStreams.funnelMonitor(
        src.toDF().toDF("ts", "text"),
        watermark = "10 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("fm").outputMode("append")
      .start()
    try {
      src.addData(fixture.zipWithIndex.map { case (t, i) => (ts(i % 9), t) }: _*)
      q.processAllAvailable()
      assert(spark.table("fm").count() === 0) // window still open
      src.addData((ts(30), "closer"))         // watermark passes 10:10
      q.processAllAvailable()
      val r = spark.table("fm").collect().head
      val streamed = Seq("ingested", "nonempty", "gopher", "repetition",
        "quality", "pii").map(n =>
        (r.getAs[Long](s"d_$n"), r.getAs[Long](s"t_$n")))
      // the batch funnel on the same docs: stages 1-6 match exactly
      // (stage 7, exact dedup, is the one per-corpus gate the
      // streaming battery deliberately omits)
      val batch = graft.scale.TextAnalysis.filterFunnel(
          fixture.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"))
        .collect().sortBy(_.getAs[Int]("stage_idx")).take(6)
        .map(r2 => (r2.getAs[Long]("n_docs"), r2.getAs[Long]("n_toks")))
      assert(streamed === batch.toSeq)
      // and the headline numbers: 7 ingested, 2 survive the battery
      assert(streamed.head._1 === 7L && streamed.last._1 === 2L)
    } finally q.stop()
  }

  test("budgetMonitor: per-language burn-down crosses the need " +
    "threshold exactly when cumulative tokens do; need matches the " +
    "batch q148 expression") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // budget 100, en 0.8 / de 0.2 → needs 80 and 20 tokens
    val target = Map("en" -> 0.8, "de" -> 0.2)
    val src = MemoryStream[(String, String)]
    val q = EventStreams.budgetMonitor(
        src.toDF().toDF("lang", "text"), budget = 100L, target = target)
      .writeStream.format("memory").queryName("bm").outputMode("complete")
      .start()
    try {
      src.addData(("en", "a" * 160))          // 40 tokens: below need
      q.processAllAvailable()
      val r1 = spark.table("bm").collect()
        .map(r => r.getAs[String]("lang") ->
          ((r.getAs[Long]("cum_toks"), r.getAs[Double]("need_toks"),
            r.getAs[Double]("remaining_toks"), r.getAs[Boolean]("filled"))))
        .toMap
      assert(r1("en") === ((40L, 80.0, 40.0, false)))
      src.addData(("en", "b" * 240), ("de", "c" * 32)) // en 100 ≥ 80; de 8
      q.processAllAvailable()
      val r2 = spark.table("bm").collect()
        .map(r => r.getAs[String]("lang") ->
          ((r.getAs[Long]("cum_toks"), r.getAs[Double]("need_toks"),
            r.getAs[Double]("remaining_toks"), r.getAs[Boolean]("filled"))))
        .toMap
      assert(r2("en") === ((100L, 80.0, 0.0, true)))
      assert(r2("de") === ((8L, 20.0, 12.0, false)))
      // the need column IS the batch planner's need: same corpus through
      // q148 epochAllocation under the same budget/target
      val batchNeed = graft.scale.Curation.epochAllocation(
          Seq(("en", "x"), ("de", "y")).toDF("lang", "text"),
          budget = 100L, target = target)
        .collect().map(r => r.getAs[String]("lang") ->
          r.getAs[Double]("need_toks")).toMap
      assert(batchNeed("en") === r2("en")._2)
      assert(batchNeed("de") === r2("de")._2)
    } finally q.stop()
  }

  test("driftMonitor: window means are integer-exact against the " +
    "reference vocabulary; OOV tokens score zero; windows close on the " +
    "watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reference corpus: "alpha" appears 3×, "beta" 2×, "gamma" 1×
    val refDocs = Seq((1L, "alpha beta alpha"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val src = MemoryStream[(Timestamp, String, String)]
    val q = EventStreams.driftMonitor(
        src.toDF().toDF("ts", "source", "text"), refDocs,
        watermark = "10 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("dm").outputMode("append").start()
    try {
      src.addData(
        (ts(0), "web", "alpha beta"),        // 3 + 2 = 5 over 2 tokens
        (ts(5), "web", "gamma novel"),       // 1 + 0 = 1 over 2 (OOV novel)
        (ts(6), "books", "alpha alpha"))     // 3 + 3 = 6 over 2
      q.processAllAvailable()
      assert(spark.table("dm").count() === 0) // window still open
      src.addData((ts(34), "web", "alpha"))  // watermark passes 10:10
      q.processAllAvailable()
      val rows = spark.table("dm").collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("sum_ref"), r.getAs[Double]("avg_ref_freq")))).toMap
      // integer-exact: web = (5+1)/(2+2), books = 6/2
      assert(rows("web") === ((2L, 4L, 6L, 1.5)))
      assert(rows("books") === ((1L, 2L, 6L, 3.0)))
    } finally q.stop()
  }

  test("driftMonitor emissions are a sufficient statistic for the " +
    "temperature-mixture board: per-source token sums over the closed " +
    "windows, folded through temperatureMixtureFrom, equal the batch " +
    "board on the same corpus") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // sources ARE languages here; docs span two event-time windows.
    // NOTE the normalizations differ by design: driftMonitor's
    // avg_ref_freq is a per-(window, source) mean, the mixture boards
    // normalize per-lang sums over the whole corpus, and gate q138's
    // token unit is ceil(chars/4) while the monitor counts words() —
    // what this pins is that the monitor's (source, n_tokens)
    // emissions AGGREGATE to exactly the mixture chain's numerators
    // (exactly-once per window, no loss, no double count), so the
    // stream is a faithful feed for the rebalancer in its own unit.
    val docs = Seq(
      (ts(0), "en", "alpha beta gamma delta"),
      (ts(5), "en", "alpha beta"),
      (ts(25), "en", "alpha beta gamma"),
      (ts(3), "de", "eins zwei"),
      (ts(26), "de", "drei"))
    val refDocs = Seq((1L, "alpha")).toDF("doc_id", "text")
    val src = MemoryStream[(Timestamp, String, String)]
    val q = EventStreams.driftMonitor(
        src.toDF().toDF("ts", "source", "text"), refDocs,
        watermark = "10 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("dmx").outputMode("append")
      .start()
    try {
      src.addData(docs: _*)
      q.processAllAvailable()
      src.addData((ts(55), "en", "closer")) // closes both content windows
      q.processAllAvailable()
      val fromStream = spark.table("dmx")
        .groupBy(col("source").as("lang"))
        .agg(sum(col("n_tokens")).as("toks"))
      val fromBatch = docs.toDF("ts", "lang", "text")
        .select(col("lang"),
          size(graft.functions.PortableFuncs.words(col("text")))
            .cast("long").as("n"))
        .groupBy(col("lang")).agg(sum(col("n")).as("toks"))
      def board(perLang: org.apache.spark.sql.DataFrame) =
        graft.scale.Curation.temperatureMixtureFrom(perLang).collect()
          .map(r => (r.getAs[String]("lang"), r.getAs[Long]("toks"),
            r.getAs[Double]("share"), r.getAs[Double]("target_share"),
            if (r.isNullAt(r.fieldIndex("boost"))) None
            else Some(r.getAs[Double]("boost")))).toSet
      val sBoard = board(fromStream)
      assert(sBoard === board(fromBatch))
      // and the fixture is non-trivial: en 9 vs de 3 words, with the
      // sqrt rebalance lifting the low-resource source
      assert(sBoard.map(t => t._1 -> t._2).toMap === Map("en" -> 9L, "de" -> 3L))
      val boosts = sBoard.map(t => t._1 -> t._5.get).toMap
      assert(boosts("de") > 1.0 && boosts("en") < 1.0)
    } finally q.stop()
  }

  test("topTokenMonitor: estimates obey the published MG bound against " +
    "exact window counts, heavies are never missed, and windows close " +
    "on the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(83)
    // one window's worth of skewed text per source: "hot" dominates web,
    // "warm" dominates books, plus a thin uniform tail
    def body(hot: String): String =
      (Seq.fill(12)(hot) ++ Seq.fill(6)(s"tail${rnd.nextInt(20)}"))
        .mkString(" ")
    val webDocs = (0 until 6).map(i => (ts(i), "web", body("hot")))
    val bookDocs = (0 until 6).map(i => (ts(i), "books", body("warm")))
    val cap = 8
    val src = MemoryStream[(Timestamp, String, String)]
    val q = EventStreams.topTokenMonitor(
        src.toDF().toDF("ts", "source", "text"),
        watermark = "10 minutes", windowLen = "10 minutes",
        capacity = cap, k = 3)
      .writeStream.format("memory").queryName("ttm").outputMode("append").start()
    try {
      src.addData(webDocs ++ bookDocs: _*)
      q.processAllAvailable()
      assert(spark.table("ttm").count() === 0) // window still open
      src.addData((ts(34), "web", "closer"))   // watermark passes 10:10
      q.processAllAvailable()
      val rows = spark.table("ttm").collect()
        .map { r =>
          r.getAs[String]("source") -> ((r.getAs[Long]("n_tokens"),
            r.getAs[Long]("max_undercount"),
            r.getSeq[org.apache.spark.sql.Row](4)
              .map(t => t.getString(0) -> t.getLong(1))))
        }.toMap
      // exact per-source window counts from the same corpus
      def exact(docs: Seq[(Timestamp, String, String)]): Map[String, Long] =
        docs.flatMap(_._3.split(" ")).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
      for ((srcName, docs) <- Seq("web" -> webDocs, "books" -> bookDocs)) {
        val ex = exact(docs)
        val n = ex.values.sum
        val (nTokens, bound, top) = rows(srcName)
        assert(nTokens === n, s"$srcName n_tokens")
        assert(bound === n / (cap + 1), s"$srcName bound")
        // every token with true count > bound must be reported if it
        // ranks; the dominant token certainly must lead the board
        val hot = ex.maxBy { case (w, c) => (c, w) }._1
        assert(top.head._1 === hot, s"$srcName board head: $top")
        // estimates never exceed truth and undercount by at most bound
        top.foreach { case (w, est) =>
          assert(est <= ex(w), s"$srcName '$w' overcounts: $est > ${ex(w)}")
          assert(est >= ex(w) - bound,
            s"$srcName '$w' undercounts past the bound: $est < ${ex(w)} - $bound")
        }
      }
    } finally q.stop()
  }

  test("semDedupGate: per-arrival verdicts equal the batch semDedup " +
    "keep-flag on ref ∪ {arrival}; novel directions pass; " +
    "arrival-vs-arrival dups are out of scope by contract") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val dim = 64
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / n).toFloat)
    }
    val anchors = Array.tabulate(4)(g =>
      Array.tabulate(dim)(i => math.sin(g * 89 + i * 17 + 1.0)))
    // reference corpus: ids 0..19, clustered around the anchors (the
    // first 4 are the anchors themselves = the seed centroids)
    val ref = (0 until 20).map { i =>
      val a = anchors(i % 4)
      (i.toLong, unit(a.map(x => x + rnd.nextGaussian() * 0.02)))
    }
    val refDf = ref.toDF("vec_id", "embedding")
    val minCos = 0.9
    // arrivals: a jittered copy of a ref member (dup), a novel
    // orthogonal-ish direction (kept), and a near-copy of the novel
    // arrival (ALSO kept — arrival-vs-arrival is out of scope)
    val novel = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else -1.0)
    val arrivals = Seq(
      (100L, ts(0), unit(anchors(1).map(x => x + rnd.nextGaussian() * 0.02))),
      (101L, ts(1), unit(novel)),
      (102L, ts(2), unit(novel.map(x => x + rnd.nextGaussian() * 0.02))))
    val src = MemoryStream[(Long, Timestamp, Array[Float])]
    val q = EventStreams.semDedupGate(
        src.toDF().toDF("vec_id", "ts", "embedding"), refDf,
        minCos = minCos, nCells = 4)
      .writeStream.format("memory").queryName("sdg").outputMode("append").start()
    try {
      src.addData(arrivals: _*)
      q.processAllAvailable()
      val got = spark.table("sdg").collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Boolean]("is_dup"), r.getAs[Long]("cell_id")))).toMap
      // batch contract per arrival: semDedup(ref ∪ {a}) prunes a iff
      // the gate flags it (a's id outranks every reference id)
      arrivals.foreach { case (id, _, v) =>
        val batch = graft.scale.Dedup.semDedup(
            (ref :+ (id, v)).toDF("vec_id", "embedding"),
            minCos = minCos, nCells = 4)
          .filter(org.apache.spark.sql.functions.col("vec_id") === id)
          .head()
        assert(got(id)._1 === !batch.getBoolean(2),
          s"arrival $id gate vs batch keep")
        assert(got(id)._2 === batch.getLong(1), s"arrival $id cell")
      }
      assert(got(100L)._1 && !got(101L)._1 && !got(102L)._1)
    } finally q.stop()
  }

  test("span-index sink: streamed folds equal the batch spanIndex, " +
    "replay is refused, and the disjoint-batch contract is asserted") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-spanidx").toString
    val table = s"$dir/idx"
    val phrase = "alpha beta gamma delta epsilon"
    val d1 = Doc(1, ts(0), s"$phrase one two three four")
    val d2 = Doc(2, ts(1), s"zero $phrase five six seven")
    val d3 = Doc(3, ts(2), s"$phrase nine ten eleven twelve")
    val d4 = Doc(4, ts(3), "???") // wordless: zero windows, still commits
    val src = MemoryStream[Doc]
    val q = EventStreams.toSpanIndexSink(src.toDF(), table, s"$dir/ckpt").start()
    try {
      src.addData(d1, d2)
      q.processAllAvailable()
      src.addData(d3, d4)
      q.processAllAvailable()
      // streamed index == batch spanIndex over the SAME documents
      def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[String]("h") -> r.getAs[Long]("df")).toMap
      val streamed = asMap(spark.read.parquet(table).select("h", "df"))
      val batch = asMap(graft.scale.Dedup.spanIndex(
        Seq(d1, d2, d3, d4).map(d => (d.doc_id, d.text))
          .toDF("doc_id", "text")))
      assert(streamed === batch)
      // the shared phrase's windows reached df 3 via two separate folds
      assert(streamed.values.max === 3L)
      // bookkeeping: one committed version, high-watermark at doc 4
      val meta = spark.read.parquet(table)
        .select("batch_id", "max_doc").distinct().collect()
      assert(meta.length === 1 && meta.head.getLong(1) === 4L)
      val committedId = meta.head.getLong(0)
      // crash REPLAY of the committed batch: same batchId folds again
      // → detected and skipped, df counts unchanged
      EventStreams.foldSpanBatch(
        Seq((3L, d3.text), (4L, d4.text)).toDF("doc_id", "text"),
        committedId, table, graft.scale.Dedup.ShingleSize)
      assert(asMap(spark.read.parquet(table).select("h", "df")) === streamed)
      // disjoint-batch contract: re-folding an ALREADY-INDEXED doc id
      // under a new batch id must fail loudly, not double-count
      val e = intercept[IllegalArgumentException] {
        EventStreams.foldSpanBatch(
          Seq((2L, d2.text)).toDF("doc_id", "text"),
          committedId + 1, table, graft.scale.Dedup.ShingleSize)
      }
      assert(e.getMessage.contains("disjoint-batch contract"))
    } finally q.stop()
  }

  test("span-index sink tolerates a plain (h, df) seed index and starts " +
    "stamping bookkeeping on the first fold") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-spanseed").toString
    val table = s"$dir/idx"
    val phrase = "alpha beta gamma delta epsilon"
    val corpus = Seq((1L, s"$phrase one two three four"),
      (2L, s"zero $phrase five six seven"))
    // bootstrap: a batch-built index with NO bookkeeping columns
    graft.scale.Dedup.spanIndex(corpus.toDF("doc_id", "text"))
      .write.parquet(table)
    val d3 = Doc(3, ts(0), s"$phrase nine ten eleven twelve")
    val src = MemoryStream[Doc]
    val q = EventStreams.toSpanIndexSink(src.toDF(), table, s"$dir/ckpt").start()
    try {
      src.addData(d3)
      q.processAllAvailable()
      val streamed = spark.read.parquet(table)
      assert(streamed.columns.contains("batch_id") &&
        streamed.columns.contains("max_doc"))
      val got = streamed.select("h", "df").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = graft.scale.Dedup.spanIndex(
        (corpus :+ (3L, d3.text)).toDF("doc_id", "text")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expect)
    } finally q.stop()
  }

  test("file source streams the events table with converted timestamps") {
    val stream = EventStreams.fileSource(spark, "/root/testdata/sf0.001")
    assert(stream.isStreaming)
    val q = EventStreams.windowedCounts(stream, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("fs").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append-mode windows behind the final watermark are emitted
      assert(spark.table("fs").count() > 0)
    } finally q.stop()
  }

  test("lmMonitor: window totals equal the batch q162 board's per-doc " +
    "sums on a shared fixture; the model is frozen at query start") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // the q162 spec fixture: the train slice is passed explicitly here
    // (batch lmFluency derives it from the q140 split of these same ids)
    val texts = Seq(1L -> "a b a b c", 2L -> "a b a b c",
      4L -> "a b a b c", 3L -> "a b a b c", 5L -> "z b")
    val refDocs = Seq("a b a b c", "a b a b c", "a b a b c").toDF("text")
    val src = MemoryStream[(Timestamp, String)]
    val q = EventStreams.lmMonitor(src.toDF().toDF("ts", "text"), refDocs,
        watermark = "10 minutes", windowLen = "10 minutes",
        vocabSize = 2, maxBigrams = 100)
      .writeStream.format("memory").queryName("lm").outputMode("append")
      .start()
    try {
      src.addData(texts.zipWithIndex.map { case ((_, t), i) => (ts(i), t) }: _*)
      q.processAllAvailable()
      assert(spark.table("lm").count() === 0) // window still open
      src.addData((ts(30), "closer x"))       // watermark passes 10:10
      q.processAllAvailable()
      val r = spark.table("lm").collect()
        .filter(_.getAs[Timestamp]("window_start") === ts(0)).head
      // LM: vocab {a:6, b:6}, unk 3; "a b":6 "b a":3 "b <unk>":3 —
      // identical to the batch q162 fixture's model
      val p9 = (c2: Long, c1: Long) =>
        math.floor((c2 + 1).toDouble / (c1 + 3).toDouble * 1e9 + 0.5).toLong
      val spDoc = 2 * p9(6, 6) + 2 * p9(3, 6) // per "a b a b c" doc
      val spUnk = p9(0, 3)                    // "<unk> b" miss
      assert(r.getAs[Long]("n_docs") === 5L)
      assert(r.getAs[Long]("n_bigrams") === 17L)
      assert(r.getAs[Long]("n_hits") === 16L)
      assert(r.getAs[Long]("n_unk_ctx") === 1L)
      assert(r.getAs[Double]("hit_rate") === r6(16.0 / 17))
      assert(r.getAs[Double]("unk_rate") === r6(1.0 / 17))
      assert(r.getAs[Double]("mean_p") ===
        r6((4 * spDoc + spUnk).toDouble / (17 * 1e9)))
      // reconciliation with the batch board: same counts per doc
      val batch = graft.scale.TextAnalysis.lmFluency(
          texts.toDF("doc_id", "text"), vocabSize = 2, maxBigrams = 100)
        .collect()
      assert(batch.map(_.getAs[Long]("n_bigrams")).sum === 17L)
      assert(batch.map(_.getAs[Long]("n_hits")).sum === 16L)
      assert(batch.map(_.getAs[Long]("n_unk_ctx")).sum === 1L)
      // the model is FROZEN at query start: a later batch of entirely
      // novel vocabulary scores as all-unk misses — it must NOT
      // retrain the model mid-stream (unk_rate spiking is exactly the
      // retrain SIGNAL the monitor exists to emit)
      src.addData((ts(35), "qq rr qq rr"), (ts(36), "qq rr"))
      q.processAllAvailable()
      src.addData((ts(60), "closer y")) // close the 10:30 window
      q.processAllAvailable()
      val r2 = spark.table("lm").collect()
        .filter(_.getAs[Timestamp]("window_start") === ts(30)).head
      assert(r2.getAs[Long]("n_bigrams") === 5L) // closer(1) + 3 + 1
      assert(r2.getAs[Long]("n_hits") === 0L)
      assert(r2.getAs[Double]("unk_rate") === 1.0)
    } finally q.stop()
  }
}
