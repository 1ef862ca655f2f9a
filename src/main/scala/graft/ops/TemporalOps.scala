package graft.ops

import graft.{QueryModule, Tables => T}
import graft.Materialize.CoreOps
import graft.functions.PortableFuncs.{exactSumRound, exactSumRoundSql, portableRound}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators the built-in API lacks as single verbs —
  * as-of join and bounded range join — composed from union + window and
  * bin-bucketed equi-joins so they stay one-shuffle at 100 TB (north
  * star; no reference counterpart — the reference has no temporal
  * joins at all, SURVEY §2.3).
  *
  * Scale design:
  *  - [[asofJoin]] is the union-tag trick: tag right rows 0 / left rows
  *    1, shuffle ONCE by key, sort by (ts, tag) inside each partition,
  *    and carry the latest right payload forward with
  *    `last(ignoreNulls)` over rows-unbounded-preceding. No n² pair
  *    blowup, no per-left-row probe: exactly the sort-merge work a
  *    native as-of join does. Skewed keys sort within their partition —
  *    data per KEY (not per partition) must fit the sort spill path,
  *    which Spark handles by spilling.
  *  - [[rangeJoin]] buckets time into window-sized bins: a right row
  *    lands in bin ⌊t/W⌋, a left interval [t, t+W] can only intersect
  *    bins ⌊t/W⌋ and ⌊t/W⌋+1, so the candidate join is an EQUI-join on
  *    (key, bin) — shuffle volume O(rows), never the cross product —
  *    followed by the exact range filter. Each (left,right) pair meets
  *    in exactly one bin, so no dedup pass is needed.
  */
object TemporalOps extends QueryModule {

  /** As-of join: for every left row, attach `rightPayload` from the
    * latest right row with the same `keys` and `right.ts <= left.ts`
    * (inclusive — a tie counts as a match, like DuckDB's
    * `ASOF JOIN ... ON l.ts >= r.ts`). Left-outer: unmatched left rows
    * keep nulls. Payload columns come back suffixed with `suffix`.
    * Among right rows tied on (keys, ts) the MAXIMUM payload struct
    * (lexicographic by field order) wins — a deterministic tie-break,
    * never partition-order dependent. Payload columns must therefore be
    * orderable types (no maps); violations fail at analysis time.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightPayload: Seq[String],
               suffix: String = "_r"): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    val payloadType = StructType(right.select(rightPayload.map(col): _*).schema)
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("__t") :+ lit(1).as("__side") :+
        leftStruct.as("__l") :+ lit(null).cast(payloadType).as("__rp")): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__t") :+ lit(0).as("__side") :+
        lit(null).cast(StructType(left.schema)).as("__l") :+
        struct(rightPayload.map(col): _*).as("__rp")): _*)
    // ORDER (ts, side, payload): at equal ts the right row (0) sorts
    // before the left row (1), so ties are visible to the carry-forward;
    // among right rows tied on ts the payload struct orders them, so the
    // one carried forward (the last, i.e. the max) is deterministic —
    // the same rows always produce the same answer regardless of
    // partition layout or scan order.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__rp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__c", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(p => col(s"__c.$p").as(s"$p$suffix")): _*)
  }

  /** Bounded range join (inner): pairs of (left, right) rows sharing
    * `keys` with `right.ts` in `[left.ts, left.ts + windowSec]`, both
    * ends inclusive. Right columns in `rightPayload` come back
    * suffixed. Implementation is the 2-bin bucketing equi-join
    * described above. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTs: String, rightTs: String, windowSec: Long,
                rightPayload: Seq[String], suffix: String = "_r"): DataFrame = {
    // windowSec = 0 would divide the bin by zero and silently match
    // nothing; same-instant joins are a plain equi-join on (keys, ts)
    require(windowSec >= 1, s"windowSec must be >= 1: $windowSec")
    def bin(ts: Column): Column = floor(ts.cast("double") / windowSec.toDouble)
    val l = left.withColumn("__bin",
      explode(array(bin(col(leftTs)), bin(col(leftTs)) + 1)))
    val r = right.select(
      (keys.map(col) :+ bin(col(rightTs)).as("__bin") :+
        col(rightTs).as("__rt") :+
        struct(rightPayload.map(col): _*).as("__rp")): _*)
    l.join(r, keys :+ "__bin")
      .filter(col("__rt") >= col(leftTs) &&
        col("__rt") <= col(leftTs) + expr(s"INTERVAL $windowSec SECONDS"))
      .select(left.columns.map(col) ++
        rightPayload.map(p => col(s"__rp.$p").as(s"$p$suffix")): _*)
  }

  /** Ordered conversion funnel: per user, how far through `stages` the
    * event stream gets when each stage must happen STRICTLY after the
    * previous stage's completion; per stage, how many users reach it
    * plus the conversion rate from the stage before.
    *
    * Semantics (greedy-earliest, the standard funnel definition): a
    * user completes stage 1 at their earliest stage-1 event, stage i at
    * their earliest stage-i event after the stage-(i-1) completion.
    * Greedy-earliest is optimal for reachability — if ANY ordered
    * subsequence of stage events exists, the greedy one does — so
    * "users reaching stage i" is well-defined.
    *
    * Scale design: exactly ONE shuffle (groupBy user). Each user's
    * tracked events are sorted and folded through the stage cascade in
    * one `aggregate` pass — per-user memory, the same bound every
    * sessionization carries. Stage counts are conditional sums in one
    * final single-row aggregate; no self-joins, no per-stage passes
    * over the corpus (the naive min-cascade is `stages.size` corpus
    * scans + joins — that shape is the ORACLE, not the plan).
    */
  /** The per-user sorted event table every funnel-family fold reads —
    * (user_id, evs: sorted array of (ts, event_type) structs limited
    * to `stages`). The ONE data shuffle of the family; the gate
    * registry memoizes it for the default stage set so a batch run
    * pays it once for q113/q121/q136. */
  private[ops] def funnelEvs(events: DataFrame,
                             stages: Seq[String]): DataFrame =
    events
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"), col("ts"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type"))))
        .as("evs"))

  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    funnelFrom(funnelEvs(events, stages), stages)

  /** [[funnel]] from the shared per-user sorted event core. */
  private[ops] def funnelFrom(perUser: DataFrame,
                              stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    val stageLit = typedLit(stages)
    val reached = perUser.select(
      aggregate(
        col("evs"),
        struct(lit(0).as("n"), lit(null).cast("timestamp").as("t")),
        (acc, e) => {
          val n = acc.getField("n")
          val advance = n < stages.size &&
            e.getField("event_type") === element_at(stageLit, n + 1) &&
            (n === 0 || e.getField("ts") > acc.getField("t"))
          when(advance,
            struct((n + 1).as("n"), e.getField("ts").as("t"))).otherwise(acc)
        }).getField("n").as("reached"))
    stageSummary(reached, stages, i => col("reached") >= i + 1)
  }

  /** q136: funnel transition latency — per consecutive stage pair of
    * the greedy-earliest funnel (the q113 semantics), the exact
    * p50/p90/p99 of the transition delay over converting users: the
    * "where does the funnel stall" board a product owner reads next to
    * the q113 conversion rates.
    *
    * Scale design: ONE data shuffle, the q113 per-user sorted fold —
    * the accumulator additionally carries the completion timestamp of
    * every reached stage (bounded: ≤ stages entries), so transition
    * delays fall out of the same pass; percentiles ride
    * [[graft.ops.CoreQueries.cumDistPercentiles]] (distinct-value
    * cum-dist — exchange carries distinct delays, percentile picks are
    * integer-threshold exact, `percentile_disc`-equivalent and bitwise
    * engine-portable). Delays are integer micros — no float anywhere.
    */
  def funnelLatency(events: DataFrame,
                    stages: Seq[String] = Seq("view", "click", "purchase")):
      DataFrame =
    funnelLatencyFrom(funnelEvs(events, stages), stages)

  /** [[funnelLatency]] from the shared per-user sorted event core. */
  private[ops] def funnelLatencyFrom(perUser: DataFrame,
                                     stages: Seq[String]): DataFrame = {
    require(stages.size >= 2 && stages.distinct.size == stages.size,
      s"need >= 2 distinct stages: $stages")
    val stageLit = typedLit(stages)
    val transLit = typedLit(
      stages.sliding(2).map(p => s"${p.head}->${p(1)}").toSeq)
    val folded = perUser.select(
      aggregate(
        col("evs"),
        struct(lit(0).as("n"), lit(null).cast("timestamp").as("t"),
          array().cast("array<timestamp>").as("times")),
        (acc, e) => {
          val n = acc.getField("n")
          val advance = n < stages.size &&
            e.getField("event_type") === element_at(stageLit, n + 1) &&
            (n === 0 || e.getField("ts") > acc.getField("t"))
          when(advance,
            struct((n + 1).as("n"), e.getField("ts").as("t"),
              concat(acc.getField("times"), array(e.getField("ts")))
                .as("times"))).otherwise(acc)
        }).getField("times").as("times"))
    val delays = folded
      .filter(size(col("times")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("times")) - 1),
        i => struct(
          element_at(transLit, i).as("transition"),
          (unix_micros(element_at(col("times"), i + 1)) -
            unix_micros(element_at(col("times"), i))).as("delay_us")))).as("d"))
      .select(col("d.transition"), col("d.delay_us"))
    CoreQueries.cumDistPercentiles(delays, "transition", "delay_us")
  }

  /** Shared funnel epilogue ([[funnel]]/[[funnelWindow]]): one
    * single-row aggregate of stage counts (c0 = base users, cI =
    * users whose stage-i predicate holds) exploded into
    * (stage_idx, stage, users, conv_rate) rows — conv_rate is
    * null-guarded against an empty previous stage. */
  private def stageSummary(perUser: DataFrame, stages: Seq[String],
                           reachedStage: Int => Column): DataFrame = {
    // coalesce: over an EMPTY per-user table (no event matches any
    // tracked stage — fuzz seed 711's single-event corpus) sum() is
    // NULL but the oracle's COUNT(*) subqueries are 0 — the board must
    // read "0 users reached", not NULL, on both engines
    val countCols = count(lit(1)).as("c0") +:
      stages.indices.map(i =>
        coalesce(sum(when(reachedStage(i), 1L).otherwise(0L)), lit(0L))
          .as(s"c${i + 1}"))
    val counts = perUser.agg(countCols.head, countCols.tail: _*)
    val stageRows = stages.indices.map { i =>
      val prev = col(s"c$i")
      struct(
        lit(i + 1).as("stage_idx"),
        lit(stages(i)).as("stage"),
        col(s"c${i + 1}").as("users"),
        when(prev > 0, col(s"c${i + 1}").cast("double") / prev.cast("double"))
          .as("conv_rate"))
    }
    counts.select(explode(array(stageRows: _*)).as("s")).select(col("s.*"))
  }

  /** Cohort retention: users are cohorted by first-seen day; for each
    * (cohort day, week offset) the number of distinct users active in
    * that week. The two-aggregate shape is the canonical one — cohort
    * assignment groups by user, the join back rides the SAME user_id
    * partitioning (exchange reuse), and the distinct collapses
    * per-user duplicate (day, week) activity before the final count,
    * so the last exchange carries at most one row per (user, week).
    */
  def retention(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("day"))
    val firsts = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    days.join(firsts, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / 7).cast("long")
          .as("week_off"))
      .distinct()
      .groupBy(col("cohort_day"), col("week_off"))
      .agg(count(lit(1)).as("users"))
  }

  /** Windowed funnel (the ClickHouse-windowFunnel shape): stage i
    * counts a user when SOME strictly-ordered chain of stage events
    * exists whose every event lies within `windowSec` of the chain's
    * stage-1 anchor. Unlike [[funnel]]'s greedy-earliest cascade, the
    * anchor is existential — a user whose first view expired can still
    * convert off a later view.
    *
    * The per-user fold is an exact DP over the sorted stream: for each
    * stage keep the MAXIMUM anchor among chains completed so far
    * (later anchors have the slackest window for every future
    * extension, and every recorded chain's last event is already ≤ the
    * current ts because the stream is sorted — so one anchor per stage
    * is a complete state). Strictness rides a prev/cur state pair:
    * events at the same ts extend only chains recorded at strictly
    * earlier timestamps. One data shuffle, O(stages) state per user —
    * same scale shape as [[funnel]]; the exists-chain restatement is
    * the ORACLE (per-user chains are bounded, the corpus never
    * self-joins in the plan).
    */
  def funnelWindow(events: DataFrame,
                   stages: Seq[String] = Seq("view", "click", "purchase"),
                   windowSec: Long = 172800L): DataFrame =
    funnelWindowFrom(funnelEvs(events, stages), stages, windowSec)

  /** [[funnelWindow]] from the shared per-user sorted event core —
    * the micros view is a per-row transform of the cached array
    * (unix_micros is monotone in ts, so the sorted order carries). */
  private[ops] def funnelWindowFrom(perUserTs: DataFrame,
                                    stages: Seq[String],
                                    windowSec: Long): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    require(windowSec >= 1, s"windowSec must be >= 1: $windowSec")
    val stageLit = typedLit(stages)
    val nS = stages.size
    val wUs = windowSec * 1000000L
    val noneAnchors = typedLit(Seq.fill(nS)(null: java.lang.Long))
    val perUser = perUserTs.select(col("user_id"),
      transform(col("evs"), e =>
        struct(unix_micros(e.getField("ts")).as("t"),
          e.getField("event_type").as("event_type"))).as("evs"))
    val reached = perUser.select(
      aggregate(
        col("evs"),
        struct(lit(Long.MinValue).as("ts"), noneAnchors.as("cur"),
          noneAnchors.as("prev")),
        (acc, e) => {
          val t = e.getField("t")
          // snapshot: chains usable at ts t are those recorded < t
          val prev = when(t > acc.getField("ts"), acc.getField("cur"))
            .otherwise(acc.getField("prev"))
          val idx = array_position(stageLit, e.getField("event_type"))
          val cand = when(idx === 1, t).otherwise({
            val pa = element_at(prev, (idx - 1).cast("int"))
            when(pa.isNotNull && t - pa <= wUs, pa)
          })
          val cur = transform(acc.getField("cur"), (a, i) =>
            when(i + 1 === idx && cand.isNotNull,
              greatest(coalesce(a, lit(Long.MinValue)), cand)).otherwise(a))
          struct(t.as("ts"), cur.as("cur"), prev.as("prev"))
        }).getField("cur").as("anchors"))
    stageSummary(reached, stages,
      i => element_at(col("anchors"), i + 1).isNotNull)
  }

  /** Event-rate anomaly report: per (day, event type), the daily count
    * against the type's exact median daily count, flagged when the day
    * runs more than 25% above median. The flag is the integer
    * cross-multiplication `4·n > 5·med` — no division, no doubles, so
    * the report is bit-stable in any engine. Median is the exact lower
    * median (the value at rank ⌊(cnt+1)/2⌋ of the ascending daily
    * counts — q48's integer-threshold discipline).
    *
    * Scale shape: one corpus aggregate to the (day × type) table; the
    * median window and the join back run over that aggregated table
    * (days × types rows), never the corpus.
    */
  def rateAnomaly(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type"))
    val med = daily
      .withColumn("rn",
        row_number().over(byType.orderBy(col("n").asc, col("day").asc)))
      .withColumn("cnt", count(lit(1)).over(byType))
      .filter(col("rn") === ((col("cnt") + 1) / 2).cast("long"))
      .select(col("event_type"), col("n").as("med"))
    daily.join(med, Seq("event_type"))
      .select(col("day"), col("event_type"), col("n"), col("med"),
        (col("n") * 4 > col("med") * 5).as("anomaly"))
  }

  /** Event-type transition matrix (the product-analytics "flow"
    * diagram): per (from, to) pair of consecutive events in a user's
    * stream, the count and the row-normalized share — an empirical
    * Markov chain over event types. One window pass for the `lead`
    * plus one aggregate; the share division runs over the ≤ types²
    * aggregated table.
    */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("from_type")))
            .cast("double"))
  }

  /** RFM segmentation: per user, recency (days since their last event,
    * against the corpus max day), frequency (event count) and monetary
    * (exact-decimal value sum), each scored into quartiles 1–4 (4 =
    * best) by the rank-split `1 + (rn−1)·4 div n` — integer-exact, no
    * percentile boundary arithmetic (q48 discipline; ties split
    * deterministically on user_id). The segment label concatenates the
    * three digits.
    *
    * Scale design: each metric's global rank is the DISTRIBUTED
    * two-phase prefix sum ([[graft.scale.Curation.sequencePack]] /
    * `CoreQueries.cumDistPercentilesDistributed` discipline) — a
    * single-partition global-order window would funnel the whole
    * users-sized aggregate (10⁸–10⁹ rows at 100 TB) through ONE task
    * per metric. Instead: range-partition by the metric order, collect
    * the numPartitions-row per-partition counts, broadcast them back
    * as rank offsets, and row_number WITHIN partitions only. The only
    * global coordination left is the 1-row corpus-day max and the
    * partition-count-sized offset tables. The three metric rankings
    * share nothing past the checkpointed per-user base, so they build
    * CONCURRENTLY (driver-side futures — each is its own
    * exchange/collect chain) and join back on user_id; sequential
    * chaining would triple the latency of an already
    * round-trip-bounded op.
    */
  def rfm(events: DataFrame, partitions: Int = 32): DataFrame = {
    val perUser = events.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("n_events"),
        exactSumRound(col("value"), 2).as("monetary"))
    val maxDay = perUser.agg(max(col("last_day")).as("corpus_day"))
    val base = perUser.crossJoin(broadcast(maxDay))
      .withColumn("r_days",
        datediff(col("corpus_day"), col("last_day")).cast("long"))
      .select(col("user_id"), col("r_days"), col("n_events"),
        col("monetary"))
      .coreCheckpoint() // one materialization feeds all three rankings
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    // keep each future's jobs in the caller's scheduler pool (the
    // property is thread-local; a fresh executor thread would silently
    // fall back to the default pool mid-query)
    val sc = base.sparkSession.sparkContext
    val pool = sc.getLocalProperty("spark.scheduler.pool")
    val specs = Seq[(String, Seq[Column])](
      ("r_score", Seq(col("r_days").desc, col("user_id").asc)),
      ("f_score", Seq(col("n_events").asc, col("user_id").asc)),
      ("m_score", Seq(col("monetary").asc, col("user_id").asc)))
    val scored = Await.result(Future.sequence(specs.map { case (n, ord) =>
      Future {
        sc.setLocalProperty("spark.scheduler.pool", pool)
        try addQuartileScore(n, partitions, ord: _*)(base)
          .select(col("user_id"), col(n))
        finally sc.setLocalProperty("spark.scheduler.pool", null)
      }
    }), Duration.Inf)
    scored.foldLeft(base)((acc, s) => acc.join(s, Seq("user_id")))
      .withColumn("segment",
        concat(lit("R"), col("r_score"), lit("F"), col("f_score"),
          lit("M"), col("m_score")))
  }

  /** One distributed quartile scoring pass for [[rfm]]: global
    * row_number under `order` = in-partition row_number + the
    * broadcast per-partition rank offset (range partitioning makes
    * partition order = key order, the tiebreak column makes the order
    * total), folded into the `1 + (rn−1)·4 div n` quartile split. The
    * division is the same long→double `/` + int cast as the previous
    * global-window form and the DuckDB oracle's `//` — identical
    * boundaries. localCheckpoint pins `spark_partition_id` so phase 1
    * (counts collect) and phase 2 (window) see the same layout. */
  private def addQuartileScore(name: String, partitions: Int,
                               order: Column*)(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val t = df.repartitionByRange(partitions, order: _*)
      .withColumn("_pid", spark_partition_id())
      .coreCheckpoint()
    val counts = t.groupBy(col("_pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val off = acc; acc += c; (pid, off)
    }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("_pid", "_offset")
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    t.join(broadcast(offDf), "_pid")
      .withColumn(name,
        (lit(1) + (row_number().over(w) + col("_offset") - 1) * 4 / lit(n))
          .cast("int"))
      .drop("_pid", "_offset")
  }

  /** Per-user session-duration report on top of the q22 gap
    * recurrence: sessions are maximal runs with inter-event gaps ≤
    * `gapMin` minutes; per user the report carries session count,
    * event count, mean session duration (seconds, one division of the
    * integer microsecond total — no per-session double math) and the
    * longest session (floor seconds, pure integer). Two window passes
    * over the per-user stream + two aggregates — the same shuffle
    * budget as q22 itself.
    */
  def sessionStats(events: DataFrame, gapMin: Int = 30): DataFrame = {
    val gapUs = gapMin * 60000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val sessions = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
        .as("dur_us"), count(lit(1)).as("n"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        portableRound(sum(col("dur_us")).cast("double") /
          (count(lit(1)) * 1000000L).cast("double"), 2)
          .as("mean_session_sec"),
        (max(col("dur_us")) / 1000000L).cast("long").as("max_session_sec"))
  }

  // ---- driver-gate queries ----

  /** q43: for each purchase event, the latest click (value + time) by
    * the same user at or before the purchase. */
  def q43AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("ts", "value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("ts_r").as("click_ts"), col("value_r").as("click_value"))
  }

  /** q45's "following N seconds" window — ONE definition for the
    * Scala [[rangeJoin]] call and the oracle's `INTERVAL` bound (the
    * GateMaxDist shared-constant discipline). */
  val RangeJoinWindowSec = 300L

  /** q45: per purchase, how many error events the same user hit within
    * the following [[RangeJoinWindowSec]] seconds (zero-count
    * purchases included). */
  def q45RangeJoin(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"))
    val pairs = rangeJoin(purchases, errors, Seq("user_id"), "ts", "ts",
      windowSec = RangeJoinWindowSec, rightPayload = Seq("ts"))
    val counts = pairs.groupBy(col("event_id")).agg(count(lit(1)).as("n"))
    purchases.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n"), lit(0L)).as("n_errors"))
  }

  private val FunnelStages = Seq("view", "click", "purchase")

  /** Shared per-user sorted event core for the funnel family — the
    * one data shuffle of q113/q121/q136, built once per batch run. */
  private def gateEvs(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"events:funnel-evs:$d")(
      funnelEvs(T.events(s, d), FunnelStages))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_asof_join" -> q43AsofJoin,
    "q45_range_join" -> q45RangeJoin,
    "q113_funnel" -> ((s, d) => funnelFrom(gateEvs(s, d), FunnelStages)),
    // per-transition funnel stall: exact delay percentiles
    "q136_funnel_latency" -> ((s, d) =>
      funnelLatencyFrom(gateEvs(s, d), FunnelStages)),
    "q114_retention" -> ((s, d) => retention(T.events(s, d))),
    "q119_rate_anomaly" -> ((s, d) => rateAnomaly(T.events(s, d))),
    "q121_funnel_window" -> ((s, d) =>
      funnelWindowFrom(gateEvs(s, d), FunnelStages, windowSec = 172800L)),
    "q122_transitions" -> ((s, d) => transitions(T.events(s, d))),
    "q123_rfm" -> ((s, d) => rfm(T.events(s, d))),
    "q124_session_stats" -> ((s, d) => sessionStats(T.events(s, d)))
  )

  // CAST(ts AS TIMESTAMP) truncates DuckDB's TIMESTAMP_NS to micros —
  // the same precision Tables.events hands Spark, so both engines
  // compare identical instants (NOTES: events is TIMESTAMP(NANOS)).
  override val oracle: Map[String, String] = Map(
    // clicks pre-aggregated to (user_id, ts, max(value)): several
    // clicks can share an instant, DuckDB's ASOF picks an arbitrary
    // tied row, and the Spark asofJoin's carry-forward is defined as
    // the MAX payload struct at equal ts — the pre-agg makes the right
    // side tie-free so both engines state the same deterministic
    // semantic (fuzz seeds 101/202 caught the divergence)
    "q43_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type, value FROM events),
        |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(value) AS value FROM e
        |  WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts,
        |  c.ts AS click_ts, c.value AS click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "q45_range_join" ->
      s"""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type FROM events),
        |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
        |x AS (SELECT user_id, ts FROM e WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id, COUNT(x.ts) AS n_errors
        |FROM p LEFT JOIN x
        |  ON p.user_id = x.user_id AND x.ts >= p.ts
        | AND x.ts <= p.ts + INTERVAL $RangeJoinWindowSec SECOND
        |GROUP BY 1, 2""".stripMargin,
    // the naive min-cascade restatement of the greedy-earliest fold:
    // stage 1 completes at min(ts), stage i at the min stage-i ts
    // strictly after stage i-1's completion — the two definitions
    // coincide (greedy-earliest maximizes every later stage's chances)
    // greedy-earliest == the min-ts cascade (q113's identity), so the
    // transition timestamps are the cascade's own mins; percentiles
    // are ANSI percentile_disc over the integer micro delays
    "q136_funnel_latency" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |d AS (SELECT 'view->click' AS transition,
        |    epoch_us(s2.t) - epoch_us(s1.t) AS delay_us
        |  FROM s1 JOIN s2 USING (user_id)
        |  UNION ALL
        |  SELECT 'click->purchase', epoch_us(s3.t) - epoch_us(s2.t)
        |  FROM s2 JOIN s3 USING (user_id))
        |SELECT transition,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_us) AS p50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_us) AS p90,
        |  percentile_disc(0.99) WITHIN GROUP (ORDER BY delay_us) AS p99,
        |  COUNT(*) AS n
        |FROM d GROUP BY transition""".stripMargin,
    "q113_funnel" ->
      """WITH base AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |c AS (SELECT (SELECT COUNT(*) FROM base) AS c0,
        |  (SELECT COUNT(*) FROM s1) AS c1,
        |  (SELECT COUNT(*) FROM s2) AS c2,
        |  (SELECT COUNT(*) FROM s3) AS c3)
        |SELECT 1 AS stage_idx, 'view' AS stage, c1 AS users,
        |  CASE WHEN c0 > 0 THEN CAST(c1 AS DOUBLE) / c0 END AS conv_rate FROM c
        |UNION ALL SELECT 2, 'click', c2,
        |  CASE WHEN c1 > 0 THEN CAST(c2 AS DOUBLE) / c1 END FROM c
        |UNION ALL SELECT 3, 'purchase', c3,
        |  CASE WHEN c2 > 0 THEN CAST(c3 AS DOUBLE) / c2 END FROM c""".stripMargin,
    "q114_retention" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
        |w AS (SELECT DISTINCT d.user_id, f.cohort_day,
        |    CAST(date_diff('day', f.cohort_day, d.day) // 7 AS BIGINT) AS week_off
        |  FROM d JOIN f ON d.user_id = f.user_id)
        |SELECT cohort_day, week_off, COUNT(*) AS users
        |FROM w GROUP BY 1, 2""".stripMargin,
    "q119_rate_anomaly" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type,
        |    COUNT(*) AS n FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, n AS med FROM (
        |    SELECT event_type, n, day,
        |      ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY n ASC, day ASC) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM daily)
        |  WHERE rn = (cnt + 1) // 2)
        |SELECT d.day, d.event_type, d.n, m.med,
        |  (d.n * 4 > m.med * 5) AS anomaly
        |FROM daily d JOIN med m ON d.event_type = m.event_type""".stripMargin,
    // exists-chain restatement of the windowed-funnel DP: stage i
    // counts users with SOME strictly-ordered chain inside the window
    // of ITS OWN stage-1 anchor (per-user chains are bounded — the
    // plan-side fold never self-joins the corpus)
    "q121_funnel_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |base AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
        |s2 AS (SELECT DISTINCT v.user_id FROM e v
        |  JOIN e c ON c.user_id = v.user_id
        |  WHERE v.event_type = 'view' AND c.event_type = 'click'
        |    AND c.t > v.t AND c.t - v.t <= 172800000000),
        |s3 AS (SELECT DISTINCT v.user_id FROM e v
        |  JOIN e c ON c.user_id = v.user_id
        |  JOIN e p ON p.user_id = v.user_id
        |  WHERE v.event_type = 'view' AND c.event_type = 'click'
        |    AND p.event_type = 'purchase'
        |    AND c.t > v.t AND p.t > c.t
        |    AND c.t - v.t <= 172800000000
        |    AND p.t - v.t <= 172800000000),
        |c AS (SELECT (SELECT COUNT(*) FROM base) AS c0,
        |  (SELECT COUNT(*) FROM s1) AS c1,
        |  (SELECT COUNT(*) FROM s2) AS c2,
        |  (SELECT COUNT(*) FROM s3) AS c3)
        |SELECT 1 AS stage_idx, 'view' AS stage, c1 AS users,
        |  CASE WHEN c0 > 0 THEN CAST(c1 AS DOUBLE) / c0 END AS conv_rate FROM c
        |UNION ALL SELECT 2, 'click', c2,
        |  CASE WHEN c1 > 0 THEN CAST(c2 AS DOUBLE) / c1 END FROM c
        |UNION ALL SELECT 3, 'purchase', c3,
        |  CASE WHEN c2 > 0 THEN CAST(c3 AS DOUBLE) / c2 END FROM c""".stripMargin,
    "q122_transitions" ->
      """WITH t AS (SELECT event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS next_type
        |  FROM events),
        |g AS (SELECT event_type AS from_type, next_type AS to_type,
        |    COUNT(*) AS n
        |  FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) /
        |    CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS share
        |FROM g""".stripMargin,
    "q123_rfm" -> {
      val scoreSql = (order: String) =>
        s"CAST(1 + (ROW_NUMBER() OVER (ORDER BY $order) - 1) * 4 // " +
          "COUNT(*) OVER () AS INTEGER)"
      s"""WITH u AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
         |    COUNT(*) AS n_events,
         |    ${exactSumRoundSql("value", 2)} AS monetary
         |  FROM events GROUP BY 1),
         |m AS (SELECT max(last_day) AS corpus_day FROM u),
         |b AS (SELECT u.user_id,
         |    CAST(date_diff('day', u.last_day, m.corpus_day) AS BIGINT) AS r_days,
         |    u.n_events, u.monetary
         |  FROM u, m),
         |s AS (SELECT user_id, r_days, n_events, monetary,
         |    ${scoreSql("r_days DESC, user_id ASC")} AS r_score,
         |    ${scoreSql("n_events ASC, user_id ASC")} AS f_score,
         |    ${scoreSql("monetary ASC, user_id ASC")} AS m_score
         |  FROM b)
         |SELECT user_id, r_days, n_events, monetary,
         |  r_score, f_score, m_score,
         |  'R' || r_score || 'F' || f_score || 'M' || m_score AS segment
         |FROM s""".stripMargin
    },
    "q124_session_stats" ->
      """WITH t AS (SELECT user_id, ts, event_id,
        |    LAG(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess,
        |    event_id FROM t),
        |s AS (SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS sess_id FROM m),
        |g AS (SELECT user_id, sess_id,
        |    epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
        |    COUNT(*) AS n
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(n) AS BIGINT) AS n_events,
        |  FLOOR((CAST(SUM(dur_us) AS DOUBLE) /
        |    CAST(COUNT(*) * 1000000 AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS mean_session_sec,
        |  CAST(max(dur_us) // 1000000 AS BIGINT) AS max_session_sec
        |FROM g GROUP BY 1""".stripMargin
  )
}
