package graft.ops

import graft.{QueryModule, Tables => T}
import graft.Materialize.CoreOps
import graft.functions.PortableFuncs.{exactSum, exactSumSql, exactSumRound, exactSumRoundSql, portableRound, portableRoundSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Core relational operators from SURVEY.md §2 (scans S1, filters F1–F8,
  * joins J1–J6, aggregations A1–A8, mutations-as-queries M1–M10, scalar
  * functions C1–C14), each re-expressed as a declarative DataFrame
  * program over the driver test tables so Catalyst gets full pushdown /
  * pruning / join-strategy freedom.
  *
  * Scale notes (100 TB):
  *  - dimension joins ([[q05]], [[q08]]) broadcast the small side — no
  *    shuffle of the fact table;
  *  - aggregations are hash-aggregates with map-side partials;
  *  - point lookups ([[q03]]) push the key predicate into the parquet
  *    scan (row-group skipping via min/max stats);
  *  - semi/anti joins ship only the join key column of the probe side.
  */
object CoreQueries extends QueryModule {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** A1–A4 analog / TPC-H Q1 pricing summary: wide scan with partial
    * aggregation; reference: per-status counters `task_manager.py:348-376`
    * and weight sums `validators.py:303-315`. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    // widen AFTER the filter: the predicate still pushes into the scan,
    // and the decimal-heavy partial aggregation runs on all cores even
    // when the file is a single row group (no-op at real scale)
    graft.scale.Layout.widen(
      T.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("2024-06-30 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // exactSum: decimal accumulation is associative, so the result
        // is independent of partitioning — a raw double sum is not, and
        // round() can't absorb a cross-engine half-tie
        exactSumRound(col("l_quantity"), 2).as("sum_qty"),
        exactSumRound(col("l_extendedprice"), 2).as("sum_base_price"),
        exactSumRound(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("sum_disc_price"),
        portableRound(exactSum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
        portableRound(exactSum(col("l_discount")) / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** F2: conjunctive filter + projection, pushed to the parquet scan;
    * reference `data_pipeline.py:175-200`. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        // raw IEEE product (no round): the identical expression tree in
        // DuckDB yields bit-identical doubles — no rounding needed at all
        // (engine-native round(x,2) would break half-cent ties
        // differently; portableRound exists for columns that must round).
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))

  /** F1: point lookup by key; reference `patch_dp.py:50-55`. */
  def q03PointLookup(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .filter(col("o_orderkey") === 42L)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        portableRound(col("o_totalprice"), 2).as("total"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"))

  /** F4/J3: existence + duplicate-key guard; reference `create_dp.py:42-49`,
    * `approve_datapoint.py:104-106`. */
  def q04DupCheck(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d)
    li.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey") * 8 + col("l_linenumber")).as("n_keys"))
      .select(col("n_rows"), col("n_keys"), (col("n_rows") - col("n_keys")).as("n_dups"))
  }

  /** J6: fact ⋈ broadcast dimension; reference `data_pipeline.py:202-227`.
    * `broadcast(part)` avoids shuffling lineitem at any scale. */
  def q05BroadcastJoin(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(exactSumRound(col("l_extendedprice"), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** J1: left-semi join (the verified-dataset filter);
    * reference `scripts/create_verified_csv.py:29-64`. */
  def q06SemiJoin(s: SparkSession, d: String): DataFrame = {
    val bigOrders = T.orders(s, d).filter(col("o_totalprice") > 400000.0)
    T.customer(s, d)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** J2: left-anti join (init dedup / guard);
    * reference `scripts/validate_all_prod_dps.py:98-129`. */
  def q07AntiJoin(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** J4 analog: multi-level dimension hierarchy join (both dims broadcast);
    * reference parent-child traversal `task_manager.py:326-346`. */
  def q08HierarchyJoin(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        exactSumRound(col("c_acctbal"), 2).as("sum_bal"))

  /** A1/A2: count by status/type; reference `task_manager.py:348-376`. */
  def q09StatusCounts(s: SparkSession, d: String): DataFrame =
    T.events(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("n"))

  /** A3: per-type completion rate with `x/y` display string;
    * reference `data_pipeline.py:138-156`. */
  def q10CompletionRate(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("value") > 100.0, 1L).otherwise(0L)).as("completed"),
        count(lit(1)).as("total"))
      .select(
        col("event_type"), col("completed"), col("total"),
        portableRound(col("completed").cast("double") / col("total"), 4).as("rate"),
        concat(col("completed").cast("string"), lit("/"), col("total").cast("string")).as("display"))

  /** A5: error grouping with capped example list (sorted for determinism);
    * reference `validate_all_prod_dps.py:234-271`. */
  def q11ErrorGrouping(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .filter(col("event_type") === "error")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_errors"),
        array_join(
          transform(slice(array_sort(collect_list(col("event_id"))), 1, 5), _.cast("string")),
          ",").as("first5"))

  /** F5: stale-lock timeout sweep as a projection;
    * reference `task_manager.py:109-138`. */
  def q12StaleSweep(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select(
      col("event_id"),
      col("event_type"),
      when(col("event_type").isin("signup", "view") && col("ts") < ts("2024-01-03 00:00:00"),
        lit("expired")).otherwise(lit("active")).as("lock_state"))

  /** C1/A4: JSON map decode + aggregate over values;
    * reference weight maps `patch_dp.py:79-103`. */
  def q13JsonMap(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"))

  /** M5: normalize-on-write + unionByName with missing columns;
    * reference `add_dp_to_review.py:71-79,96-118`. */
  def q14UnionNormalize(s: SparkSession, d: String): DataFrame = {
    val o = graft.scale.Layout.widen(T.orders(s, d)).select(
      col("o_orderkey").as("id"), lit("order").as("src"),
      col("o_totalprice").as("amount"), col("o_orderpriority").as("extra"))
    val l = graft.scale.Layout.widen(T.lineitem(s, d)).select(
      col("l_orderkey").as("id"), lit("line").as("src"),
      col("l_extendedprice").as("amount"))
    o.unionByName(l, allowMissingColumns = true)
      .groupBy(col("src"))
      .agg(
        count(lit(1)).as("n"),
        exactSumRound(col("amount"), 2).as("total"),
        sum(when(col("extra").isNull, 1L).otherwise(0L)).as("n_missing"))
  }

  /** Window top-k per group (deterministic tie-break). */
  def q15WindowTopk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    T.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        portableRound(col("o_totalprice"), 2).as("total"), col("rn"))
  }

  /** A1+A2 jointly: rollup counts; reference single-pass status+type
    * counters `task_manager.py:348-376`. */
  def q16RollupCounts(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"))

  /** M1: column patch by key (conditional update as projection);
    * reference `patch_dp.py:110-176`. */
  def q17PatchUpdate(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 1000 === 7, lit("PATCHED"))
        .otherwise(col("o_orderpriority")).as("o_orderpriority"),
      when(col("o_orderkey") % 1000 === 7, 1L).otherwise(0L).as("patched"))

  /** M3: row delete as filtered rewrite; reference
    * `add_dp_to_review.py:130-151`. */
  def q18DeleteRows(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .filter(!(col("l_orderkey") % 100 === 0))
      .agg(count(lit(1)).as("n_remaining"),
        exactSumRound(col("l_quantity"), 2).as("sum_qty"))

  /** M2/S3: row insert as union + aggregate check;
    * reference `create_dp.py:149-214`. */
  def q19InsertRow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val extra = Seq((99999999L, 123.45)).toDF("o_orderkey", "o_totalprice")
    T.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      .unionByName(extra)
      .agg(count(lit(1)).as("n"),
        max(col("o_orderkey")).as("max_key"),
        portableRound(min(col("o_totalprice")), 2).as("min_price"))
  }

  /** M9/M10: deterministic id generation + prefix strip;
    * reference `task_manager.py:158`, `create_verified_csv.py:37-41`. */
  def q20IdGenStrip(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_type")).distinct()
      .select(
        col("event_type"),
        concat(col("event_type"), lit("_"), substring(md5(col("event_type")), 1, 8)).as("task_id"),
        regexp_replace(concat(lit("validate_"), col("event_type")), "^validate_", "").as("stripped"))

  /** F7: text-cleaning transform chain; reference canary/boilerplate
    * stripping `init_seed_tasks.py:28-88`. */
  def q21TextClean(s: SparkSession, d: String): DataFrame = {
    import graft.functions.PortableFuncs.normText
    graft.scale.Layout.widen(T.documents(s, d)).select(
      col("doc_id"),
      md5(normText(col("text"))).as("clean_fp"),
      length(normText(col("text"))).as("clean_len"))
  }

  /** P6 analog: gap-based sessionization via window lag + running sum
    * (batch shape of the streaming state machine). */
  def q22Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    T.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
  }

  /** Streaming-analogue tumbling-window aggregation (batch form);
    * Structured Streaming variant in `graft.streaming`. */
  def q23TimeWindow(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), exactSumRound(col("value"), 2).as("sum_value"))

  /** C9 analog: regex field extraction + grouped tally over semi-
    * structured text (the pytest-output-parse shape, A6). */
  def q39RegexExtract(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).as("kstr"))
      .groupBy(col("event_type"))
      .agg(
        count(when(col("kstr") =!= "", 1)).as("n_matched"),
        min(when(col("kstr") =!= "", length(col("kstr")))).as("min_digits"),
        max(when(col("kstr") =!= "", length(col("kstr")))).as("max_digits"))

  /** C6/C8: timestamp formatting variants (ISO date, compact stamp,
    * year-month, day-of-week-independent fields). */
  def q40DateFormats(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .filter(col("o_orderkey") % 997 === 0)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_date"),
        date_format(col("o_orderdate"), "yyyyMMdd_HHmmss").as("stamp"),
        date_format(col("o_orderdate"), "yyyy-MM").as("year_month"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"))

  /** C10/C11: substring search + cut + containment + truncation over
    * free text (the init_seed_tasks cleanup shape). */
  def q41StringFuncs(s: SparkSession, d: String): DataFrame = {
    val firstThe = instr(col("text"), "the")
    graft.scale.Layout.widen(T.documents(s, d)).select(
      col("doc_id"),
      firstThe.as("the_pos"),
      when(firstThe > 0,
        substring(substring(col("text"), firstThe, lit(2147483647)), lit(1), lit(40)))
        .otherwise(lit("")).as("cut40"),
      col("text").contains("data").cast("int").as("has_data"),
      substring(col("text"), 1, 25).as("head25"),
      (length(col("text")) > 100).cast("int").as("is_long"))
  }

  /** Beyond rollup: full cube over two dims (A1+A2 in every grouping
    * combination). */
  def q42CubeCounts(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"))

  /** Exact per-group discrete percentiles (p50/p90/p99) via the
    * cumulative-distribution reformulation: count DISTINCT values,
    * running-sum the counts in value order, and pick per quantile the
    * smallest value whose cumulative count reaches the integer
    * threshold `ceil(p·n/100) = (p·n + 99) div 100`.
    *
    * Boundary equivalence with `percentile_disc` (the spec proves it
    * value-for-value across boundary-straddling group sizes): the SQL
    * standard defines percentile_disc(q) as the smallest value with
    * cum_dist ≥ q; for q = p/100 that is `100·cum ≥ p·n` — pure
    * integers, no floating-point products anywhere. (The IEEE
    * `cum/n ≥ q` comparison engines evaluate internally agrees with
    * the rational comparison for every n < 10¹³ when q is a 2-decimal
    * fraction: the two sides only get within 1/(100n) of each other
    * at genuine boundaries, far above double rounding error.)
    *
    * Scale shape vs the percentile_disc aggregate: the shuffle moves
    * one (group, value, partial count) row per DISTINCT value (map-
    * side combine), not raw rows, and the per-group cumulative sum is
    * a spillable window sort — percentile_disc instead buffers every
    * group value in one final aggregation hash map. One group's
    * distinct values DO sort in a single task here; when that becomes
    * the bottleneck (billions of distinct values per group), switch
    * to [[cumDistPercentilesDistributed]] — identical results, fully
    * parallel sort, two extra scheduler round-trips (which is why it
    * is not the default: at bench scale those round-trips cost more
    * than the 3-partition sort they parallelize; measured 2.15 s vs
    * 1.74 s at sf0.1). The sketch sibling (`Sketches.quantileProfile`)
    * stays the no-sort 100 TB path when approximation is acceptable.
    * Requires a non-null value column and ENFORCES it with a lazy
    * raise_error guard (same discipline as labelPropagationWeighted's
    * weight check): the q48 oracle's COUNT(*) counts every row while
    * a silent isNotNull filter here would count only non-null ones —
    * a single null would flip the certified hash without any error.
    * Failing loudly turns that silent divergence into a diagnosis. */
  /** The quantile pick shared by BOTH cumdist forms: smallest value
    * whose cumulative count (`cum`) reaches the exact integer
    * threshold ceil(p·n/100). One definition — a threshold tweak
    * cannot silently break the forms' spec-proven equivalence. */
  private[graft] def pickPercentile(v: String, p: Int): Column =
    min(when(col("cum") >= expr(s"(n * $p + 99) div 100"), col(v))).as(s"p$p")

  /** Null guard shared by both cumdist forms: a null value would sort
    * first and shift every threshold AND diverge from the oracle's
    * COUNT(*), so fail loudly instead of silently filtering. CaseWhen
    * evaluates lazily (the error fires only on a genuinely-null row)
    * and no Filter references the column, so Catalyst cannot push the
    * side effect into an upstream join (NOTES gotcha 0). */
  private def checkedValue(v: String): Column =
    when(col(v).isNotNull, col(v)).otherwise(raise_error(lit(
      s"cumDistPercentiles: null value in '$v' — percentile thresholds over " +
        "nulls are undefined; filter or coalesce upstream")))

  def cumDistPercentiles(df: DataFrame, grp: String, v: String): DataFrame = {
    val counts = df.select(col(grp), checkedValue(v).as(v))
      .groupBy(col(grp), col(v)).agg(count(lit(1)).as("c"))
    val byVal = Window.partitionBy(col(grp)).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(grp))
    counts
      .withColumn("cum", sum(col("c")).over(byVal))
      .withColumn("n", sum(col("c")).over(whole))
      .groupBy(col(grp))
      .agg(pickPercentile(v, 50), pickPercentile(v, 90),
        pickPercentile(v, 99), max(col("n")).as("n"))
  }

  /** The fully-distributed form of [[cumDistPercentiles]]: the same
    * DISTRIBUTED two-phase prefix sum as `Curation.sequencePack` —
    * range-partition the distinct (group, value) counts, collect the
    * tiny per-(partition, group) totals (at most partitions × groups
    * rows), broadcast them back as offsets, window WITHIN partitions.
    * No group ever sorts in a single task, so exact per-group
    * percentiles survive groups with billions of distinct values; the
    * price is two extra scheduler round-trips (checkpoint + collect),
    * which is why the single-sort sibling is the default at bench
    * scale. Spec-proven value-identical to percentile_disc alongside
    * the default form. */
  def cumDistPercentilesDistributed(df: DataFrame, grp: String, v: String,
                                    partitions: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val spark = df.sparkSession
    val counts = df.select(col(grp), checkedValue(v).as(v))
      .groupBy(col(grp), col(v)).agg(count(lit(1)).as("c"))
      .repartitionByRange(partitions, col(grp), col(v))
      .withColumn("pid", spark_partition_id())
      .coreCheckpoint() // pid must not be recomputed under another plan
    // phase 1: per-(partition, group) totals — at most partitions ×
    // groups rows, driver-safe by construction
    val totals = counts.groupBy(col("pid"), col(grp))
      .agg(sum(col("c")).as("t"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    // per group: running offset across partitions in pid order (range
    // partitioning makes pid order = value order), plus the group n
    val offsetRows = totals.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_._1)
      val n = sorted.map(_._3).sum
      var acc = 0L
      sorted.map { case (pid, _, t) =>
        val off = acc; acc += t; Row(pid, g, off, n)
      }
    }
    val offSchema = StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      counts.schema(grp).copy(name = grp),
      StructField("offset", LongType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offSchema)
    // phase 2: local window cumsum + broadcast offset = global cumsum
    val byVal = Window.partitionBy(col("pid"), col(grp)).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.join(broadcast(offDf), Seq("pid", grp))
      .withColumn("cum", sum(col("c")).over(byVal) + col("offset"))
      .groupBy(col(grp))
      .agg(pickPercentile(v, 50), pickPercentile(v, 90),
        pickPercentile(v, 99), max(col("n")).as("n"))
  }

  /** Exact per-group percentiles — discrete (an actual data value, no
    * interpolation arithmetic), so the result is bitwise
    * engine-independent; computed by [[cumDistPercentiles]], stated by
    * the oracle as ANSI `percentile_disc WITHIN GROUP`. */
  def q48Percentiles(s: SparkSession, d: String): DataFrame =
    // widen: the distinct-value counting runs during PARTIAL
    // aggregation — a single-row-group scan would serialize it
    graft.scale.Layout.widen(
      T.lineitem(s, d).select("l_returnflag", "l_extendedprice"))
      .transform(cumDistPercentiles(_, "l_returnflag", "l_extendedprice"))

  /** Pivot: event counts per user-bucket × event-type — wide-format
    * reshaping with an explicit value list (required at scale: an
    * unlisted pivot needs an extra distinct pass over the data). */
  def q49Pivot(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy((col("user_id") % 10).as("bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)

  /** Window-function battery: lag/lead, running sum, rank — per-user
    * event history navigation. The running sum is an explicit ROWS
    * frame ordered by (ts, event_id): a unique total order makes the
    * double-precision accumulation deterministic cross-engine. */
  def q52WindowFuncs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.events(s, d)
      .filter(col("user_id") < 20)
      .select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        sum(col("value")).over(wRows).as("running_sum"),
        row_number().over(w).as("rn"))
  }

  /** Set operations: EXCEPT finds customers with no orders, INTERSECT
    * the ones with orders — both distinct-set semantics, tagged and
    * unioned into one relation. */
  def q53SetOps(s: SparkSession, d: String): DataFrame = {
    val custKeys = T.customer(s, d).select(col("c_custkey").as("key"))
    val orderCust = T.orders(s, d).select(col("o_custkey").as("key"))
    custKeys.except(orderCust).withColumn("tag", lit("no_orders"))
      .unionByName(
        custKeys.intersect(orderCust).withColumn("tag", lit("has_orders")))
  }

  /** Unpivot/melt: wide numeric part attributes to long (key, attr,
    * val) format — the reshaping feature-extraction pipelines use
    * before per-feature aggregation. */
  def q54Unpivot(s: SparkSession, d: String): DataFrame =
    T.part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("p_size"), col("p_retailprice")),
        "attr", "val")

  /** Prefix-blocked fuzzy join: document text heads within edit
    * distance 10, candidates blocked on a shared 6-char prefix — the
    * blocked shape a 100 TB fuzzy dedup uses (never all-pairs
    * levenshtein; the block key is the equality shuffle). */
  def q55FuzzyPairs(s: SparkSession, d: String): DataFrame = {
    val heads = graft.scale.Layout.widen(T.documents(s, d))
      .select(col("doc_id"), substring(col("text"), 1, 30).as("head"),
        substring(col("text"), 1, 6).as("blk"))
    val a = heads.as("a"); val b = heads.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.head"), col("b.head")).as("dist"))
      .filter(col("dist") <= 10)
  }

  /** JSON path extraction (`get_json_object`) out of the events props
    * cell, folded into a per-type profile — the JSON-column shape of
    * the reference's weight-map cells (C1), via path extraction
    * instead of full-schema parsing. */
  def q56JsonExtract(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Time-spine densification: sparse per-hour aggregates joined onto
    * the COMPLETE hourly spine × event-type grid, empty cells
    * zero-filled — the gap-filling step every dashboard/training
    * time-series needs. Scale shape: aggregate FIRST (the fact table
    * never meets the spine), then left-join the tiny generated spine —
    * spine size is time-range/granularity, independent of data volume. */
  def q62TimeSpine(s: SparkSession, d: String): DataFrame = {
    val e = T.events(s, d)
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
    val hourly = e.groupBy(col("h"), col("event_type")).agg(count(lit(1)).as("cnt"))
    val bounds = e.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
    val spine = bounds.select(
      explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("h"))
    val types = e.select(col("event_type")).distinct()
    spine.crossJoin(types)
      .join(hourly, Seq("h", "event_type"), "left")
      .select(col("h").as("hour_start"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("n"))
  }

  /** Statistical profile per group from EXACT decimal moments: mean,
    * variance, std computed from Σx and Σx² accumulated as decimals —
    * double sums differ across partition orders, but decimal sums are
    * exact and associative, and the final mean/var/std arithmetic is a
    * fixed IEEE expression tree (sqrt is correctly rounded per IEEE
    * 754, unlike ln/exp which drift by libm). Built-in var_samp would
    * NOT hash-match cross-engine. */
  def q63ProfileStats(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity")
    graft.scale.Layout.widen(T.lineitem(s, d))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        exactSum(x).as("sx"),
        exactSum(x * x).as("sxx"))
      .select(col("l_returnflag"), col("n"),
        (col("sx") / col("n")).as("mean"), {
          // sample variance of a single row is undefined → NULL, the
          // value DuckDB's double/0 already yields (ANSI Spark would
          // throw instead — fuzz tiny profile, groups of n = 1)
          val varE = when(col("n") > 1,
            (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          varE.as("var")
        },
        sqrt(when(col("n") > 1,
          (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)))
          .as("std"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_profile_stats" -> q63ProfileStats,
    "q48_percentiles" -> q48Percentiles,
    "q49_pivot" -> q49Pivot,
    "q56_json_extract" -> q56JsonExtract,
    "q62_time_spine" -> q62TimeSpine,
    "q52_window_funcs" -> q52WindowFuncs,
    "q53_set_ops" -> q53SetOps,
    "q54_unpivot" -> q54Unpivot,
    "q55_fuzzy_pairs" -> q55FuzzyPairs,
    "q39_regex_extract" -> q39RegexExtract,
    "q40_date_formats" -> q40DateFormats,
    "q41_string_funcs" -> q41StringFuncs,
    "q42_cube_counts" -> q42CubeCounts,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_filter_project" -> q02FilterProject,
    "q03_point_lookup" -> q03PointLookup,
    "q04_dup_check" -> q04DupCheck,
    "q05_broadcast_join" -> q05BroadcastJoin,
    "q06_semi_join" -> q06SemiJoin,
    "q07_anti_join" -> q07AntiJoin,
    "q08_hierarchy_join" -> q08HierarchyJoin,
    "q09_status_counts" -> q09StatusCounts,
    "q10_completion_rate" -> q10CompletionRate,
    "q11_error_grouping" -> q11ErrorGrouping,
    "q12_stale_sweep" -> q12StaleSweep,
    "q13_json_map" -> q13JsonMap,
    "q14_union_normalize" -> q14UnionNormalize,
    "q15_window_topk" -> q15WindowTopk,
    "q16_rollup_counts" -> q16RollupCounts,
    "q17_patch_update" -> q17PatchUpdate,
    "q18_delete_rows" -> q18DeleteRows,
    "q19_insert_row" -> q19InsertRow,
    "q20_idgen_strip" -> q20IdGenStrip,
    "q21_text_clean" -> q21TextClean,
    "q22_sessionize" -> q22Sessionize,
    "q23_time_window" -> q23TimeWindow
  )

  override val oracle: Map[String, String] = Map(
    "q63_profile_stats" ->
      s"""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
         |  ${exactSumSql("l_quantity")} AS sx,
         |  ${exactSumSql("l_quantity*l_quantity")} AS sxx
         |FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  sx / n AS mean,
         |  (sxx - sx * sx / n) / (n - 1) AS var,
         |  sqrt((sxx - sx * sx / n) / (n - 1)) AS std
         |FROM m""".stripMargin,
    "q62_time_spine" ->
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |    event_type FROM events),
        |hourly AS (SELECT h, event_type, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
        |b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM e),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b),
        |types AS (SELECT DISTINCT event_type FROM e)
        |SELECT s.h AS hour_start, t.event_type,
        |  CAST(COALESCE(cnt, 0) AS BIGINT) AS n
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN hourly ON hourly.h = s.h AND hourly.event_type = t.event_type""".stripMargin,
    "q56_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q52_window_funcs" ->
      """SELECT event_id, user_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  SUM(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_sum,
        |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)""".stripMargin,
    "q53_set_ops" ->
      """SELECT key, 'no_orders' AS tag FROM
        |  (SELECT c_custkey AS key FROM customer
        |   EXCEPT SELECT o_custkey AS key FROM orders)
        |UNION ALL
        |SELECT key, 'has_orders' AS tag FROM
        |  (SELECT c_custkey AS key FROM customer
        |   INTERSECT SELECT o_custkey AS key FROM orders)""".stripMargin,
    "q54_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part""".stripMargin,
    "q55_fuzzy_pairs" ->
      """WITH h AS (SELECT doc_id, substr(text, 1, 30) AS head,
        |    substr(text, 1, 6) AS blk FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.head, b.head) AS INTEGER) AS dist
        |FROM h a JOIN h b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 10""".stripMargin,
    "q48_percentiles" ->
      """SELECT l_returnflag,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90,
        |  percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q49_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1""".stripMargin,
    "q39_regex_extract" ->
      """SELECT event_type,
        |  COUNT(CASE WHEN kstr <> '' THEN 1 END) AS n_matched,
        |  CAST(MIN(CASE WHEN kstr <> '' THEN length(kstr) END) AS INTEGER) AS min_digits,
        |  CAST(MAX(CASE WHEN kstr <> '' THEN length(kstr) END) AS INTEGER) AS max_digits
        |FROM (SELECT event_type,
        |        COALESCE(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS kstr
        |      FROM events)
        |GROUP BY event_type""".stripMargin,
    "q40_date_formats" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
        |  strftime(o_orderdate, '%Y%m%d_%H%M%S') AS stamp,
        |  strftime(o_orderdate, '%Y-%m') AS year_month,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom
        |FROM orders WHERE o_orderkey % 997 = 0""".stripMargin,
    "q41_string_funcs" ->
      """SELECT doc_id,
        |  CAST(instr(text, 'the') AS INTEGER) AS the_pos,
        |  CASE WHEN instr(text, 'the') > 0
        |       THEN substr(substr(text, instr(text, 'the')), 1, 40)
        |       ELSE '' END AS cut40,
        |  CAST(CASE WHEN contains(text, 'data') THEN 1 ELSE 0 END AS INTEGER) AS has_data,
        |  substr(text, 1, 25) AS head25,
        |  CAST(CASE WHEN length(text) > 100 THEN 1 ELSE 0 END AS INTEGER) AS is_long
        |FROM documents""".stripMargin,
    "q42_cube_counts" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${exactSumRoundSql("l_quantity", 2)} AS sum_qty,
         |  ${exactSumRoundSql("l_extendedprice", 2)} AS sum_base_price,
         |  ${exactSumRoundSql("l_extendedprice*(1.0-l_discount)", 2)} AS sum_disc_price,
         |  ${portableRoundSql(exactSumSql("l_quantity") + "/COUNT(*)", 4)} AS avg_qty,
         |  ${portableRoundSql(exactSumSql("l_discount") + "/COUNT(*)", 4)} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-06-30 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  l_extendedprice*(1.0-l_discount) AS net_price,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05""".stripMargin,
    "q03_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  FLOOR((o_totalprice) * 100.0 + 0.5) / 100.0 AS total,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
        |FROM orders WHERE o_orderkey = 42""".stripMargin,
    "q04_dup_check" ->
      """SELECT n_rows, n_keys, n_rows - n_keys AS n_dups FROM (
        |  SELECT COUNT(*) AS n_rows,
        |         COUNT(DISTINCT l_orderkey*8 + l_linenumber) AS n_keys
        |  FROM lineitem)""".stripMargin,
    "q05_broadcast_join" ->
      s"""SELECT p_brand, ${exactSumRoundSql("l_extendedprice", 2)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q08_hierarchy_join" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
         |  ${exactSumRoundSql("c_acctbal", 2)} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,
    "q09_status_counts" ->
      "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    "q10_completion_rate" ->
      """SELECT event_type, completed, total,
        |  FLOOR((CAST(completed AS DOUBLE)/total) * 10000.0 + 0.5) / 10000.0 AS rate,
        |  CAST(completed AS VARCHAR) || '/' || CAST(total AS VARCHAR) AS display
        |FROM (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS completed,
        |    COUNT(*) AS total
        |  FROM events GROUP BY event_type)""".stripMargin,
    "q11_error_grouping" ->
      """SELECT user_id, COUNT(*) AS n_errors,
        |  array_to_string(list_sort(list(event_id))[1:5], ',') AS first5
        |FROM events WHERE event_type = 'error' GROUP BY user_id""".stripMargin,
    "q12_stale_sweep" ->
      """SELECT event_id, event_type,
        |  CASE WHEN event_type IN ('signup','view')
        |         AND ts < TIMESTAMP '2024-01-03 00:00:00'
        |       THEN 'expired' ELSE 'active' END AS lock_state
        |FROM events""".stripMargin,
    "q13_json_map" ->
      """SELECT event_type,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k,
        |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,
    "q14_union_normalize" ->
      s"""SELECT src, COUNT(*) AS n, ${exactSumRoundSql("amount", 2)} AS total,
         |  CAST(SUM(CASE WHEN extra IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
         |FROM (
         |  SELECT o_orderkey AS id, 'order' AS src, o_totalprice AS amount,
         |         o_orderpriority AS extra FROM orders
         |  UNION ALL
         |  SELECT l_orderkey, 'line', l_extendedprice, NULL FROM lineitem)
         |GROUP BY src""".stripMargin,
    "q15_window_topk" ->
      """SELECT o_custkey, o_orderkey, FLOOR((o_totalprice) * 100.0 + 0.5) / 100.0 AS total, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q16_rollup_counts" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority, COUNT(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,
    "q17_patch_update" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 1000 = 7 THEN 'PATCHED'
        |       ELSE o_orderpriority END AS o_orderpriority,
        |  CAST(CASE WHEN o_orderkey % 1000 = 7 THEN 1 ELSE 0 END AS BIGINT) AS patched
        |FROM orders""".stripMargin,
    "q18_delete_rows" ->
      s"""SELECT COUNT(*) AS n_remaining, ${exactSumRoundSql("l_quantity", 2)} AS sum_qty
         |FROM lineitem WHERE NOT (l_orderkey % 100 = 0)""".stripMargin,
    "q19_insert_row" ->
      """SELECT COUNT(*) AS n, CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
        |  FLOOR((MIN(o_totalprice)) * 100.0 + 0.5) / 100.0 AS min_price
        |FROM (SELECT o_orderkey, o_totalprice FROM orders
        |      UNION ALL SELECT 99999999, 123.45)""".stripMargin,
    "q20_idgen_strip" ->
      """SELECT event_type,
        |  event_type || '_' || substr(md5(event_type),1,8) AS task_id,
        |  regexp_replace('validate_' || event_type, '^validate_', '') AS stripped
        |FROM (SELECT DISTINCT event_type FROM events)""".stripMargin,
    "q21_text_clean" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS clean_fp,
        |  CAST(length(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS INTEGER) AS clean_len
        |FROM documents""".stripMargin,
    "q22_sessionize" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(new_sess) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |    FROM events))
        |GROUP BY user_id""".stripMargin,
    "q23_time_window" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         |  event_type, COUNT(*) AS n, ${exactSumRoundSql("value", 2)} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin
  )
}
