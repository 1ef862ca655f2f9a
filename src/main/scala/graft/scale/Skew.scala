package graft.scale

import graft.{QueryModule, Tables => T}
import graft.Materialize.CoreOps
import graft.functions.PortableFuncs.{exactSumRound, exactSumRoundSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (north star; no reference
  * counterpart — the reference joins Python dicts).
  *
  * A shuffled equi-join sends every row of one key to one reducer; a
  * hot key (the classic 100 TB failure mode: one user / one null-ish
  * default id holding 1% of the table) turns that reducer into the
  * whole job's straggler. [[saltedJoin]] splits each hot key's rows
  * across `salts` reducers by appending a routing salt to the join key
  * on the big side and replicating the small side once per salt —
  * shuffle volume grows by ×salts on the SMALL side only, and the big
  * side's hot key now parallelizes ~salts-wide. AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin`) does this adaptively for
  * sort-merge joins; the explicit operator covers the cases AQE can't
  * see (pre-aggregated exchanges, deterministic plans, non-SMJ shapes)
  * and makes the technique a testable first-class verb.
  */
object Skew extends QueryModule {

  /** Equi-join `left` (large, possibly skewed) to `right` (smaller) on
    * `leftKey === rightKey`, routing each left row to one of `salts`
    * sub-partitions per key and replicating right rows to all of them.
    * Produces exactly the rows of the unsalted join (salt only routes;
    * it never changes the match set). Inner or left-outer.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    // right rows are replicated once per salt, so a right/full outer
    // would emit `salts` copies of each unmatched right row — wrong
    // results with no error. Fail loudly instead. Semi/anti are safe:
    // they emit each left row at most once regardless of how many
    // replicated right rows match, so replication cannot duplicate
    // (semi) or wrongly drop (anti — a left row with no real match has
    // no match under any salt either) output rows.
    require(Set("inner", "left", "left_outer", "leftouter",
                "left_semi", "leftsemi", "semi",
                "left_anti", "leftanti", "anti")
              .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-outer/semi/anti only (got " +
        s"'$joinType'): the replicated right side would duplicate " +
        "unmatched right rows under right/full outer")
    // the salt is routing-only, so any per-row value works; a hash of
    // the row id spreads a hot key's rows evenly without needing a
    // second column from the caller
    val l = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }

  /** All within-key unordered pairs of a row set in which `id` is
    * unique per key — the self-join at the heart of every
    * bucket-blocked candidate generator (MinHash band join, SimHash
    * chunk join, LSH cell join) — with per-task pair emission BOUNDED
    * on hot keys. Output is EXACTLY the plain self-join's
    * (`a.key = b.key AND a.id < b.id`): the split changes join
    * ROUTING only, never the match set, so every downstream oracle
    * states the plain join.
    *
    * Why: a bucket shared by d rows emits d·(d−1)/2 pairs, and a
    * plain shuffled self-join funnels ALL of them into the one task
    * that owns the key — at 100 TB the templated-page family (or a
    * low-entropy signature chunk) is exactly that key, and the task
    * OOMs or straggles the job. That total volume is inherent to the
    * operator's contract (those pairs ARE the answer); what is not
    * inherent is computing them in one task.
    *
    * The split, in three steps — the key observation (which retired
    * the round-14 Misra-Gries nomination stage) is that ONLY hot keys
    * ever need their df on the rows, and hot keys number ≤ n/hotDf by
    * definition:
    *  1. exact per-key sizes from one map-side-combining aggregate
    *     over the materialized input (a hot key collapses to one row
    *     per task before the exchange); callers that already hold
    *     this table pass it via `counts` and the pass is skipped;
    *  2. ONE plan constant read off that aggregate: the hot keys are
    *     filtered out of the counts, and the SAME action that
    *     materializes them returns their count. Zero hot keys ⇒ the
    *     plain self-join IS the bounded plan — return it with no
    *     routing machinery at all (the common case: a healthy corpus
    *     has no hot bucket, and it pays only the counts pass as
    *     insurance). Otherwise the ≤ n/hotDf hot keys broadcast
    *     (hash-join attach when they exceed [[HotKeyBroadcastLimit]]
    *     — still a small-table shuffle): plain rows are the broadcast
    *     anti-join (no df needed — "not hot" suffices), hot rows
    *     learn their exact df map-side;
    *  3. routing by exact df: keys with df ≤ hotDf self-join plainly
    *     (per-key emission ≤ hotDf²/2); hotter keys take a GRID
    *     self-join — rows are hashed into g = ⌈df/hotDf⌉ groups, the
    *     g·(g+1)/2 group-pair regions become extra join-key columns,
    *     and each region's task emits ≈ hotDf² pairs regardless of d.
    *
    * Exactly-once (grid path): a row in group i replicates to regions
    * (i, j) for j ≥ i as LEFT and (i', i) for i' ≤ i as RIGHT. An
    * unordered pair {x, y} with groups gx ≤ gy meets in region
    * (gx, gy) alone — as (x LEFT, y RIGHT) when gx < gy (y's LEFT
    * regions start at gy > gx, x's RIGHT regions end at gx < gy, so
    * the mirrored match cannot exist), and when gx = gy both
    * orderings land in the diagonal region where `id_l < id_r` keeps
    * one. Row replication on the grid path is g+1 ≈ df/hotDf copies —
    * proportional to output/hotDf, i.e. strictly dominated by the
    * pair volume the contract already owes.
    *
    * `payload` columns ride along and come back suffixed `_a`/`_b`
    * in `id`-order (the SimHash consumer carries the signature so
    * distance is a projection, not another join).
    *
    * `counts`: an optional precomputed per-key size table (schema:
    * the key columns + `__df` long, one row per distinct key —
    * exactly `rows.groupBy(keys).count`). Callers that aggregate the
    * same table anyway (the q172 occupancy rollup) pass it, already
    * materialized, and the operator's own counts pass disappears.
    * `inputMaterialized`: the caller promises `rows0` is already a
    * cheap re-scan (a checkpoint or a trivial projection of one), so
    * the operator skips its own input checkpoint. `materialize=false`
    * is for plan audits only: no jobs run (so the routing cannot read
    * its plan constants — both branches stay in one inspectable
    * plan) and nothing is checkpointed. */
  def boundedSelfPairs(rows0: DataFrame, keys: Seq[String], id: String,
                       payload: Seq[String] = Nil, hotDf: Long = 64L,
                       counts: Option[DataFrame] = None,
                       materialize: Boolean = true,
                       inputMaterialized: Boolean = false): DataFrame = {
    require(keys.nonEmpty && hotDf >= 1L, "need key columns and hotDf >= 1")
    val kc = keys.map(col)
    // materialize ONCE: the counts pass and each side of the plain and
    // grid joins all read `rows` — without the barrier every one of
    // them re-executes the caller's upstream (for simhashPairs that is
    // the full corpus signature kernel: measured 4× the operator's
    // whole cost at sf0.1)
    val proj = rows0.select(
      (kc :+ col(id).as("__id")) ++ payload.map(col): _*)
    val rows =
      if (materialize && !inputMaterialized) proj.coreCheckpoint() else proj
    val cnts = counts.getOrElse(
      rows.groupBy(kc: _*).agg(count(lit(1)).as("__df")))
    def pairOut(l: DataFrame, r: DataFrame, joinKeys: Seq[String],
                keep: Column): DataFrame = {
      val aFirst = col("__id_l") < col("__id_r")
      l.join(r, joinKeys).filter(keep).select(
        (Seq(when(aFirst, col("__id_l")).otherwise(col("__id_r")).as("doc_a"),
          when(aFirst, col("__id_r")).otherwise(col("__id_l")).as("doc_b")) ++
          payload.map(p => when(aFirst, col(s"${p}_l"))
            .otherwise(col(s"${p}_r")).as(s"${p}_a")) ++
          payload.map(p => when(aFirst, col(s"${p}_r"))
            .otherwise(col(s"${p}_l")).as(s"${p}_b"))): _*)
    }
    def side(df: DataFrame, suffix: String, extra: Seq[Column]): DataFrame =
      df.select((kc ++ extra :+ col("__id").as(s"__id$suffix")) ++
        payload.map(p => col(p).as(s"$p$suffix")): _*)
    // light path: every key ≤ hotDf rows — the plain join, bounded
    def plainPairs(df: DataFrame): DataFrame =
      pairOut(side(df, "_l", Nil), side(df, "_r", Nil),
        keys, keep = col("__id_l") < col("__id_r"))
    // grid path: g = ceil(df/hotDf) groups; the g·(g+1)/2 group-pair
    // regions become join-key columns, spreading the key across tasks.
    // Off-diagonal regions hold each pair exactly once (keep all);
    // diagonal regions hold both orderings (keep the id-ordered one).
    def gridPairs(hotRows: DataFrame): DataFrame = {
      val (lhs, rhs) = gridSides(hotRows, keys, payload, hotDf)
      pairOut(lhs, rhs, keys ++ Seq("__ri", "__rj"),
        keep = col("__ri") =!= col("__rj") || col("__id_l") < col("__id_r"))
    }
    def routed(hotKeys: DataFrame, bcast: Boolean): DataFrame = {
      val hk = if (bcast) broadcast(hotKeys) else hotKeys
      // plain rows never need their df: "no hot key matches" is the
      // whole routing predicate, one broadcast anti-join
      val plainRows = rows.join(hk.select(kc: _*), keys, "left_anti")
      val hotRows = rows.join(hk, keys)
      plainPairs(plainRows).unionByName(gridPairs(hotRows))
    }
    if (!materialize) routed(cnts.filter(col("__df") > hotDf), bcast = true)
    else {
      // ONE action computes the counts, keeps only the ≤ n/hotDf hot
      // keys, materializes them AND reads their count: a long
      // accumulator fires inside the checkpoint action's own pass, so
      // the routing read costs zero extra jobs. The round-15 flow
      // paid a checkpoint job AND a count job here — per consumer,
      // that extra job was the q28 sequential floor. (A first cut
      // rode an RDD-level persist + rdd.count() instead; measured, the
      // per-call Dataset→RDD bridge degraded the whole PROCESS
      // progressively — a 178-query sequential board saw late heavy
      // queries inflate 4-6×, flat again the moment the bridge was
      // removed. The accumulator keeps the one-action economy inside
      // the Dataset layer.) Accumulator caveat, acceptable here: a
      // retried/recomputed task double-counts — zero-detection stays
      // exact (a no-row task adds nothing), and an overcount can only
      // flip the broadcast/shuffle attach choice, both of which are
      // correct routes. An AQE-style read either way: the result set
      // is identical on every route, only the plan adapts. Callers
      // passing `counts` promise a cheap re-scan, so their count() is
      // one small job unpersisted.
      val hotKeys0 = cnts.filter(col("__df") > hotDf)
      val (hotKeys, nHot) =
        if (counts.isDefined) (hotKeys0, hotKeys0.count())
        else {
          val acc = rows0.sparkSession.sparkContext.longAccumulator
          val hk = hotKeys0.mapPartitions { it =>
            it.map { r => acc.add(1L); r }
          }(org.apache.spark.sql.Encoders.row(hotKeys0.schema))
            .toDF().coreCheckpoint() // eager: populates the accumulator
          (hk, acc.value.longValue)
        }
      if (nHot == 0L) plainPairs(rows) // no hot key: the plain join
      else routed(hotKeys, bcast = nHot <= HotKeyBroadcastLimit)
    }
  }

  /** Hot keys above this count attach by shuffle hash-join instead of
    * broadcast: 2²⁰ (key cols + a long) rows is tens of MB — past the
    * point where shipping the table to every executor beats one
    * small-table shuffle. Reached only when > 2²⁰ distinct keys each
    * exceed hotDf rows, i.e. an input of ≥ 64M rows that is MOSTLY
    * hot families. */
  val HotKeyBroadcastLimit: Long = 1L << 20

  /** The grid path's two join sides, from df-annotated hot rows
    * (columns: keys, `__id`, payload, `__df`) — the region-routing
    * construction [[boundedSelfPairs]] joins on `keys ++ (__ri, __rj)`.
    * Package-private so [[SkewBoundedPairsSpec]] can audit the ACTUAL
    * per-region emission bound (|lhs ∩ region| × |rhs ∩ region| ≈
    * hotDf², and the regions partition the key's pair volume) rather
    * than a reconstruction of the routing arithmetic. */
  private[scale] def gridSides(hotRows: DataFrame, keys: Seq[String],
      payload: Seq[String], hotDf: Long): (DataFrame, DataFrame) = {
    val kc = keys.map(col)
    def side(df: DataFrame, suffix: String, extra: Seq[Column]): DataFrame =
      df.select((kc ++ extra :+ col("__id").as(s"__id$suffix")) ++
        payload.map(p => col(p).as(s"$p$suffix")): _*)
    val g = ceil(col("__df") / lit(hotDf.toDouble)).cast("long")
    val hot = hotRows
      .withColumn("__g", pmod(xxhash64(col("__id")), g))
      .withColumn("__gmax", g - 1L)
      .drop("__df")
    val lhs = side(hot, "_l", Seq(col("__g").as("__ri"), col("__gmax")))
      .withColumn("__rj", explode(sequence(col("__ri"), col("__gmax"))))
      .drop("__gmax", "__g")
    val rhs = side(hot, "_r", Seq(col("__g").as("__rj")))
      .withColumn("__ri", explode(sequence(lit(0L), col("__rj"))))
      .drop("__g")
    (lhs, rhs)
  }

  /** q44: revenue by order priority over the lineitem⋈orders join,
    * executed through the salted path (8-way). Result is identical to
    * the plain join — that identity IS the correctness property the
    * oracle checks. */
  def q44SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Layout.widen(T.lineitem(s, d))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = T.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    saltedJoin(li, ord, "l_orderkey", "o_orderkey", salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        exactSumRound(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** q107: the Morton keys [[Layout.zValue]] assigns to events on the
    * (user_id, time) plane, plus the coarse curve bucket — the key
    * column a `ZORDER BY (user_id, ts)` layout sorts and prunes on.
    * Scan-side bit arithmetic only; the write side is
    * [[Layout.writeZOrdered]] (spec-audited file pruning). */
  def q107ZorderKeys(s: SparkSession, d: String): DataFrame = {
    Layout.widen(T.events(s, d))
      .select(col("event_id"),
        Layout.zValue(col("user_id"),
          expr("unix_micros(ts) div 1000000")).as("z"))
      .withColumn("bucket", shiftrightunsigned(col("z"), 48))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_salted_join" -> q44SaltedJoin,
    // Morton layout keys for two-predicate pruning (user × time)
    "q107_zorder_keys" -> q107ZorderKeys
  )

  override val oracle: Map[String, String] = Map(
    // bit-interleave restated as a Σ over bit positions; SUM is exact
    // integer arithmetic, distinct positions never collide. Whole-Long
    // domain discipline (matches Spark for ANY timestamp, not just the
    // fixture range): (a) epoch_us // 1000000 is FLOOR division in
    // DuckDB but `div` is TRUNC in Spark — restate trunc explicitly so
    // pre-1970 micros agree; (b) the y-bit-31 term is 1<<63, which
    // overflows DuckDB BIGINT but wraps to Long.MinValue in Spark —
    // add top_bit * Long.MinValue outside the Σ (bounded to 2^63-1)
    // instead of shifting; (c) z >> 48 is ARITHMETIC in DuckDB
    // (sign-extends negative z) but shiftrightunsigned in Spark —
    // mask to the low 16 bits to restate the logical shift.
    "q107_zorder_keys" ->
      """WITH e AS (SELECT event_id, user_id & 4294967295 AS x,
        |  (CASE WHEN epoch_us(ts) >= 0 THEN epoch_us(ts) // 1000000
        |        ELSE -((-epoch_us(ts)) // 1000000) END)
        |    & 4294967295 AS y FROM events),
        |bits AS (SELECT event_id, x, y, unnest(range(0, 32)) AS b FROM e),
        |zt AS (SELECT event_id,
        |  CAST(SUM((((x >> b) & 1) << (2*b))
        |    + (CASE WHEN b < 31 THEN ((y >> b) & 1) << (2*b+1)
        |            ELSE 0 END)) AS BIGINT)
        |  + MAX((y >> 31) & 1) * (-9223372036854775807 - 1) AS z
        |  FROM bits GROUP BY event_id)
        |SELECT event_id, z, (z >> 48) & 65535 AS bucket FROM zt""".stripMargin,
    "q44_salted_join" ->
      s"""SELECT o_orderpriority,
         |  ${exactSumRoundSql("l_extendedprice*(1.0-l_discount)", 2)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1""".stripMargin
  )
}
