package graft.scale

import graft.{QueryModule, Tables => T}
import graft.functions.PortableFuncs.{exactSum, exactSumSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
        round(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
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
         |  ROUND(${exactSumSql("l_extendedprice*(1.0-l_discount)")}, 2) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1""".stripMargin
  )
}
