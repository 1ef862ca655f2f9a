package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** JVM-local memo of SHARED QUERY CORES — the batch-run sharing layer
  * behind the gate registry: several boards ride the same expensive
  * intermediate (the simhash pair graph feeds ten queries, its
  * connected components four, the q34 quality scan three), and a batch
  * run that rebuilds that core once per consumer pays the dominant
  * cost of the suite several times over. `memo` computes the core ONCE
  * per (SparkContext, name), materializes it under the [[Materialize]]
  * policy (localCheckpoint locally; a reliable checkpoint dir on a
  * cluster where a lost executor must not abort the batch) so every
  * consumer reads stored rows instead of re-running the lineage, and
  * hands the same DataFrame to all of them — per-query RESULTS are
  * byte-identical (same rows, same order semantics), only the
  * redundant recomputation is gone.
  *
  * Lifecycle contract: callers that sweep persistent RDDs between
  * queries (Verify's per-dump sweep, Bench's sequential pass) must use
  * [[sweepTransient]], which skips the blocks backing live cells — a
  * blanket `getPersistentRDDs.unpersist` would yank a cached core's
  * storage out from under its NEXT consumer (localCheckpoint truncates
  * lineage; the blocks are the only copy). Batch-boundary cleanup
  * ([[clear]] + a full sweep) resets everything: each measured bench
  * batch rebuilds each core exactly once, which is the honest cost of
  * a fresh suite run.
  *
  * Scale note: this is single-JVM, batch-scoped sharing — the local
  * analogue of a cluster's shared-scan / materialized-intermediate
  * service. Cores are chosen to be either sub-corpus-sized (pair
  * graphs, component labels) or one projected corpus pass (the
  * quality scan): the storage bill is the same one their cheapest
  * single consumer already paid per run.
  */
object Shared {

  /** FAIR-scheduler pool names core builds run under. In a concurrent
    * batch every query owns a pool, so N queries blocked on one core
    * would otherwise watch its build crawl at 1/(N+1) of the task
    * slots — a core build is on the batch's critical path and must
    * run near cluster width. Bench's allocation file gives these
    * pools a large weight; several pools (FIFO inside, hashed by core
    * name) let independent cores build in parallel without one pool's
    * FIFO order serializing them. Outside FAIR mode the property is
    * ignored. */
  val CorePoolCount = 4
  def corePool(key: String): String =
    s"graft-core-${math.floorMod(key.hashCode, CorePoolCount)}"

  /** One cached core: the build (plus its checkpoint) runs inside the
    * cell's `lazy val` monitor, so concurrent consumers of the SAME
    * core block until it exists while different cores build in
    * parallel; the ConcurrentHashMap only ever allocates cells (never
    * runs Spark work under a bin lock, so nested memo calls — a
    * component core building its pair core — cannot deadlock). */
  private final class Cell(spark: SparkSession, key: String,
                           build: () => DataFrame) {
    @volatile private var ids: Set[Int] = Set.empty
    lazy val df: DataFrame = {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet.toSet
      val prevPool = sc.getLocalProperty("spark.scheduler.pool")
      sc.setLocalProperty("spark.scheduler.pool", corePool(key))
      val out =
        try Materialize.core(build())
        finally sc.setLocalProperty("spark.scheduler.pool", prevPool)
      // attribute every storage block the build pinned (its own
      // checkpoint + any nested cores) to this cell: over-claiming a
      // transient intermediate only delays its reclaim to clear();
      // under-claiming would let sweepTransient kill a live core
      ids = sc.getPersistentRDDs.keySet.toSet -- before
      out
    }
    def rddIds: Set[Int] = ids
  }

  private val cells =
    new java.util.concurrent.ConcurrentHashMap[String, Cell]()

  /** The checkpointed core `name`, built on first use per
    * SparkContext. `build` must be deterministic for the key — gate
    * helpers key by (core, sfDir). */
  def memo(spark: SparkSession, name: String)(build: => DataFrame): DataFrame =
    cells.computeIfAbsent(
      spark.sparkContext.applicationId + ":" + name,
      _ => new Cell(spark, name, () => build)).df

  /** Storage-block RDD ids backing live cells — the set a per-query
    * sweep must leave alone. */
  def protectedIds: Set[Int] =
    cells.values.asScala.flatMap(_.rddIds).toSet

  /** Unpersist every storage block EXCEPT those backing live cells:
    * the per-query cleanup for sequential runners (Verify, sequential
    * Bench) that must reclaim transient checkpoints without breaking
    * cores still in use by later queries. */
  def sweepTransient(spark: SparkSession): Unit = {
    val keep = protectedIds
    spark.sparkContext.getPersistentRDDs
      .foreach { case (id, rdd) => if (!keep(id)) rdd.unpersist(blocking = false) }
  }

  /** Drop every cell (batch boundary). Does NOT unpersist — callers
    * follow with their full persistent-RDD sweep, which now reclaims
    * the cores too. */
  def clear(): Unit = cells.clear()
}
