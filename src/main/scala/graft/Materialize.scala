package graft

import org.apache.spark.sql.DataFrame

/** Materialization policy for batch cores and multi-consumer
  * intermediates — the one knob that decides HOW a shared DataFrame is
  * pinned when an operator needs a recomputation barrier (Shared.memo
  * cores, [[graft.scale.Skew.boundedSelfPairs]]' input/hot-key tables,
  * every tokenized/signature kernel the scale layer checkpoints).
  *
  * Local mode (`spark.graft.materialize` unset or `local`, the
  * default) uses `localCheckpoint()`: executor-local, non-replicated
  * blocks — the right call on local[32] and the cheapest barrier on a
  * healthy cluster, but lineage is TRUNCATED, so on a real cluster a
  * lost executor loses blocks that cannot be recomputed and the batch
  * aborts. Reliable mode (`spark.graft.materialize=reliable` +
  * `spark.graft.materialize.dir=<fault-tolerant path>`) routes the
  * same call sites through `checkpoint()`: blocks are written to the
  * checkpoint directory (HDFS/S3 on a cluster), so executor loss costs
  * a re-read, not the job. The trade is write bandwidth per core —
  * exactly the durability bill a 100 TB batch chooses to pay; results
  * are byte-identical either way (a barrier only changes WHERE the
  * rows live).
  *
  * The mode is read per call from the session conf, so one batch can
  * flip it (e.g. reliable for the expensive cores of a long run,
  * local for a quick probe) without touching operator code.
  */
object Materialize {

  /** Session-conf key selecting the policy: `local` (default) or
    * `reliable`. */
  val ModeKey = "spark.graft.materialize"

  /** Fault-tolerant directory reliable mode writes to (required when
    * the mode is `reliable` and no checkpoint dir is set yet). */
  val DirKey = "spark.graft.materialize.dir"

  /** The DirKey value most recently applied via setCheckpointDir —
    * lets a changed DirKey take effect mid-session without re-setting
    * (and re-UUID-ing) the dir on every call. */
  @volatile private var appliedDir: Option[String] = None

  /** Materialize `df` under the session's policy. Eager in both modes
    * (the barrier is the point: consumers must read stored rows, not
    * re-run the lineage). */
  def core(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint()
      case "reliable" =>
        val sc = spark.sparkContext
        spark.conf.getOption(DirKey) match {
          case Some(dir) =>
            // re-assert whenever DirKey CHANGES: once a checkpoint dir
            // exists (set by an earlier call or user code), a changed
            // DirKey must win, not be silently ignored for the rest of
            // the session. getCheckpointDir returns a fully-qualified
            // path with a per-set UUID subdir, so "same dir?" is
            // tracked by the raw conf value we last applied.
            if (sc.getCheckpointDir.isEmpty || !appliedDir.contains(dir)) {
              sc.setCheckpointDir(dir)
              appliedDir = Some(dir)
            }
          case None if sc.getCheckpointDir.isEmpty => sys.error(
            s"$ModeKey=reliable requires $DirKey (a fault-tolerant " +
              "checkpoint directory) or a SparkContext checkpoint dir")
          case None => () // user-set checkpoint dir stands
        }
        // persist first: checkpoint() on bare lineage computes it
        // TWICE (the eager action + the checkpoint-write job) — the
        // standard RDD.checkpoint caveat, and these cores are exactly
        // the expensive lineages the reliable policy targets
        df.persist()
        val out = df.checkpoint()
        df.unpersist(blocking = false)
        out
      case other => sys.error(s"$ModeKey must be local|reliable: $other")
    }
  }

  /** Chain-friendly form: `df.select(...).coreCheckpoint()`. */
  implicit final class CoreOps(private val df: DataFrame) extends AnyVal {
    def coreCheckpoint(): DataFrame = core(df)
  }
}
