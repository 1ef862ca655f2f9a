package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.time.format.DateTimeFormatter
import java.time.{Duration, Instant, ZoneOffset}
import java.util.UUID

/** One task in the coordination store; field-for-field the reference's
  * task struct (`task_manager.py:161-170` plus the dynamically-added
  * task_started_at/updated_at at `:210`/`:413`). `data` is open-schema
  * (string map), as in the reference's arbitrary dict.
  */
case class Task(
    id: String,
    taskType: String,
    status: String,
    parentId: Option[String] = None,
    lockedBy: Option[String] = None,
    lockedAt: Option[String] = None,
    completedAt: Option[String] = None,
    createdAt: String = "",
    taskStartedAt: Option[String] = None,
    updatedAt: Option[String] = None,
    data: Map[String, String] = Map.empty)

/** Driver-side task queue with the reference `TaskManager`'s nine APIs
  * (`task_manager.py:140-419`) — SURVEY §4.3's one real design
  * decision.
  *
  * The reference coordinates *external agent processes* through a
  * flock-guarded JSON file; in Spark the batch work it schedules is
  * subsumed by the DAG scheduler ( §2.8 P4), so the queue survives only
  * as the agent-facing coordination plane. All mutations serialize
  * through this single-writer object (no flock needed); durability is a
  * versioned parquet snapshot committed with the same temp+rename
  * protocol the reference uses for its JSON (`task_manager.py:97-107`).
  *
  * Scale: the store holds coordination metadata ("thousands, not
  * millions" — `task_manager/README.md:209-213`), not data rows. Bulk
  * validation over millions of datapoints never enqueues per-row tasks;
  * it runs as a distributed Dataset job ([[Validators]]).
  */
class TaskStore(staleAfter: Duration = Duration.ofHours(24),
                clock: () => Instant = () => Instant.now(),
                val workflowType: String = "generic") {

  private val iso = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    .withZone(ZoneOffset.UTC)
  private def now(): String = iso.format(clock())

  /** Workflow-level metadata (`task_manager.py:51-62`): initialized_at /
    * last_updated plus whatever callers merge in. */
  private var metadata: Map[String, String] =
    Map("initialized_at" -> now(), "last_updated" -> now())

  private var tasks = Vector.empty[Task]

  /** Version of the snapshot this store was loaded from (0 = fresh
    * store, no snapshot seen). [[save]] CAS-checks it against the
    * destination before committing. */
  private var loadedVersion: Long = 0L

  def createTask(taskType: String, parentId: Option[String] = None,
                 data: Map[String, String] = Map.empty,
                 id: Option[String] = None): Task = synchronized {
    // id = f"{type}_{uuid4().hex[:8]}" (`task_manager.py:158`)
    val tid = id.getOrElse(s"${taskType}_${UUID.randomUUID().toString.replace("-", "").take(8)}")
    require(!tasks.exists(_.id == tid), s"duplicate task id: $tid")
    val t = Task(tid, taskType, "pending", parentId = parentId,
      createdAt = now(), data = data)
    tasks :+= t
    t
  }

  /** Atomic claim (P2): timeout sweep, then first pending of the
    * requested types → in_progress, locked by agentId. Exactly one
    * winner per task (single-writer serialization). */
  def getNextTask(agentId: String, types: Seq[String] = Nil): Option[Task] = synchronized {
    sweepTimeouts()
    val idx = tasks.indexWhere(t =>
      t.status == "pending" && (types.isEmpty || types.contains(t.taskType)))
    if (idx < 0) None
    else {
      val t = tasks(idx).copy(status = "in_progress", lockedBy = Some(agentId),
        lockedAt = Some(now()), taskStartedAt = Some(now()))
      tasks = tasks.updated(idx, t)
      Some(t)
    }
  }

  /** Ownership-checked complete (P3; `task_manager.py:225-270`): only
    * the locking agent may complete; result data merges into `data`. */
  def completeTask(id: String, agentId: String, status: String = "completed",
                   resultData: Map[String, String] = Map.empty): Boolean = synchronized {
    require(Schemas.TaskStatuses.contains(status), s"bad status: $status")
    mutate(id) {
      case t if t.lockedBy.contains(agentId) && t.status == "in_progress" =>
        t.copy(status = status, completedAt = Some(now()), updatedAt = Some(now()),
          lockedBy = None, lockedAt = None, data = t.data ++ resultData)
    }
  }

  /** Release without completing (P3; keeps task_started_at —
    * `task_manager.py:272-303`). */
  def releaseTask(id: String, agentId: String): Boolean = synchronized {
    mutate(id) {
      case t if t.lockedBy.contains(agentId) && t.status == "in_progress" =>
        t.copy(status = "pending", lockedBy = None, lockedAt = None,
          updatedAt = Some(now()))
    }
  }

  def getTask(id: String): Option[Task] = synchronized(tasks.find(_.id == id))

  /** Parent-child query (J4; `task_manager.py:326-346`). */
  def getTaskChildren(parentId: String): Seq[Task] =
    synchronized(tasks.filter(_.parentId.contains(parentId)))

  /** Status summary over the full enum, zero counts included (A1;
    * `task_manager.py:348-376`). */
  def getStatusSummary: Map[String, Long] = synchronized {
    val counts = tasks.groupBy(_.status).view.mapValues(_.size.toLong).toMap
    Schemas.TaskStatuses.map(s => s -> counts.getOrElse(s, 0L)).toMap
  }

  def typeCounts: Map[String, Long] =
    synchronized(tasks.groupBy(_.taskType).view.mapValues(_.size.toLong).toMap)

  /** Merge metadata into the workflow header — the ninth TaskManager
    * API (`task_manager.py:378-391`); `last_updated` bumps on every
    * merge, as `_save_state` does. */
  def updateWorkflowMetadata(m: Map[String, String]): Unit = synchronized {
    metadata = metadata ++ m + ("last_updated" -> now())
  }

  def workflowMetadata: Map[String, String] = synchronized(metadata)

  /** Merge data into a task (M8; `task_manager.py:393-416`). */
  def updateTaskData(id: String, data: Map[String, String]): Boolean = synchronized {
    mutate(id) { case t => t.copy(data = t.data ++ data, updatedAt = Some(now())) }
  }

  /** Stale-lock sweep (P6; `task_manager.py:109-138`): in_progress
    * tasks locked longer than staleAfter reset to pending. Runs inside
    * every claim, exactly as `task_manager.py:193-196`. */
  def sweepTimeouts(): Int = synchronized {
    val cutoff = clock().minus(staleAfter)
    var n = 0
    tasks = tasks.map { t =>
      val stale = t.status == "in_progress" &&
        t.lockedAt.exists(l => Instant.from(iso.parse(l)).isBefore(cutoff))
      if (stale) { n += 1; t.copy(status = "pending", lockedBy = None, lockedAt = None) }
      else t
    }
    n
  }

  def all: Seq[Task] = synchronized(tasks)

  /** Snapshot to a Spark DataFrame — the bridge from the coordination
    * plane into relational queries ([[DatapointOps.verifiedFilter]],
    * [[DatapointOps.statusCounts]]). */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized(tasks).toDF()
      .withColumnRenamed("taskType", "type")
      .withColumnRenamed("lockedBy", "locked_by")
      .withColumnRenamed("parentId", "parent_id")
  }

  /** Versioned parquet commit of the store (S6) with a compare-and-swap
    * guard: the commit only proceeds if the destination still holds the
    * version this store loaded, so a writer that raced another writer's
    * load→mutate→save cycle fails loudly instead of silently clobbering
    * the other's commit (lost update). Under [[TableIO.withLock]] (the
    * CLI path) the check is airtight; without the lock it detects —
    * rather than prevents — the conflict, which still converts data
    * loss into a retryable error. On conflict: reload and re-apply. */
  def save(spark: SparkSession, dir: String): Unit = synchronized {
    val current = TaskStore.versionOf(dir)
    if (current != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"task store at $dir is at version $current, but this store loaded " +
          s"version $loadedVersion — another writer committed in between; " +
          "reload and re-apply")
    TableIO.atomicOverwrite(toDF(spark), dir)
    // a store that recovered a corrupt version (-1) must commit at >= 1:
    // committing at 0 would let a later fresh store's CAS pass (0 == 0)
    loadedVersion = math.max(loadedVersion + 1, 1L)
    // temp+rename like every other commit: a torn in-place write would
    // leave an unparseable version file
    val vp = java.nio.file.Paths.get(dir, TaskStore.VersionFile)
    val vtmp = java.nio.file.Paths.get(dir, TaskStore.VersionFile + ".tmp")
    java.nio.file.Files.writeString(vtmp, loadedVersion.toString)
    java.nio.file.Files.move(vtmp, vp,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    updateWorkflowMetadata(Map.empty) // bump last_updated, as _save_state does
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    // temp+rename, same as the version file: a crash mid-write must not
    // leave torn JSON that bricks every subsequent load
    val mp = java.nio.file.Paths.get(dir, TaskStore.MetaFile)
    val mtmp = java.nio.file.Paths.get(dir, TaskStore.MetaFile + ".tmp")
    java.nio.file.Files.writeString(mtmp,
      mapper.writeValueAsString(
        (metadata + ("workflow_type" -> workflowType)).asJava))
    java.nio.file.Files.move(mtmp, mp,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def mutate(id: String)(pf: PartialFunction[Task, Task]): Boolean = {
    val idx = tasks.indexWhere(_.id == id)
    if (idx < 0) false
    else pf.lift(tasks(idx)) match {
      case Some(t) => tasks = tasks.updated(idx, t); true
      case None => false
    }
  }
}

object TaskStore {
  private[pipeline] val VersionFile = "_GRAFT_VERSION"
  private[pipeline] val MetaFile = "_GRAFT_META"

  /** Current committed version of a snapshot dir: 0 if the file is
    * absent (fresh dir, or crash between table commit and version
    * write), -1 if present but unreadable/unparseable. The corrupt
    * sentinel conflicts with EVERY in-flight loadedVersion except a
    * load that itself observed the corruption — so a fresh store can
    * never clobber a corrupt-but-populated snapshot, while a
    * load→re-apply→save cycle heals it (committing at version ≥ 1).
    * Never throws: a torn or non-UTF-8 file must not brick the store. */
  def versionOf(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir, VersionFile)
    if (!java.nio.file.Files.exists(p)) 0L
    else
      try java.nio.file.Files.readString(p).trim.toLong
      catch { case scala.util.control.NonFatal(_) => -1L }
  }

  /** Restore from a parquet snapshot written by [[TaskStore.save]]. */
  def load(spark: SparkSession, dir: String,
           staleAfter: Duration = Duration.ofHours(24)): TaskStore = {
    val metaPath = java.nio.file.Paths.get(dir, MetaFile)
    // a torn/corrupt meta file degrades to empty metadata rather than
    // bricking the store — same never-throws stance as versionOf
    val meta: Map[String, String] =
      if (java.nio.file.Files.exists(metaPath)) {
        try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(java.nio.file.Files.readString(metaPath))
          val it = node.fields()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
          b.result()
        } catch { case scala.util.control.NonFatal(_) => Map.empty[String, String] }
      } else Map.empty
    val store = new TaskStore(staleAfter,
      workflowType = meta.getOrElse("workflow_type", "generic"))
    store.loadedVersion = versionOf(dir)
    if (meta.nonEmpty) store.metadata = meta - "workflow_type"
    // Parquet read order follows part-file listing, not write order —
    // restore CREATION order explicitly, because F3's "first pending"
    // claim is defined over it (the reference's JSON store is a list,
    // `task_manager.py:158`; a permuted reload would make getNextTask
    // claim an arbitrary pending task after a round-trip). createdAt
    // is microsecond-ISO so it sorts lexicographically; id breaks
    // same-instant ties deterministically.
    val rows = spark.read.parquet(dir).collect()
      .sortBy(r => (r.getAs[String]("createdAt"), r.getAs[String]("id")))
    rows.foreach { r =>
      def opt(c: String): Option[String] = Option(r.getAs[String](c))
      store.synchronized {
        store.tasks :+= Task(
          id = r.getAs[String]("id"),
          taskType = r.getAs[String]("type"),
          status = r.getAs[String]("status"),
          parentId = opt("parent_id"),
          lockedBy = opt("locked_by"),
          lockedAt = opt("lockedAt"),
          completedAt = opt("completedAt"),
          createdAt = r.getAs[String]("createdAt"),
          taskStartedAt = opt("taskStartedAt"),
          updatedAt = opt("updatedAt"),
          data = Option(r.getAs[Map[String, String]]("data")).getOrElse(Map.empty))
      }
    }
    store
  }
}
