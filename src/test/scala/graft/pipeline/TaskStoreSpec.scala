package graft.pipeline

import graft.SparkSpec
import java.time.{Duration, Instant}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

class TaskStoreSpec extends SparkSpec {

  test("claim is exactly-once under concurrency") {
    val store = new TaskStore()
    (1 to 20).foreach(i => store.createTask("draft_dp", id = Some(s"t$i")))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val claims = Await.result(
      Future.sequence((1 to 40).map(i => Future(store.getNextTask(s"agent$i")))),
      30.seconds).flatten
    pool.shutdown()
    assert(claims.size === 20)
    assert(claims.map(_.id).distinct.size === 20) // no double-claim
    assert(store.getNextTask("late") === None)
  }

  test("complete requires ownership and merges result data") {
    val store = new TaskStore()
    store.createTask("draft_dp", id = Some("t1"), data = Map("k" -> "v"))
    val claimed = store.getNextTask("agentA").get
    assert(claimed.id === "t1")
    assert(!store.completeTask("t1", "agentB")) // wrong owner
    assert(store.completeTask("t1", "agentA", resultData = Map("out" -> "1")))
    val t = store.getTask("t1").get
    assert(t.status === "completed" && t.data === Map("k" -> "v", "out" -> "1"))
  }

  test("release returns task to pending, keeping task_started_at") {
    val store = new TaskStore()
    store.createTask("draft_dp", id = Some("t1"))
    store.getNextTask("agentA")
    assert(store.releaseTask("t1", "agentA"))
    val t = store.getTask("t1").get
    assert(t.status === "pending" && t.lockedBy.isEmpty && t.taskStartedAt.nonEmpty)
    // claimable again
    assert(store.getNextTask("agentB").map(_.id).contains("t1"))
  }

  test("stale locks sweep back to pending after 24h (fake clock)") {
    var now = Instant.parse("2026-01-01T00:00:00Z")
    val store = new TaskStore(Duration.ofHours(24), () => now)
    store.createTask("draft_dp", id = Some("t1"))
    store.getNextTask("agentA")
    now = now.plus(Duration.ofHours(23))
    assert(store.sweepTimeouts() === 0) // not yet stale
    now = now.plus(Duration.ofHours(2))
    // the sweep runs inside the claim, exactly as the reference
    val reclaimed = store.getNextTask("agentB")
    assert(reclaimed.map(_.id).contains("t1"))
    assert(reclaimed.get.lockedBy.contains("agentB"))
  }

  test("parent-child relations and status summary") {
    val store = new TaskStore()
    store.createTask("seed_dp", id = Some("seed1"))
    store.createTask("draft_dp", parentId = Some("seed1"), id = Some("d1"))
    store.createTask("draft_dp", parentId = Some("seed1"), id = Some("d2"))
    assert(store.getTaskChildren("seed1").map(_.id).sorted === Seq("d1", "d2"))
    store.getNextTask("a", Seq("seed_dp"))
    assert(store.getStatusSummary === Map("pending" -> 2L, "in_progress" -> 1L,
      "completed" -> 0L, "failed" -> 0L, "cancelled" -> 0L))
  }

  test("type filter on claim") {
    val store = new TaskStore()
    store.createTask("seed_dp", id = Some("s1"))
    store.createTask("draft_dp", id = Some("d1"))
    assert(store.getNextTask("a", Seq("draft_dp")).map(_.id).contains("d1"))
  }

  test("save/load round-trips through parquet") {
    val store = new TaskStore()
    store.createTask("draft_dp", id = Some("t1"), data = Map("k" -> "v"))
    store.createTask("review_dp", parentId = Some("t1"), id = Some("t2"))
    store.getNextTask("agentA", Seq("draft_dp"))
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString + "/tasks"
    store.save(spark, dir)
    val back = TaskStore.load(spark, dir)
    val t1 = back.getTask("t1").get
    assert(t1.status === "in_progress" && t1.lockedBy.contains("agentA")
      && t1.data === Map("k" -> "v"))
    assert(back.getTask("t2").get.parentId.contains("t1"))
  }

  test("CAS versioning: a racing writer's save fails loudly, not silently") {
    val store = new TaskStore()
    store.createTask("draft_dp", id = Some("t1"))
    val dir = java.nio.file.Files.createTempDirectory("graft-cas").toString + "/tasks"
    store.save(spark, dir) // version 1

    // two drivers load the same snapshot, both mutate
    val a = TaskStore.load(spark, dir)
    val b = TaskStore.load(spark, dir)
    a.createTask("draft_dp", id = Some("from_a"))
    b.createTask("draft_dp", id = Some("from_b"))

    a.save(spark, dir) // first committer wins (version 2)
    val e = intercept[java.util.ConcurrentModificationException] {
      b.save(spark, dir) // lost-update attempt must NOT clobber a's commit
    }
    assert(e.getMessage.contains("another writer committed"))
    // a's commit survived; b's never landed
    val back = TaskStore.load(spark, dir)
    assert(back.getTask("from_a").isDefined)
    assert(back.getTask("from_b").isEmpty)
    // b recovers by reloading and re-applying
    val b2 = TaskStore.load(spark, dir)
    b2.createTask("draft_dp", id = Some("from_b"))
    b2.save(spark, dir)
    assert(TaskStore.load(spark, dir).getTask("from_b").isDefined)
    assert(TaskStore.versionOf(dir) === 3L)
  }

  test("workflow metadata merges, bumps last_updated, and round-trips") {
    val store = new TaskStore(workflowType = "dp_generation")
    store.createTask("seed_dp", id = Some("t1"))
    store.updateWorkflowMetadata(Map("phase" -> "ideation"))
    assert(store.workflowMetadata("phase") === "ideation")
    assert(store.workflowMetadata.contains("initialized_at"))
    val dir = java.nio.file.Files.createTempDirectory("graft-meta").toString + "/tasks"
    store.save(spark, dir)
    val back = TaskStore.load(spark, dir)
    assert(back.workflowType === "dp_generation")
    assert(back.workflowMetadata("phase") === "ideation")
    assert(back.workflowMetadata.contains("last_updated"))
  }

  test("a corrupt version file conflicts with strangers but heals via " +
    "reload — never a brick, never a clobber") {
    val store = new TaskStore()
    store.createTask("draft_dp", id = Some("t1"))
    val dir = java.nio.file.Files.createTempDirectory("graft-vcorrupt").toString + "/tasks"
    store.save(spark, dir)
    // torn write: empty version file → the corrupt sentinel, not a throw
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_GRAFT_VERSION"), "")
    assert(TaskStore.versionOf(dir) === -1L)
    // a fresh store that never saw the snapshot must NOT clobber it
    val fresh = new TaskStore()
    fresh.createTask("draft_dp", id = Some("intruder"))
    intercept[java.util.ConcurrentModificationException] { fresh.save(spark, dir) }
    // recovery path: reload (observes the corruption), re-apply, save
    // heals at version >= 1 so later fresh stores still conflict
    val re = TaskStore.load(spark, dir)
    assert(re.getTask("t1").isDefined) // data was never lost
    re.save(spark, dir)
    assert(TaskStore.versionOf(dir) === 1L)
    assert(TaskStore.load(spark, dir).getTask("intruder").isEmpty)
  }

  test("a fresh store cannot clobber an existing snapshot it never loaded") {
    val store = new TaskStore()
    store.createTask("draft_dp", id = Some("t1"))
    val dir = java.nio.file.Files.createTempDirectory("graft-cas2").toString + "/tasks"
    store.save(spark, dir)
    val fresh = new TaskStore()
    fresh.createTask("draft_dp", id = Some("other"))
    intercept[java.util.ConcurrentModificationException] {
      fresh.save(spark, dir)
    }
  }
}
