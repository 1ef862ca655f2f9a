package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** Drives the CLI facade in-process through the full datapoint
  * lifecycle — the same flow an operator runs from the shell. */
class PipelineCliSpec extends SparkSpec {

  def cli(base: String, args: String*): Unit =
    PipelineCli.run(spark, base, args.head, args.toArray)

  test("create → review → approve → verify-all lifecycle") {
    val base = Files.createTempDirectory("graft-cli").toString
    cli(base, "create-dp", "dp_1", "fix it",
      "FROM ubuntu\\nRUN apt-get install -y tmux asciinema",
      "def test_x():\n  assert False", """{"test_x": 1.0}""", "medium")
    assert(TableIO.readCsv(spark, s"$base/staging").count() === 1)

    cli(base, "add-to-review", "dp_1")
    assert(TableIO.readCsv(spark, s"$base/staging").count() === 0)
    val review = TableIO.readCsv(spark, s"$base/review")
    assert(review.count() === 1)
    assert(review.head().getAs[String]("reviewed_at").nonEmpty)

    cli(base, "approve", "dp_1", "--category", "debugging", "--tags", "python")
    val prod = TableIO.readCsv(spark, s"$base/production")
    assert(prod.count() === 1)
    assert(prod.head().getAs[String]("title") === "dp_1")

    cli(base, "verify-all")
    assert(TableIO.readCsv(spark, s"$base/latest_verified").count() === 1)
  }

  test("categories command lists the full enum vocabularies") {
    val base = Files.createTempDirectory("graft-cli-cat").toString
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      cli(base, "categories")
    }
    val s = out.toString
    assert(s.contains(s"categories (${Schemas.Categories.size}):"))
    assert(s.contains(s"tags (${Schemas.Tags.size}):"))
    assert(Schemas.Categories.forall(s.contains))
    assert(s.contains("extremely_hard"))
  }

  test("a crash mid TASK-QUEUE swap is repaired, not wiped by an empty store") {
    val base = Files.createTempDirectory("graft-cli-taskcrash").toString
    val seeds = Files.createTempDirectory("graft-taskcrash-seeds")
    Files.createDirectories(seeds.resolve("t1"))
    Files.writeString(seeds.resolve("t1/Dockerfile"), "FROM alpine\n")
    cli(base, "init-seeds", seeds.toString)
    // simulate the swap-window crash on the tasks table itself
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$base/tasks"),
      java.nio.file.Paths.get(s"$base/tasks.old"))
    // the next queue command must recover the old queue (a fresh empty
    // store would pass CAS at version 0 and silently wipe every task)
    cli(base, "next", "--agent", "a1")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { cli(base, "list") }
    assert(out.toString.contains("seed_dp_t1"))
  }

  test("a crash mid table-swap is repaired by the next CLI read") {
    val base = Files.createTempDirectory("graft-cli-crash").toString
    cli(base, "create-dp", "dp_9", "p", "FROM x", "def test_a():\n  pass",
      """{"test_a": 1.0}""", "easy")
    // simulate a writer dying between the two atomicOverwrite renames:
    // the table is gone, the data stranded at .old
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$base/staging"),
      java.nio.file.Paths.get(s"$base/staging.old"))
    // any table-touching command first reconciles, then proceeds
    cli(base, "patch", "dp_9", "--table", "staging", "--set", "difficulty=hard")
    val back = TableIO.readCsv(spark, s"$base/staging")
    assert(back.count() === 1)
    assert(back.head().getAs[String]("difficulty") === "hard")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/staging.old")))
  }

  test("task queue: init-seeds idempotent, claim/complete round-trip") {
    val base = Files.createTempDirectory("graft-cli2").toString
    val seeds = Files.createTempDirectory("graft-cli2-seeds")
    Files.createDirectories(seeds.resolve("t1"))
    Files.writeString(seeds.resolve("t1/Dockerfile"), "FROM alpine\n")
    cli(base, "init-seeds", seeds.toString)
    cli(base, "init-seeds", seeds.toString) // idempotent (J2 anti-join)
    val store = TaskStore.load(spark, s"$base/tasks")
    assert(store.all.size === 1)
    cli(base, "next", "--agent", "a")
    cli(base, "complete", "seed_dp_t1", "--agent", "a")
    assert(TaskStore.load(spark, s"$base/tasks")
      .getTask("seed_dp_t1").get.status === "completed")
  }

  test("patch and patch-files mutate one row and append audit history") {
    val base = Files.createTempDirectory("graft-cli4").toString
    cli(base, "create-dp", "dp_5", "p", "d", "def test_a():\n  pass",
      """{"test_a": 1.0}""", "easy")
    cli(base, "patch", "dp_5", "--set", "difficulty=hard")
    val row = TableIO.readCsv(spark, s"$base/staging").head()
    assert(row.getAs[String]("difficulty") === "hard")

    cli(base, "patch-files", "dp_5", "--mode", "update", "--file", "a.txt=alpha")
    val files = TableIO.readCsv(spark, s"$base/staging").head()
      .getAs[String]("additional_files")
    assert(files.contains("a.txt") && files.contains("alpha"))

    val audit = spark.read.json(s"$base/history")
    assert(audit.count() === 2)
    assert(audit.filter(org.apache.spark.sql.functions.col("op") === "patch")
      .count() === 1)
  }

  test("info, create-task, and artifact store round-trip") {
    val base = Files.createTempDirectory("graft-cli5").toString
    cli(base, "create-task", "--type", "idea", "--data", "seed=s1")
    val store = TaskStore.load(spark, s"$base/tasks")
    val t = store.all.head
    assert(t.taskType === "idea" && t.data === Map("seed" -> "s1"))
    cli(base, "create-task", "--type", "draft_dp", "--parent", t.id)
    cli(base, "info", t.id) // prints detail incl. the child — smoke
    cli(base, "save-artifact", "a1", """{"k": 1}""")
    cli(base, "get-artifact", "a1")
    assert(Files.readString(java.nio.file.Paths.get(s"$base/artifacts/a1.json"))
      === """{"k": 1}""")
  }

  test("reconcile removes staging rows that already reached review (M4 crash recovery)") {
    val base = Files.createTempDirectory("graft-cli6").toString
    cli(base, "create-dp", "dp_a", "p", "d", "def test_a():\n  pass",
      """{"test_a": 1.0}""", "easy")
    cli(base, "create-dp", "dp_b", "p", "d", "def test_b():\n  pass",
      """{"test_b": 1.0}""", "easy")
    cli(base, "add-to-review", "dp_a")
    // simulate a crash between the two commits of a second move: put
    // dp_b into review but leave it in staging too
    val review = TableIO.readCsv(spark, s"$base/review")
    val staging = TableIO.readCsv(spark, s"$base/staging")
    val (dupReview, _) = DatapointOps.moveToReview(staging, review, "dp_b", "now")
    TableIO.atomicOverwrite(dupReview, s"$base/review", format = "csv", quoteAll = true)
    assert(TableIO.readCsv(spark, s"$base/staging").count() === 1) // dp_b still staged
    cli(base, "reconcile")
    assert(TableIO.readCsv(spark, s"$base/staging").count() === 0)
    assert(TableIO.readCsv(spark, s"$base/review").count() === 2)
  }

  test("file lock serializes mutations and times out cleanly") {
    val dir = Files.createTempDirectory("graft-lock").toString
    var order = Vector.empty[Int]
    val t1 = new Thread(() => TableIO.withLock(s"$dir/.lock") {
      order.synchronized { order :+= 1 }; Thread.sleep(300)
      order.synchronized { order :+= 2 }
    })
    t1.start(); Thread.sleep(50)
    TableIO.withLock(s"$dir/.lock") { order.synchronized { order :+= 3 } }
    t1.join()
    assert(order === Vector(1, 2, 3)) // second caller waited for the lock
    // timeout path: holder keeps the lock longer than the waiter allows
    val t2 = new Thread(() => TableIO.withLock(s"$dir/.lock") { Thread.sleep(800) })
    t2.start(); Thread.sleep(50)
    intercept[IllegalStateException] {
      TableIO.withLock(s"$dir/.lock", timeoutMs = 100) { () }
    }
    t2.join()
  }

  test("dedup-batch lifecycle: claim → incremental span dedup vs the " +
    "persisted index → additive fold → complete; a crash-redo folds " +
    "nothing twice") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    import graft.scale.Dedup
    val base = Files.createTempDirectory("graft-cli-dedup").toString
    val phrase = "alpha beta gamma delta epsilon"
    val b1 = Seq((1L, s"$phrase one two three four"),
      (2L, s"zero $phrase five six seven"))
    val b2 = Seq((3L, s"$phrase nine ten eleven twelve"),
      (4L, "unrelated words only here today"))
    val d1 = s"$base/in_b1"; val d2 = s"$base/in_b2"
    b1.toDF("doc_id", "text").write.parquet(d1)
    b2.toDF("doc_id", "text").write.parquet(d2)
    cli(base, "create-task", "--type", "dedup_batch", "--data", s"batch=$d1")
    cli(base, "create-task", "--type", "dedup_batch", "--data", s"batch=$d2")
    // snapshot the store at two points: BOTH pending (for the
    // interleaved-crash case) and between the two lifecycles (for the
    // simple crash case) — restoring either after the folds reproduces
    // "index folded, task completion lost"
    def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(from).iterator().asScala.toSeq.foreach { p =>
        val dst = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else Files.copy(p, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val savedBoth = Files.createTempDirectory("graft-cli-dedup-saved0")
    copyDir(java.nio.file.Paths.get(s"$base/tasks"), savedBoth)
    cli(base, "dedup-batch", "--agent", "a")
    val savedTasks = Files.createTempDirectory("graft-cli-dedup-saved")
    copyDir(java.nio.file.Paths.get(s"$base/tasks"), savedTasks)
    cli(base, "dedup-batch", "--agent", "a")
    val store = TaskStore.load(spark, s"$base/tasks")
    val done = store.all.filter(_.taskType == "dedup_batch")
    assert(done.size === 2 && done.forall(_.status === "completed"))
    assert(done.forall(_.data.contains("n_spans")))
    // the folded index equals a from-scratch rebuild over every doc
    def idxMap() = spark.read.parquet(s"$base/span_index")
      .select("h", "df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rebuilt = Dedup.spanIndex((b1 ++ b2).toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idxMap() === rebuilt)
    // batch-2's flagged spans == the batch path over the full corpus,
    // restricted to batch-2 docs (the incremental contract)
    val t2 = done.find(_.data("batch") == d2).get
    def spanSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val got = spanSet(spark.read.parquet(s"$base/batch_spans/${t2.id}"))
    val expect = spanSet(Dedup.dupSpans((b1 ++ b2).toDF("doc_id", "text"))
      .filter(col("doc_id") >= 3L))
    assert(got === expect && got.nonEmpty)
    // drained queue: a further claim is a clean no-op
    cli(base, "dedup-batch", "--agent", "a")
    assert(TaskStore.load(spark, s"$base/tasks").all.size === 2)
    // CRASH REDO: restore the pre-batch-2 store (claim lost, index
    // committed) and re-run — the verb re-claims t2, rewrites its
    // spans idempotently, finds folded_task == t2.id and SKIPS the
    // additive fold; df counts must not move
    val before = idxMap()
    def deleteDir(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    deleteDir(java.nio.file.Paths.get(s"$base/tasks"))
    copyDir(savedTasks, java.nio.file.Paths.get(s"$base/tasks"))
    cli(base, "dedup-batch", "--agent", "a")
    assert(idxMap() === before, "crash redo double-counted the fold")
    assert(TaskStore.load(spark, s"$base/tasks")
      .getTask(t2.id).get.status === "completed")
    assert(spanSet(spark.read.parquet(s"$base/batch_spans/${t2.id}")) === got)
    // INTERLEAVED CRASH REDO: restore the both-pending store while the
    // index holds BOTH folds — the scenario a single-slot "last folded
    // task" marker gets wrong (t2's fold intervened after t1's). The
    // max_doc watermark recognizes each re-claimed batch as already
    // folded (batchMax <= max_doc + its span output exists) and
    // completes both without touching the index
    deleteDir(java.nio.file.Paths.get(s"$base/tasks"))
    copyDir(savedBoth, java.nio.file.Paths.get(s"$base/tasks"))
    cli(base, "dedup-batch", "--agent", "a")
    cli(base, "dedup-batch", "--agent", "a")
    assert(idxMap() === before, "interleaved crash redo re-folded a batch")
    val restored = TaskStore.load(spark, s"$base/tasks")
      .all.filter(_.taskType == "dedup_batch")
    assert(restored.size === 2 && restored.forall(_.status === "completed"))
    assert(spanSet(spark.read.parquet(s"$base/batch_spans/${t2.id}")) === got)
    // CONTRACT REJECTION 1: a batch partially overlapping the indexed
    // doc-id range (4 indexed, 5 fresh) must fail loudly — folding it
    // would double-count doc 4's windows
    val dOverlap = s"$base/in_overlap"
    Seq((4L, "unrelated words only here today"), (5L, s"$phrase fresh tail"))
      .toDF("doc_id", "text").write.parquet(dOverlap)
    cli(base, "create-task", "--type", "dedup_batch", "--data", s"batch=$dOverlap")
    val e1 = intercept[IllegalArgumentException] {
      cli(base, "dedup-batch", "--agent", "a")
    }
    assert(e1.getMessage.contains("disjoint-batch contract"))
    assert(idxMap() === before)
    // CONTRACT REJECTION 2: already-indexed docs resubmitted under a
    // NEW task id (no span output of their own) must also fail loudly
    val dResub = s"$base/in_resub"
    Seq((1L, b1.head._2)).toDF("doc_id", "text").write.parquet(dResub)
    cli(base, "create-task", "--type", "dedup_batch", "--data", s"batch=$dResub")
    val e2 = intercept[IllegalArgumentException] {
      cli(base, "dedup-batch", "--agent", "a")
    }
    assert(e2.getMessage.contains("re-submitted batch"))
    assert(idxMap() === before)
  }

  test("cancel writes the artifact and marks the review row") {
    val base = Files.createTempDirectory("graft-cli3").toString
    cli(base, "create-dp", "dp_9", "p", "d", "def test_a():\n  pass",
      """{"test_a": 1.0}""", "easy")
    cli(base, "add-to-review", "dp_9")
    cli(base, "cancel", "dp_9", "--category", "unfixable", "--reason", "nope")
    val artifact = Files.readString(
      java.nio.file.Paths.get(s"$base/cancelled/dp_9.json"))
    assert(artifact.contains("\"category\":\"unfixable\""))
    assert(artifact.contains("\"final_decision\":\"cancelled\""))
  }
}
