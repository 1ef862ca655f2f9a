package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Helper main for the cross-process lock test: holds the lock for
  * `ms` after signalling via the marker file. Runs in a SEPARATE JVM —
  * `FileChannel.tryLock` is per-process, so only a real second process
  * exercises the flock-parity claim (`task_manager.py:64-90`). */
object LockHolder {
  def main(args: Array[String]): Unit = {
    val Array(lockFile, marker, ms) = args
    TableIO.withLock(lockFile, timeoutMs = 10000) {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(marker), "held")
      Thread.sleep(ms.toLong)
    }
  }
}

/** Golden-fixture tests against the reference's own CSVs (read-only
  * inputs; expected stats recorded in FIXTURES.md).
  */
class TableIOSpec extends SparkSpec {

  val stagingCsv = "/root/reference/agents/dp_builder_workspace/staging/datapoints.csv"
  val reviewCsv = "/root/reference/agents/dp_builder_workspace/review/datapoints_for_review.csv"

  test("staging fixture: 46 rows, multiline cells parsed, legacy columns preserved") {
    val df = TableIO.readCsv(spark, stagingCsv)
    assert(df.count() === 46)
    assert(df.columns.take(9) === Schemas.StagingColumns)
    // header-driven drift columns carried through
    assert(df.columns.contains("tests") && df.columns.contains("weights"))
  }

  test("staging fixture: difficulty histogram matches golden stats") {
    val hist = TableIO.readCsv(spark, stagingCsv)
      .groupBy("difficulty").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist === Map("medium" -> 16L, "hard" -> 23L, "extremely_hard" -> 7L))
  }

  test("review fixture: 234 rows, all reviewed, one dirty difficulty value") {
    val df = TableIO.readCsv(spark, reviewCsv)
    assert(df.count() === 234)
    assert(df.filter(col("reviewed_at").isNull || col("reviewed_at") === "").count() === 0)
    val hist = df.groupBy("difficulty").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist === Map("medium" -> 109L, "hard" -> 90L,
      "extremely_hard" -> 34L, "medium\n" -> 1L))
  }

  test("review fixture round-trips byte-faithfully through quote-all write") {
    // §7.4.1 CSV fidelity: multi-KB cells with newlines, quotes, and
    // JSON-in-CSV must survive write→read unchanged
    val dir = Files.createTempDirectory("graft-rt").toString
    val orig = TableIO.readCsv(spark, reviewCsv)
    TableIO.atomicOverwrite(orig, s"$dir/review", format = "csv", quoteAll = true)
    val back = TableIO.readCsv(spark, s"$dir/review")
    assert(back.count() === 234)
    assert(back.columns === orig.columns)
    // null↔'' flips across a CSV write (an absent cell and a quoted
    // empty cell are both '' to DictReader) — canonicalize like the
    // reference does before comparing cell contents
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(df.columns.map(c => coalesce(col(c), lit("")).as(c)): _*)
        .orderBy("task_id").collect().map(_.toSeq).toSeq
    assert(canon(back) === canon(orig))
  }

  test("atomic overwrite round-trips and leaves no tmp dirs") {
    val dir = Files.createTempDirectory("graft-io").toString
    val dest = s"$dir/table"
    import spark.implicits._
    TableIO.atomicOverwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"), dest)
    TableIO.atomicOverwrite(Seq((3, "c")).toDF("id", "v"), dest)
    val back = spark.read.parquet(dest)
    assert(back.count() === 1 && back.select("v").as[String].head() === "c")
    assert(!Files.exists(java.nio.file.Paths.get(dest + ".tmp")))
    assert(!Files.exists(java.nio.file.Paths.get(dest + ".old")))
  }

  test("recoverOld restores the table after a crash inside the swap window") {
    val dir = Files.createTempDirectory("graft-crash").toString
    val dest = s"$dir/table"
    import spark.implicits._
    TableIO.atomicOverwrite(Seq((1, "a")).toDF("id", "v"), dest)
    // simulate a writer dying between dest→.old and .tmp→dest: the
    // destination is gone, the data stranded at .old
    Files.move(java.nio.file.Paths.get(dest), java.nio.file.Paths.get(dest + ".old"))
    assert(!Files.exists(java.nio.file.Paths.get(dest)))
    TableIO.recoverOld(dest)
    assert(spark.read.parquet(dest).count() === 1)
    assert(!Files.exists(java.nio.file.Paths.get(dest + ".old")))
    // idempotent: a second reconcile (and one with leftovers after a
    // successful commit) is a no-op / cleanup
    TableIO.recoverOld(dest)
    assert(spark.read.parquet(dest).count() === 1)
  }

  test("csv write with quoteAll round-trips multiline cells") {
    val dir = Files.createTempDirectory("graft-io").toString
    import spark.implicits._
    val df = Seq(("t1", "line1\nline2 \"quoted\""), ("t2", "plain")).toDF("task_id", "body")
    TableIO.atomicOverwrite(df, s"$dir/t", format = "csv", quoteAll = true)
    val back = TableIO.readCsv(spark, s"$dir/t")
    assert(back.count() === 2)
    assert(back.filter(col("task_id") === "t1").select("body").as[String].head()
      === "line1\nline2 \"quoted\"")
  }

  test("the CLI lock excludes a different PROCESS, not just a thread") {
    val dir = Files.createTempDirectory("graft-xlock").toString
    val lock = s"$dir/.lock"
    val marker = s"$dir/held"
    // derive the child JVM's classpath from where these classes really
    // live, so a Scala-version or Spark-home change doesn't break the
    // test with a misleading "never started" failure
    def codeDir(c: Class[_]): String =
      java.nio.file.Paths.get(c.getProtectionDomain.getCodeSource.getLocation.toURI).toString
    val sparkJars = new java.io.File(
      codeDir(classOf[org.apache.spark.sql.SparkSession])).getParent + "/*"
    val cp = Seq(codeDir(TableIO.getClass), codeDir(getClass), sparkJars).mkString(":")
    val proc = new ProcessBuilder(
      "java", "-cp", cp, "graft.pipeline.LockHolder", lock, marker, "3000")
      .redirectErrorStream(true).start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (!Files.exists(java.nio.file.Paths.get(marker)) &&
             System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(Files.exists(java.nio.file.Paths.get(marker)),
        "lock-holder process never started")
      // while the other PROCESS holds the lock, acquisition times out
      intercept[IllegalStateException] {
        TableIO.withLock(lock, timeoutMs = 500) { () }
      }
      // once it exits, acquisition succeeds
      proc.waitFor(20, java.util.concurrent.TimeUnit.SECONDS)
      assert(TableIO.withLock(lock, timeoutMs = 5000) { 42 } === 42)
    } finally proc.destroyForcibly()
  }

  test("orc round-trips through the atomic overwrite protocol with pushdown") {
    val dir = Files.createTempDirectory("graft-orc").toString
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    TableIO.atomicOverwrite(df, s"$dir/t", format = "orc")
    val back = TableIO.readOrc(spark, s"$dir/t")
    assert(back.count() === 100)
    assert(back.filter(col("id") === 42L).select("v").as[String].head() === "v42")
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("id") === 42L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,42)"),
      s"expected ORC pushdown in:\n$plan")
  }

  test("readFileMap ingests a directory tree as relpath -> content") {
    val dir = Files.createTempDirectory("graft-files")
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("a.txt"), "alpha")
    Files.writeString(dir.resolve("sub/b.txt"), "beta")
    val m = TableIO.readFileMap(spark, dir.toString).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m === Map("a.txt" -> "alpha", "sub/b.txt" -> "beta"))
  }

  test("archive snapshot copies the table under a timestamped name") {
    val dir = Files.createTempDirectory("graft-arch").toString
    import spark.implicits._
    TableIO.atomicOverwrite(Seq((1, "x")).toDF("id", "v"), s"$dir/t")
    val snap = TableIO.archiveSnapshot(s"$dir/t", s"$dir/archive",
      java.time.ZonedDateTime.of(2026, 1, 2, 3, 4, 5, 0, java.time.ZoneOffset.UTC))
    assert(snap.endsWith("dataset_20260102_030405"))
    assert(spark.read.parquet(snap).count() === 1)
  }
}
