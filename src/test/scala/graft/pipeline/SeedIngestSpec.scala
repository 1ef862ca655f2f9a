package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

class SeedIngestSpec extends SparkSpec {

  def mkTree(): String = {
    val root = Files.createTempDirectory("graft-seeds")
    val t1 = root.resolve("task-alpha"); Files.createDirectories(t1.resolve("tests"))
    Files.writeString(t1.resolve("task.yaml"),
      "# BENCHMARK DATA SHOULD NEVER APPEAR here\npreamble\ninstruction: |\n  do the thing\n")
    Files.writeString(t1.resolve("Dockerfile"),
      "# terminal-bench-canary GUID x\n# comment\nFROM ubuntu:24.04\nRUN apt-get install -y tmux\n")
    Files.writeString(t1.resolve("tests/test_outputs.py"),
      """# BENCHMARK DATA SHOULD NEVER APPEAR
        |# This is a template test file
        |# provided by the test harness
        |
        |import os
        |
        |
        |
        |def test_a():
        |    assert os.path.exists("/x")
        |""".stripMargin)
    val t2 = root.resolve("task-beta"); Files.createDirectories(t2)
    // no FROM: dockerfile falls back to canary-line stripping
    Files.writeString(t2.resolve("Dockerfile"),
      "# terminal-bench-canary GUID y\nRUN echo hi\n")
    root.toString
  }

  test("ingest: one row per task dir, cleaned fields, test-file map") {
    val seeds = SeedIngest.ingest(spark, mkTree()).collect()
    assert(seeds.map(_.getAs[String]("task_name")).toSeq === Seq("task-alpha", "task-beta"))

    val alpha = seeds(0)
    // task.yaml cut to instruction:
    assert(alpha.getAs[String]("task_yaml") === "instruction: |\n  do the thing")
    // dockerfile cut to FROM
    assert(alpha.getAs[String]("dockerfile").startsWith("FROM ubuntu:24.04"))
    // test file: canary + template block removed, blank runs collapsed
    val tests = alpha.getAs[Map[String, String]]("test_files")
    assert(tests.keySet === Set("test_outputs.py"))
    val cleaned = tests("test_outputs.py")
    assert(!cleaned.contains("BENCHMARK") && !cleaned.contains("template test file")
      && !cleaned.contains("test harness"))
    assert(cleaned === "import os\n\ndef test_a():\n    assert os.path.exists(\"/x\")")

    val beta = seeds(1)
    assert(beta.getAs[String]("dockerfile") === "RUN echo hi")
    assert(beta.getAs[String]("task_yaml") === null)
  }

  test("seedTasks loads coordination rows into the TaskStore") {
    val store = new TaskStore()
    val n = SeedIngest.seedTasks(store, SeedIngest.ingest(spark, mkTree()))
    assert(n === 2)
    assert(store.getStatusSummary("pending") === 2L)
    assert(store.getTask("seed_dp_task-alpha").nonEmpty)
  }
}
