package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scripted fake for docker-free unit tests (SURVEY §5.2). Call log
  * lives in the companion object: closure serialization gives each
  * task its own FakeRunner copy, but local-mode executors share the
  * JVM, so object state is visible to the driver. */
class FakeRunner(script: Map[String, (Int, String)]) extends ProcessRunner {
  def run(cmd: Seq[String], timeoutSec: Int): (Int, String) = {
    FakeRunner.record(cmd)
    script.collectFirst { case (k, v) if cmd.contains(k) => v }.getOrElse((0, ""))
  }
}

object FakeRunner {
  private var log: Vector[Seq[String]] = Vector.empty
  def record(cmd: Seq[String]): Unit = synchronized { log :+= cmd }
  def calls: Vector[Seq[String]] = synchronized(log)
  def reset(): Unit = synchronized { log = Vector.empty }
}

class ValidatorsSpec extends SparkSpec {
  import Validators._

  val stagingCsv = "/root/reference/agents/dp_builder_workspace/staging/datapoints.csv"

  test("pytest output parsing: counts, and no-tests-collected fallback") {
    assert(parsePytestOutput("collected 3 items\n... 3 failed in 0.5s") === (3, 0, 3, 0))
    assert(parsePytestOutput("collected 2 items\n1 failed, 1 passed") === (2, 1, 1, 0))
    assert(parsePytestOutput("collected 2 items\nsome crash") === (2, 0, 2, 0)) // fallback
    assert(parsePytestOutput("1 error") === (0, 0, 0, 1))
  }

  test("fail-first invariant: distinct messages per violation") {
    assert(failFirstCheck(2, passed = 0, failed = 2).valid)
    assert(!failFirstCheck(2, passed = 1, failed = 1).valid)
    assert(failFirstCheck(2, passed = 1, failed = 1).message.contains("passed pre-agent"))
    assert(!failFirstCheck(2, passed = 0, failed = 0).valid)
    assert(failFirstCheck(2, passed = 0, failed = 0).message.contains("no tests failed"))
    assert(!failFirstCheck(2, passed = 0, failed = 1).valid)
    assert(failFirstCheck(2, passed = 0, failed = 1).message.contains("!= expected"))
  }

  test("dockerfile lint: t-bench base or explicit tmux+asciinema") {
    import spark.implicits._
    val rows = Seq(
      ("FROM ghcr.io/laude-institute/t-bench/python-3-13:20250620", true),
      ("FROM ubuntu:24.04\nRUN apt-get install -y tmux asciinema", true),
      ("FROM ubuntu:24.04", false),
      ("no from line tmux asciinema", false)
    ).toDF("dockerfile", "expect")
    assert(dockerfileLint(rows).filter(col("dockerfile_ok") =!= col("expect")).count() === 0)
  }

  test("pure checks over the staging fixture: one genuinely-bad row caught") {
    val checked = pureChecks(TableIO.readCsv(spark, stagingCsv))
    assert(checked.filter(!col("syntax_ok")).count() === 0)
    // draft_dp_a78bda25 has weight key test_typescript_pos_exists but
    // function test_javascript_pos_exists — a real staging-data bug the
    // chain must flag (staging is pre-review, so bad rows are expected)
    val bad = checked.filter(!col("weights_valid"))
      .select("task_id").collect().map(_.getString(0)).toSeq
    assert(bad === Seq("draft_dp_a78bda25"))
  }

  test("validateAll without docker: pure chain verdicts") {
    import spark.implicits._
    val dps = Seq(
      ("good", "FROM x\nRUN tmux asciinema", "def test_a():\n  pass", """{"test_a":1.0}"""),
      ("badweights", "FROM x\nRUN tmux asciinema", "def test_a():\n  pass", """{"test_a":0.4}""")
    ).toDF("task_id", "dockerfile", "test_functions", "test_weights")
    val reports = validateAll(spark, dps, new FakeRunner(Map.empty), runDocker = false)
      .collect().map(r => r.task_id -> r.overall).toMap
    assert(reports === Map("good" -> true, "badweights" -> false))
  }

  test("validateAll with scripted docker: fail-first enforced, cleanup always runs") {
    import spark.implicits._
    val dps = Seq(
      ("allfail", "FROM x\nRUN tmux asciinema", "def test_a():\n  pass\ndef test_b():\n  pass", """{"test_a":0.5,"test_b":0.5}"""),
      ("onepasses", "FROM x\nRUN tmux asciinema", "def test_a():\n  pass\ndef test_b():\n  pass", """{"test_a":0.5,"test_b":0.5}""")
    ).toDF("task_id", "dockerfile", "test_functions", "test_weights")
    FakeRunner.reset()
    val runner = new FakeRunner(Map(
      "build" -> ((0, "built")),
      "run" -> ((1, "collected 2 items\n2 failed"))))
    val reports = validateAll(spark, dps, runner, workers = 1)
      .collect().map(r => r.task_id -> r).toMap
    assert(reports("allfail").overall)
    // every datapoint got an rmi cleanup call (V5)
    assert(FakeRunner.calls.count(_.contains("rmi")) === 2)
  }

  test("verifiedDataset = chain + semi-join, docker-free") {
    import spark.implicits._
    val dps = Seq(
      ("good", "FROM x\nRUN tmux asciinema", "def test_a():\n  pass", """{"test_a":1.0}"""),
      ("bad", "FROM x", "def test_a():\n  pass", """{"test_a":1.0}""")
    ).toDF("task_id", "dockerfile", "test_functions", "test_weights")
    val out = verifiedDataset(spark, dps, new FakeRunner(Map.empty), runDocker = false)
    assert(out.select("task_id").collect().map(_.getString(0)).toSeq === Seq("good"))
  }
}
