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

/** Fake that, at `docker build` time, snapshots every file in the build
  * context — proving the context was materialized BEFORE the build ran
  * (the temp dir is deleted right after the chain). */
class ContextCapturingRunner extends ProcessRunner {
  def run(cmd: Seq[String], timeoutSec: Int): (Int, String) = {
    FakeRunner.record(cmd)
    if (cmd.contains("build")) {
      import scala.jdk.CollectionConverters._
      val ctx = java.nio.file.Paths.get(cmd.last)
      val files = java.nio.file.Files.walk(ctx).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => ctx.relativize(p).toString -> java.nio.file.Files.readString(p))
        .toMap
      ContextCapture.set(files)
      (0, "built")
    }
    else if (cmd.contains("which")) (0, "/usr/bin/tmux")
    else if (cmd.contains("/tests/run-tests.sh")) (1, "collected 1 items\n1 failed")
    else if (cmd.contains("run")) (0, "containerid")
    else (0, "")
  }
}

object ContextCapture {
  private var s: Option[Map[String, String]] = None
  def set(m: Map[String, String]): Unit = synchronized { s = Some(m) }
  def seen: Option[Map[String, String]] = synchronized(s)
  def reset(): Unit = synchronized { s = None }
}

class ValidatorsSpec extends SparkSpec {
  import Validators._

  val stagingCsv = "/root/reference/agents/dp_builder_workspace/staging/datapoints.csv"

  test("pytest output parsing: counts, and no-tests-collected fallback") {
    assert(parsePytestOutput("collected 3 items\n... 3 failed in 0.5s") === (3, 0, 3, 0))
    assert(parsePytestOutput("collected 2 items\n1 failed, 1 passed") === (2, 1, 1, 0))
    assert(parsePytestOutput("collected 2 items\nsome crash") === (2, 0, 2, 0)) // fallback
    assert(parsePytestOutput("1 error") === (0, 0, 0, 1))
    // an all-errors run keeps errors as errors — the failed:=collected
    // fallback applies only when NOTHING was parsed (validators.py:723-725);
    // otherwise errors==expected would wrongly pass the fail-first check
    assert(parsePytestOutput("collected 2 items\n2 errors") === (2, 0, 0, 2))
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
      ("otherone", "FROM x\nRUN tmux asciinema", "def test_a():\n  pass\ndef test_b():\n  pass", """{"test_a":0.5,"test_b":0.5}""")
    ).toDF("task_id", "dockerfile", "test_functions", "test_weights")
    FakeRunner.reset()
    val runner = new FakeRunner(Map(
      "build" -> ((0, "built")),
      "run" -> ((0, "containerid")),
      "which" -> ((0, "/usr/bin/tmux")),
      "/tests/run-tests.sh" -> ((1, "collected 2 items\n2 failed"))))
    val reports = validateAll(spark, dps, runner, workers = 1)
      .collect().map(r => r.task_id -> r).toMap
    assert(reports("allfail").overall)
    // every datapoint got image rmi AND container stop/rm cleanup (V5)
    assert(FakeRunner.calls.count(_.contains("rmi")) === 2)
    assert(FakeRunner.calls.count(_.contains("stop")) === 2)
  }

  test("invalid test syntax short-circuits V4: the image still builds " +
    "(DockerfileValidator precedes the syntax check) but no container " +
    "ever starts, with the reference's prerequisite message") {
    import spark.implicits._
    val dps = Seq(
      // bad grammar: the lexical gate flags the unterminated def
      ("badsyntax", "FROM x\nRUN tmux asciinema",
        "def test_a(:\n  pass", """{"test_a":1.0}"""),
      // clean parse, zero test functions: also not executable
      ("notests", "FROM x\nRUN tmux asciinema",
        "def helper():\n  pass", """{}""")
    ).toDF("task_id", "dockerfile", "test_functions", "test_weights")
    FakeRunner.reset()
    val runner = new FakeRunner(Map(
      "build" -> ((0, "built")),
      "run" -> ((0, "containerid")),
      "which" -> ((0, "/usr/bin/tmux")),
      "/tests/run-tests.sh" -> ((1, "collected 1 items\n1 failed"))))
    val reports = validateAll(spark, dps, runner, workers = 1)
      .collect().map(r => r.task_id -> r).toMap
    for (id <- Seq("badsyntax", "notests")) {
      val v4 = reports(id).stages.find(_.stage == "container_execution").get
      assert(!v4.valid)
      assert(v4.message === "Cannot execute tests - no test content available",
        s"$id: expected the reference's validators.py:347-352 message")
      assert(!reports(id).overall)
    }
    // the build ran per datapoint, cleanup ran, but docker run never did
    assert(FakeRunner.calls.count(_.contains("build")) === 2)
    assert(FakeRunner.calls.count(_.contains("rmi")) === 2)
    assert(!FakeRunner.calls.exists(_.contains("run")),
      "a container started for a row V4 cannot execute")
  }

  test("docker build receives a real build context: dockerfile, additional " +
    "files, and the pytest harness all materialized before the build") {
    import spark.implicits._
    val af = """{"app/config.json": "{\"k\": 1}"}"""
    val dps = Seq(
      ("ctxdp", "FROM x\nRUN tmux asciinema", "def test_a():\n  pass", """{"test_a":1.0}""", af)
    ).toDF("task_id", "dockerfile", "test_functions", "test_weights", "additional_files")
    FakeRunner.reset()
    ContextCapture.reset()
    val runner = new ContextCapturingRunner
    val reports = validateAll(spark, dps, runner, workers = 1)
      .collect().map(r => r.task_id -> r).toMap
    assert(reports("ctxdp").stages.exists(s => s.stage == "docker_build" && s.valid))
    val seen = ContextCapture.seen.getOrElse(fail("build never saw a context"))
    assert(seen("Dockerfile") === "FROM x\nRUN tmux asciinema")
    assert(seen("app/config.json") === """{"k": 1}""")
    assert(seen("tests/test_outputs.py") === "def test_a():\n  pass")
    assert(seen.contains("tests/setup-pytest.sh"))
    assert(seen.contains("tests/run-pytest.sh"))
    assert(seen.contains("run-tests.sh"))
    // the build command is `-f <ctx>/Dockerfile <ctx>` — never stdin
    val build = FakeRunner.calls.find(_.contains("build")).get
    assert(!build.contains("-"))
    assert(build.contains("-f"))
    // and docker cp ships the same context into the container at /tests
    assert(FakeRunner.calls.exists(c => c.contains("cp") && c.last.endsWith(":/tests")))
  }

  test("malformed additional_files JSON rejects the build before docker runs") {
    import spark.implicits._
    val dps = Seq(
      ("badjson", "FROM x\nRUN tmux asciinema", "def test_a():\n  pass", """{"test_a":1.0}""", "[1,2]")
    ).toDF("task_id", "dockerfile", "test_functions", "test_weights", "additional_files")
    FakeRunner.reset()
    val reports = validateAll(spark, dps, new FakeRunner(Map.empty), workers = 1)
      .collect().map(r => r.task_id -> r).toMap
    val buildStage = reports("badjson").stages.find(_.stage == "docker_build").get
    assert(!buildStage.valid)
    assert(buildStage.message.contains("not a JSON object"))
    assert(FakeRunner.calls.isEmpty) // no docker command ever ran
  }

  test("nested (non-string) additional_files values are rejected, " +
    "not written as empty files") {
    val r = BuildContext.parseFileMap("""{"app/config.json": {"k": 1}}""")
    assert(r.isLeft)
    assert(r.left.exists(_.contains("not a string")))
    // null/number/boolean would materialize as literal "null"/"123"
    assert(BuildContext.parseFileMap("""{"a.txt": null}""").isLeft)
    assert(BuildContext.parseFileMap("""{"a.txt": 123}""").isLeft)
    // plain string values still parse
    assert(BuildContext.parseFileMap("""{"a.txt": "hi"}""") === Right(Map("a.txt" -> "hi")))
  }

  test("hostile additional_files paths cannot escape the build context") {
    val dir = java.nio.file.Files.createTempDirectory("ctx-escape-")
    try {
      val err = BuildContext.materialize(dir, "FROM x",
        """{"../../etc/evil": "x"}""", "def test_a(): pass")
      assert(err.exists(_.contains("escapes build context")))
      // a path the filesystem can't represent (embedded NUL) must fail
      // the same way — as a message, not an InvalidPathException that
      // would kill the executor task
      val nul = BuildContext.materialize(dir, "FROM x",
        "{\"a\\u0000b\": \"x\"}", "def test_a(): pass")
      assert(nul.exists(_.contains("escapes build context")))
    } finally BuildContext.deleteRecursive(dir)
  }

  test("V2 lexical scan rejects unbalanced parens, unterminated " +
    "triple-quotes, and mixed-tab files with distinct messages") {
    import spark.implicits._
    val dps = Seq(
      // matches ^def test_ but would never ast.parse: unbalanced parens
      ("parens", "FROM x\nRUN tmux asciinema",
        "def test_a(:\n  assert ((1 == 1\n", """{"test_a":1.0}"""),
      // docstring never closes
      ("triple", "FROM x\nRUN tmux asciinema",
        "def test_b():\n  \"\"\"doc never ends\n  assert True\n", """{"test_b":1.0}"""),
      // a tab line then a spaces line at the SAME block level: ambiguous
      // under tab size 8 vs 1 — CPython TabError (verified on 3.11)
      ("mixedtab", "FROM x\nRUN tmux asciinema",
        "def test_c():\n\tx = 1\n        y = 2\n", """{"test_c":1.0}"""),
      // dedent to a level that was never on the indent stack
      ("unindent", "FROM x\nRUN tmux asciinema",
        "def test_f():\n    if True:\n        x = 1\n      y = 2\n",
        """{"test_f":1.0}"""),
      // single-quoted string broken by a newline
      ("strlit", "FROM x\nRUN tmux asciinema",
        "def test_d():\n  s = 'broken\n  assert True\n", """{"test_d":1.0}"""),
      ("fine", "FROM x\nRUN tmux asciinema",
        "def test_e():\n  assert (1 == 1)\n", """{"test_e":1.0}""")
    ).toDF("task_id", "dockerfile", "test_functions", "test_weights")
    val v2 = validateAll(spark, dps, new FakeRunner(Map.empty), runDocker = false)
      .collect().map(r => r.task_id ->
        r.stages.find(_.stage == "test_syntax").get).toMap
    assert(!v2("parens").valid && v2("parens").message.contains("unbalanced brackets"))
    assert(!v2("triple").valid &&
      v2("triple").message.contains("unterminated triple-quoted"))
    assert(!v2("mixedtab").valid &&
      v2("mixedtab").message.contains("inconsistent use of tabs"))
    assert(!v2("unindent").valid &&
      v2("unindent").message.contains("unindent does not match"))
    assert(!v2("strlit").valid &&
      v2("strlit").message.contains("unterminated string literal"))
    // the five failure messages are pairwise distinct
    val msgs = Seq("parens", "triple", "mixedtab", "unindent", "strlit")
      .map(v2(_).message)
    assert(msgs.distinct.size === 5)
    assert(v2("fine").valid)
  }

  test("V2 lexical scan never false-positives on tricky VALID Python") {
    import spark.implicits._
    val valid = Seq(
      // brackets and quotes inside string literals are content
      "def test_a():\n  s = \")]}\"\n  t = '([{'\n  assert s + t\n",
      // closed docstring with internal quotes and brackets
      "def test_b():\n  \"\"\"doc with ' and \" and ( inside\"\"\"\n  assert True\n",
      // escaped quote inside a string; comment with unbalanced paren
      "def test_c():\n  s = 'don\\'t'\n  # comment with ( unbalanced\n  assert s\n",
      // explicit line join: continuation line's whitespace is not indent
      "def test_d():\n  x = 1 + \\\n \t2\n  assert x == 3\n",
      // tab-after-space inside an open bracket (implicit join) is legal
      "def test_e():\n  xs = [1,\n \t2]\n  assert xs\n",
      // tab-after-space on a comment-only line generates no indent token
      "def test_f():\n \t# just a comment\n  assert True\n",
      // space-then-tab body indent: both tab-size measures agree with
      // the enclosing level -> VALID (ast.parse accepts; the naive
      // tab-after-space rule this scanner deliberately does NOT use
      // would reject it)
      "def test_g():\n \tassert True\n",
      // consistent tabs through nested blocks
      "def test_h():\n\tif True:\n\t\tassert True\n",
      // deeper-and-unambiguous mixed indent (col 9 > 8, alt 6 > 1)
      "def test_i():\n\tif True:\n    \t assert True\n",
      // hanging-indent signature: the continuation line closes its
      // bracket mid-line — the tail ("a):") is NOT indentation
      "def test_foo(\n        a):\n    assert a\n",
      // same, nested one block down with code after the close
      "def test_t():\n    if f(\n            1) == 2:\n        assert True\n",
      // CRLF source with a whitespace-only line inside a block:
      // universal newlines make it blank, not an indent token
      "def test_crlf():\r\n    if True:\r\n  \r\n        assert True\r\n",
      // backslash join immediately before CRLF is still a line join
      "def test_j():\r\n    x = 1 + \\\r\n        2\r\n    assert x\r\n",
      // lone CR is a newline after translate_newlines
      "def test_k():\r    assert True\r"
    ).zipWithIndex.map { case (src, i) =>
      (s"ok$i", "FROM x\nRUN tmux asciinema", src, "{}")
    }.toDF("task_id", "dockerfile", "test_functions", "test_weights")
    val errs = pureChecks(valid).select("task_id", "syntax_err")
      .collect().filter(!_.isNullAt(1))
      .map(r => r.getString(0) -> r.getString(1))
    assert(errs.isEmpty, s"false positives: ${errs.mkString("; ")}")
  }

  private def pythonAvailable: Boolean =
    try new ProcessBuilder("python3", "--version").start()
      .waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
    catch { case _: Exception => false }

  test("V2 grammar gate (pyCompileCheck): catches lexically-clean " +
    "grammatical errors with the reference's exact messages, finds " +
    "test names by ast walk, and never false-positives on the tricky " +
    "valid battery") {
    assume(pythonAvailable, "no python3 on PATH — grammar gate untestable")
    import spark.implicits._
    val rows = Seq(
      // lexically clean (balanced, terminated, consistent indent) but
      // grammatically invalid — the exact SURVEY §7.4.5 stratum the
      // lexical kernel documents as out of reach
      ("doubleeq", "def test_a():\n    x = = 1\n"),
      ("retmod", "def test_b():\n    pass\nreturn 1\n"),
      ("nonlocal", "def test_c():\n    nonlocal missing\n"),
      // grammatical and carrying test functions -> valid
      ("good", "def test_d():\n    assert True\n\ndef test_e():\n    pass\n"),
      // grammatical but no test_ functions -> the reference's no-test message
      ("notests", "def helper():\n    pass\n"),
      // null code cell: treated as empty source
      ("nullcode", null: String)
    ).toDF("task_id", "test_functions")
    val got = Validators.pyCompileCheck(rows)
      .select("task_id", "py_valid", "py_message", "py_test_names")
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getString(2), r.getSeq[String](3)))).toMap
    for (k <- Seq("doubleeq", "retmod", "nonlocal")) {
      assert(!got(k)._1, s"$k should fail the grammar gate")
      assert(got(k)._2.startsWith("Python syntax error at line "),
        s"$k message diverged: ${got(k)._2}")
    }
    // and the lexical kernel passes all three (the documented gap,
    // now closed by the grammar gate)
    val lex = pureChecks(rows.limit(3)
        .withColumn("dockerfile", lit("FROM x\nRUN tmux asciinema"))
        .withColumn("test_weights", lit("{}")))
      .select("task_id", "syntax_err").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    for (k <- Seq("doubleeq", "retmod", "nonlocal"))
      assert(lex(k).isEmpty, s"$k unexpectedly caught lexically: ${lex(k)}")
    assert(got("good")._1 && got("good")._2 == "Found 2 test functions" &&
      got("good")._3.toSet == Set("test_d", "test_e"))
    assert(!got("notests")._1 && got("notests")._2 ==
      "No test functions found (functions should start with 'test_')")
    assert(!got("nullcode")._1)
    // containment: everything the lexical battery rejects fails
    // ast.parse too (lexical ⊆ grammar, the soundness direction)
    val lexBad = Seq(
      "def test_a(:\n  assert ((1 == 1\n",
      "def test_b():\n  \"\"\"doc never ends\n  assert True\n",
      "def test_c():\n\tx = 1\n        y = 2\n",
      "def test_f():\n    if True:\n        x = 1\n      y = 2\n",
      "def test_d():\n  s = 'broken\n  assert True\n")
      .zipWithIndex.map { case (s, i) => (s"bad$i", s) }
      .toDF("task_id", "test_functions")
    val badGot = Validators.pyCompileCheck(lexBad)
      .select("py_valid").collect().map(_.getBoolean(0))
    assert(badGot.forall(!_), "a lexically-rejected snippet passed ast.parse")
    // completeness direction: the tricky VALID battery stays valid
    val tricky = Seq(
      "def test_a():\n  s = \")]}\"\n  t = '([{'\n  assert s + t\n",
      "def test_c():\n  s = 'don\\'t'\n  # comment with ( unbalanced\n  assert s\n",
      "def test_d():\n  x = 1 + \\\n \t2\n  assert x == 3\n",
      "def test_g():\n \tassert True\n",
      "def test_foo(\n        a):\n    assert a\n",
      "def test_crlf():\r\n    if True:\r\n  \r\n        assert True\r\n",
      "def test_k():\r    assert True\r")
      .zipWithIndex.map { case (s, i) => (s"ok$i", s) }
      .toDF("task_id", "test_functions")
    val okGot = Validators.pyCompileCheck(tricky)
      .select("task_id", "py_valid", "py_message").collect()
      .filter(!_.getBoolean(1)).map(r => r.getString(0) + ": " + r.getString(2))
    assert(okGot.isEmpty, s"grammar-gate false positives: ${okGot.mkString("; ")}")
  }

  test("validateAll with pythonGrammar: the V2 stage is the reference's " +
    "ast verdict — a lexically-clean malformed statement now fails in " +
    "V2, not only in V4's container run") {
    assume(pythonAvailable, "no python3 on PATH — grammar gate untestable")
    import spark.implicits._
    val dps = Seq(
      ("sick", "FROM x\nRUN tmux asciinema",
        "def test_a():\n    x = = 1\n", """{"test_a":1.0}"""),
      ("well", "FROM x\nRUN tmux asciinema",
        "def test_b():\n    assert True\n", """{"test_b":1.0}"""))
      .toDF("task_id", "dockerfile", "test_functions", "test_weights")
    val v2 = validateAll(spark, dps, new FakeRunner(Map.empty),
        runDocker = false, pythonGrammar = Some("python3"))
      .collect().map(r => r.task_id ->
        r.stages.find(_.stage == "test_syntax").get).toMap
    assert(!v2("sick").valid &&
      v2("sick").message.startsWith("Python syntax error at line "))
    assert(v2("well").valid && v2("well").message == "Found 1 test functions")
  }

  test("grammar-seam P5 timeout: a wedged interpreter fails the ROW " +
    "with a timeout verdict, is killed on the spot, and the next row " +
    "is served by a fresh child — the task never hangs") {
    assume(pythonAvailable, "no python3 on PATH — recovery half untestable")
    val dir = java.nio.file.Files.createTempDirectory("graft-wedge-")
    try {
      // a scripted wedge: the FIRST interpreter this fake starts sleeps
      // forever (never answers); every later start execs the real
      // python3 — so row 1 must time out and row 2 must succeed on the
      // restarted child
      val state = dir.resolve("wedged-once")
      val starts = dir.resolve("starts")
      val fake = dir.resolve("fakepython")
      java.nio.file.Files.writeString(fake,
        s"""#!/bin/sh
           |echo started >> "$starts"
           |if [ ! -e "$state" ]; then
           |  touch "$state"
           |  exec sleep 600
           |fi
           |exec python3 "$$@"
           |""".stripMargin)
      fake.toFile.setExecutable(true)
      val checker = new PyGrammarChecker(fake.toString, rowTimeoutSec = 2)
      try {
        val t0 = System.nanoTime()
        val (ok, msg, names) = checker.check("def test_a():\n    assert True\n")
        val waited = (System.nanoTime() - t0) / 1e9
        assert(!ok && msg.contains("timed out") && names.isEmpty,
          s"wedged row should fail with the timeout verdict, got ($ok, $msg)")
        assert(waited < 30, s"timeout verdict took ${waited}s — bound not applied")
        // the row failed but the TASK goes on: a fresh interpreter
        // (the real python3 now) serves the next row
        val (ok2, msg2, names2) = checker.check("def test_a():\n    assert True\n")
        assert(ok2 && msg2 == "Found 1 test functions" && names2 == Seq("test_a"))
      } finally checker.close()
      // exactly two interpreter starts: the wedge and its replacement
      val nStarts = java.nio.file.Files.readAllLines(starts).size
      assert(nStarts === 2, s"expected wedge + restart, saw $nStarts starts")
      // close() on a never-used checker must not launch a child just
      // to stop it (the empty-partition completion-listener contract)
      new PyGrammarChecker(fake.toString).close()
      assert(java.nio.file.Files.readAllLines(starts).size === 2)
    } finally TableIO.deleteRecursive(dir)
  }

  test("grammar gate threads the ast walk's names into V4's expected " +
    "count: a def inside a string literal inflates the lexical count " +
    "but not the grammar one, and the two stages agree like the " +
    "reference") {
    assume(pythonAvailable, "no python3 on PATH — grammar gate untestable")
    import spark.implicits._
    // lexical n_tests = 2 (the regex sees the def inside the string);
    // the ast walk (reference `validators.py:215-219`) sees 1
    val code = "def test_a():\n    s = '''\ndef test_fake():\n    pass\n'''\n    assert s\n"
    val dps = Seq(
      ("strdef", "FROM x\nRUN tmux asciinema", code, """{"test_a":1.0}"""))
      .toDF("task_id", "dockerfile", "test_functions", "test_weights")
    val runner = new FakeRunner(Map(
      "build" -> ((0, "built")),
      "run" -> ((0, "containerid")),
      "which" -> ((0, "/usr/bin/tmux")),
      "/tests/run-tests.sh" -> ((1, "collected 1 items\n1 failed"))))
    def v4(pythonGrammar: Option[String]) =
      validateAll(spark, dps, runner, workers = 1,
        pythonGrammar = pythonGrammar)
        .collect().head.stages.find(_.stage == "container_execution").get
    // grammar gate active: expected = len(ast names) = 1 = failed -> pass
    val withGrammar = v4(Some("python3"))
    assert(withGrammar.valid, s"grammar-threaded V4 diverged: $withGrammar")
    // lexical fallback: expected = 2 != 1 failed -> the count mismatch
    // message (the documented regex-vs-ast gap, SURVEY §7.4.5)
    val lexOnly = v4(None)
    assert(!lexOnly.valid && lexOnly.message.contains("!= expected 2"))
  }

  test("real docker integration (opt-in: set GRAFT_DOCKER=1 where a " +
    "daemon exists; sandbox has none)") {
    assume(sys.env.get("GRAFT_DOCKER").contains("1"),
      "GRAFT_DOCKER != 1 — skipping live docker build/exec")
    import spark.implicits._
    // a real daemon run of the full V1→V4→V5 chain through
    // SubprocessRunner: build context materialization, docker build,
    // container exec with the fail-first invariant, cleanup in finally
    val dps = Seq(
      ("it1", "FROM ghcr.io/laude-institute/t-bench/python-3-13:20250620",
        "def test_a():\n  assert False\n", """{"test_a":1.0}""")
    ).toDF("task_id", "dockerfile", "test_functions", "test_weights")
    val reports = validateAll(spark, dps, new SubprocessRunner, workers = 1)
      .collect()
    assert(reports.length === 1)
    val byStage = reports.head.stages.map(s => s.stage -> s).toMap
    assert(byStage.contains("docker_build") && byStage.contains("container_execution"),
      s"expected live build+exec stages, got: ${reports.head.stages}")
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
