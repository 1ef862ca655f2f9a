package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.matching.Regex

/** One validator's outcome (reference `ValidationResult`,
  * `validators.py:18-23`). */
case class StageResult(stage: String, valid: Boolean, message: String,
                       details: Map[String, String] = Map.empty)

/** Full per-datapoint report from the four-validator chain. */
case class ValidationReport(task_id: String, overall: Boolean,
                            stages: Seq[StageResult])

/** Boundary for external processes (docker build/run/exec/rm) so the
  * chain is unit-testable with a fake and docker-free environments can
  * still exercise the dataflow (SURVEY §5.2). `run` returns
  * (exitCode, stdout+stderr).
  */
trait ProcessRunner extends Serializable {
  def run(cmd: Seq[String], timeoutSec: Int): (Int, String)
}

/** Materializes the docker build context + test harness on local disk
  * before any docker command runs (reference `_build_dockerfile`,
  * `validators.py:102-137`, and `_create_test_infrastructure`,
  * `validators.py:449-570`): the Dockerfile and every `additional_files`
  * entry become real files under a temp dir, and the pytest harness
  * (`tests/test_outputs.py`, `tests/setup-pytest.sh`,
  * `tests/run-pytest.sh`, `run-tests.sh`) is written alongside so
  * `docker cp ctx/. container:/tests` gives the container everything
  * `bash /tests/run-tests.sh` needs. Without this the build has no
  * context at all (r1 ADVICE: `docker build … -` blocked on stdin).
  */
object BuildContext {
  import java.nio.file.{Files, Path}

  private val setupPytestSh =
    """#!/bin/bash
      |PY=python3; command -v python3 >/dev/null 2>&1 || PY=python
      |command -v "$PY" >/dev/null 2>&1 || { echo "ERROR: no python interpreter"; exit 1; }
      |if ! "$PY" -m pytest --version >/dev/null 2>&1; then
      |  pip install pytest 2>/dev/null || pip3 install pytest 2>/dev/null || \
      |    { apt-get update && apt-get install -y python3-pytest; } || \
      |    { echo "ERROR: could not install pytest"; exit 1; }
      |fi
      |""".stripMargin

  private val runPytestSh =
    """#!/bin/bash
      |PY=python3; command -v python3 >/dev/null 2>&1 || PY=python
      |"$PY" -m pytest "$TEST_DIR"/test_outputs.py -rA
      |""".stripMargin

  private val runTestsSh =
    """#!/bin/bash
      |export TEST_DIR=/tests/tests
      |source "$TEST_DIR"/setup-pytest.sh
      |bash "$TEST_DIR"/run-pytest.sh
      |""".stripMargin

  /** Parse an `additional_files` JSON cell into path→content. Jackson is
    * already on Spark's classpath; runs on executors inside
    * mapPartitions. Empty/blank cells are an empty map; a non-object or
    * unparseable cell is an error (the reference rejects the build,
    * `validators.py:110-120`). */
  def parseFileMap(json: String): Either[String, Map[String, String]] = {
    if (json == null || json.trim.isEmpty) Right(Map.empty)
    else
      try {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.readTree(json)
        if (!node.isObject) Left("additional_files is not a JSON object")
        else {
          val it = node.fields()
          val b = Map.newBuilder[String, String]
          var bad: Option[String] = None
          while (it.hasNext && bad.isEmpty) {
            val e = it.next()
            // only STRING values are file contents: an object/array would
            // materialize as an empty file via asText(), and null/number/
            // boolean as the literal "null"/"123" — reject like the
            // reference rejects a malformed map (`validators.py:110-120`)
            if (!e.getValue.isTextual)
              bad = Some(s"additional_files value for '${e.getKey}' is not a string")
            else b += e.getKey -> e.getValue.asText()
          }
          bad.toLeft(b.result())
        }
      } catch {
        case e: Exception => Left(s"Failed to parse additional_files JSON: ${e.getMessage}")
      }
  }

  /** Write Dockerfile + additional files + test harness under `dir`.
    * Returns an error message instead of a populated context when the
    * file map is malformed. */
  def materialize(dir: Path, dockerfile: String, additionalFilesJson: String,
                  testFunctions: String): Option[String] = {
    Files.writeString(dir.resolve("Dockerfile"),
      Option(dockerfile).getOrElse(""))
    parseFileMap(additionalFilesJson) match {
      case Left(err) => Some(err)
      case Right(files) =>
        // keep hostile relative paths inside the context; a blank path
        // (or one normalizing to the context root, e.g. "." or "a/..")
        // resolves to the dir itself — writeString on a directory would
        // throw on the executor and kill the job instead of producing a
        // failed StageResult, so reject it here with the escapers
        val escaping = files.keys.find { rel =>
          // a path the filesystem can't even represent (NUL and friends
          // throw InvalidPathException from resolve) is as hostile as an
          // escaping one — treat it the same instead of letting the
          // exception kill the executor task
          try {
            val resolved = dir.resolve(rel).normalize()
            rel.isBlank || !resolved.startsWith(dir) || resolved == dir.normalize()
          } catch {
            case _: java.nio.file.InvalidPathException => true
          }
        }
        if (escaping.isDefined)
          return Some(s"additional_files path escapes build context: '${escaping.get}'")
        files.foreach { case (rel, content) =>
          val p = dir.resolve(rel).normalize()
          Files.createDirectories(p.getParent)
          Files.writeString(p, content)
        }
        val tests = dir.resolve("tests")
        Files.createDirectories(tests)
        Files.writeString(tests.resolve("test_outputs.py"),
          Option(testFunctions).getOrElse(""))
        Files.writeString(tests.resolve("setup-pytest.sh"), setupPytestSh)
        Files.writeString(tests.resolve("run-pytest.sh"), runPytestSh)
        Files.writeString(dir.resolve("run-tests.sh"), runTestsSh)
        None
    }
  }

  def deleteRecursive(p: Path): Unit = TableIO.deleteRecursive(p)
}

/** One CPython interpreter running the reference's ACTUAL V2 check —
  * `ast.parse` + `compile` + an `ast.walk` collecting `test_`
  * FunctionDefs (`validators.py:194-219`, messages mirrored verbatim
  * incl. the `line {lineno}: {msg}\n{text}` syntax-error shape and the
  * walk finding NESTED test functions the top-level regex cannot).
  *
  * Protocol: lockstep base64 lines over stdin/stdout — one request,
  * one `<0|1>\t<b64 message>\t<b64 comma-joined names>` response
  * (names base64'd too: PEP-3131 identifiers may be non-ASCII and a
  * non-UTF-8 child locale would otherwise die encoding them), flushed
  * per row, so a long-lived process serves a whole partition with no
  * temp files and bounded memory. This is the executor-side shape of
  * every "call a local model/tool per row" pipeline stage: ONE
  * interpreter per partition, rows streamed through it, never a
  * process per row (fork cost) and never a file handoff (IO + cleanup).
  *
  * The P5 timeout discipline (the reference's 10-min subprocess bound,
  * `validate_all_prod_dps.py:34`) reaches this seam too: each row's
  * response wait is bounded by `rowTimeoutSec`. A wedged child fails
  * the ROW, not the task — the child is killed on the spot and the
  * next row starts a fresh interpreter, so one pathological source
  * blob costs one timeout, never the partition. Responses are read by
  * a daemon pump thread into a queue (a blocked `readLine` cannot be
  * interrupted; a poll on the queue can time out), one thread per
  * live interpreter, dying with it.
  *
  * Needs a CPython on the executor image (`python3` by default) — the
  * same class of dependency as the docker CLI for V1/V4, and the
  * reason the zero-dependency lexical kernel
  * ([[graft.functions.PySyntaxKernel]]) stays the scan-side gate. */
final class PyGrammarChecker(python: String = "python3",
    rowTimeoutSec: Int = PyGrammarChecker.RowTimeoutSec) {
  import java.nio.charset.StandardCharsets.UTF_8
  import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

  private val script =
    """import sys, ast, base64
      |for line in sys.stdin:
      |    s = line.strip()
      |    code = base64.b64decode(s).decode("utf-8") if s else ""
      |    try:
      |        tree = ast.parse(code, filename="test_functions")
      |        compile(tree, "test_functions", "exec")
      |        ns = [n.name for n in ast.walk(tree)
      |              if isinstance(n, ast.FunctionDef) and n.name.startswith("test_")]
      |        if not ns:
      |            ok, msg = False, "No test functions found (functions should start with 'test_')"
      |        else:
      |            ok, msg = True, "Found %d test functions" % len(ns)
      |    except SyntaxError as e:
      |        ok, msg, ns = False, "Python syntax error at line %s: %s\n%s" % (e.lineno, e.msg, e.text), []
      |    except Exception as e:
      |        ok, msg, ns = False, "Python compilation error: %s" % str(e), []
      |    sys.stdout.write(("1" if ok else "0") + "\t" +
      |        base64.b64encode(msg.encode("utf-8")).decode("ascii") + "\t" +
      |        base64.b64encode(",".join(ns).encode("utf-8")).decode("ascii") +
      |        "\n")
      |    sys.stdout.flush()
      |""".stripMargin

  // the live child and its plumbing, null until the first row needs an
  // interpreter (an empty partition's task-completion listener must not
  // START python just to stop it) and again after a timeout kill. A
  // tracked FIELD, never a lazy val: close() must operate on the
  // process that actually started — re-forcing a failed lazy
  // initializer from the completion listener would rethrow out of
  // close() and mask the original task failure.
  @volatile private var proc: Process = _
  @volatile private var writer: java.io.BufferedWriter = _
  @volatile private var lines: LinkedBlockingQueue[AnyRef] = _

  /** Queue sentinel: the child's stdout reached EOF (it exited). */
  private object Eof

  private def startChild(): Unit = {
    val pb = new ProcessBuilder(python, "-c", script)
    // DISCARD stderr rather than leave the pipe undrained: compile()
    // emits SyntaxWarnings for common patterns in arbitrary code
    // (invalid escape sequences, assert-on-tuple), and a partition
    // heavy in them would fill the 64 KB pipe and deadlock the child
    // mid-row while the parent blocks on the response
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    proc = p
    writer = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(p.getOutputStream, UTF_8))
    val q = new LinkedBlockingQueue[AnyRef]()
    lines = q
    val rd = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream, UTF_8))
    val pump = new Thread(() => {
      try {
        var l = rd.readLine()
        while (l != null) { q.put(l); l = rd.readLine() }
      } catch { case _: Exception => () }
      finally q.put(Eof)
    }, "py-grammar-pump")
    pump.setDaemon(true)
    pump.start()
  }

  private def killChild(): Unit = {
    val p = proc
    proc = null; writer = null; lines = null
    if (p != null) try p.destroyForcibly() catch { case _: Exception => () }
  }

  /** (valid, message, test function names) for one source blob. A
    * response not arriving within `rowTimeoutSec` fails THIS row with
    * a timeout verdict (and kills the wedged child; the next row gets
    * a fresh one) — the task never hangs on one pathological input. */
  def check(code: String): (Boolean, String, Seq[String]) = {
    if (proc == null || !proc.isAlive) { killChild(); startChild() }
    writer.write(java.util.Base64.getEncoder.encodeToString(
      Option(code).getOrElse("").getBytes(UTF_8)))
    writer.newLine(); writer.flush()
    lines.poll(rowTimeoutSec.toLong, TimeUnit.SECONDS) match {
      case null =>
        killChild()
        (false, s"Python grammar check timed out after ${rowTimeoutSec}s",
          Seq.empty)
      case Eof => sys.error(s"$python grammar checker exited mid-row")
      case line: String =>
        val parts = line.split("\t", -1)
        // a child dying mid-write can hand back a truncated line: fail
        // with the diagnostic, not an index error
        if (parts.length < 3) sys.error(
          s"$python grammar checker emitted a truncated response: '$line'")
        val msg =
          new String(java.util.Base64.getDecoder.decode(parts(1)), UTF_8)
        val namesCsv =
          new String(java.util.Base64.getDecoder.decode(parts(2)), UTF_8)
        val names =
          if (namesCsv.isEmpty) Seq.empty[String] else namesCsv.split(",").toSeq
        (parts(0) == "1", msg, names)
    }
  }

  def close(): Unit = {
    val p = proc
    if (p != null) {
      try writer.close() catch { case _: Exception => () }
      try {
        if (!p.waitFor(10, TimeUnit.SECONDS)) p.destroyForcibly()
      } catch { case _: Exception => p.destroyForcibly() }
    }
  }
}

object PyGrammarChecker {
  /** Default per-row response bound — the P5 subprocess discipline
    * (reference `validate_all_prod_dps.py:34`, 10 minutes) applied to
    * the grammar seam. Generous on purpose: CPython raises
    * RecursionError/MemoryError (caught child-side) long before this
    * on real pathological sources, so the bound only ever fires on a
    * genuinely wedged interpreter. */
  val RowTimeoutSec: Int = 600
}

/** Real subprocess runner with per-task timeout (P5;
  * `validate_all_prod_dps.py:34,57-85` — 10 min default). */
class SubprocessRunner extends ProcessRunner {
  def run(cmd: Seq[String], timeoutSec: Int): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new java.io.ByteArrayOutputStream()
    val drainer = new Thread(() => p.getInputStream.transferTo(out))
    drainer.start()
    val finished = p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) { p.destroyForcibly(); (124, "timeout") }
    else { drainer.join(5000); (p.exitValue(), out.toString("UTF-8")) }
  }
}

/** The four-validator chain (SURVEY §2.7), Spark-first:
  *
  *  - V2 (test syntax) and V3 (weights) are pure column logic — they
  *    run codegen'd inside the scan, no external processes;
  *  - V1 (docker build) and V4 (container execution) are effectful —
  *    they run in [[validateAll]] via `mapPartitions` with bounded
  *    parallelism (`repartition(workers)` mirrors the reference's
  *    4-process pool, `validate_all_prod_dps.py:306-310`), each row
  *    shelling out through a [[ProcessRunner]];
  *  - chain semantics match `validate_datapoint.py:45-79`: every stage
  *    runs even after a failure; overall = all stages valid;
  *  - the fail-first invariant (`validators.py:377-410`): ALL tests
  *    must fail pre-agent; any pass, zero failures, or count mismatch
  *    rejects with distinct messages; "no tests collected" ⇒
  *    failed := total fallback (`validators.py:723-725`).
  */
object Validators {

  // ---- V2/V3 pure parts, as a single declarative pass ----

  /** Dockerfile dependency lint (pure part of V1;
    * `validators.py:82-100`): the t-bench base image implies tmux +
    * asciinema; any other base must install both explicitly. */
  def dockerfileLint(df: DataFrame, dockerfileCol: String = "dockerfile"): DataFrame = {
    val d = col(dockerfileCol)
    val isTbenchBase = d.contains("ghcr.io/laude-institute/t-bench/")
    df.withColumn("dockerfile_ok",
      d.isNotNull && d.contains("FROM") &&
        (isTbenchBase || (d.contains("tmux") && d.contains("asciinema"))))
  }

  /** Pure V2+V3 over a datapoint table: test-name extraction, import
    * classification, weight checks. One projection, no shuffle. */
  def pureChecks(df: DataFrame): DataFrame = {
    val withWeights = DatapointOps.validateWeights(df)
    val problematic = Seq("requests", "urllib", "socket", "subprocess")
    dockerfileLint(withWeights)
      .withColumn("test_names", DatapointOps.testNames(col("test_functions")))
      .withColumn("n_tests", size(col("test_names")))
      // tokenizer-level lexical scan ([[graft.functions.PySyntaxKernel]]):
      // unbalanced brackets (string/comment-aware — a ')' in a literal
      // is content), unterminated single/triple-quoted strings, and
      // tab-after-space indentation all REJECT at V2 with distinct
      // messages, narrowing the documented regex-vs-ast.parse
      // divergence (SURVEY §7.4.5) to genuinely grammatical errors,
      // which still surface only in V4's container run
      .withColumn("syntax_err",
        graft.functions.PySyntaxExpression.pySyntaxError(col("test_functions")))
      .withColumn("syntax_ok",
        size(col("test_names")) >= 1 && col("syntax_err").isNull)
      .withColumn("problematic_imports",
        array_sort(array_intersect(
          regexp_extract_all(col("test_functions"),
            lit("(?m)^\\s*(?:import|from)\\s+(\\w+)"), lit(1)),
          array(problematic.map(lit): _*))))
  }

  /** GRAMMAR-level V2 over a table — the reference's actual
    * `_validate_python_syntax` (`validators.py:194-219`) run
    * distributedly: appends `py_valid`, `py_message` and
    * `py_test_names` (the ast-walk names, nested test functions
    * included) to every row. ONE CPython per partition, rows streamed
    * through it lockstep ([[PyGrammarChecker]]); cleanup rides the
    * task-completion listener so a failed task never leaks the
    * interpreter. Strictly stronger than the scan-side lexical kernel
    * (everything [[graft.functions.PySyntaxExpression]] rejects fails
    * `ast.parse` too — spec-pinned), which remains the
    * zero-dependency gate for environments without a python on the
    * executor image. */
  def pyCompileCheck(df: DataFrame, codeCol: String = "test_functions",
                     python: String = "python3"): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = df.schema
      .add("py_valid", BooleanType)
      .add("py_message", StringType)
      .add("py_test_names", ArrayType(StringType, containsNull = false))
    val idx = df.schema.fieldIndex(codeCol)
    val ds = df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val checker = new PyGrammarChecker(python)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => checker.close()))
        it.map { row =>
          val (ok, msg, names) = checker.check(row.getString(idx))
          org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(ok, msg, names))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    ds.toDF()
  }

  // ---- pytest output parsing (A6/C9) ----

  private val collectedRe: Regex = """collected (\d+) items?""".r
  private val failedRe: Regex = """(\d+) failed""".r
  private val passedRe: Regex = """(\d+) passed""".r
  private val errorRe: Regex = """(\d+) error""".r

  /** Parse a pytest run's output into (collected, passed, failed,
    * errors); reference `validators.py:649-731`. */
  def parsePytestOutput(out: String): (Int, Int, Int, Int) = {
    val collected = collectedRe.findFirstMatchIn(out).map(_.group(1).toInt).getOrElse(0)
    val passed = passedRe.findFirstMatchIn(out).map(_.group(1).toInt).getOrElse(0)
    var failed = failedRe.findFirstMatchIn(out).map(_.group(1).toInt).getOrElse(0)
    val errors = errorRe.findFirstMatchIn(out).map(_.group(1).toInt).getOrElse(0)
    // "no results parsed at all" ⇒ failed := total (`validators.py:723-725`);
    // an all-errors run reports its errors as errors, NOT as failures —
    // the fallback applies only when passed+failed+errors == 0
    if (failed == 0 && passed == 0 && errors == 0 && collected > 0) failed = collected
    (collected, passed, failed, errors)
  }

  /** The fail-first invariant (`validators.py:377-410`): pre-agent, all
    * expected tests must fail. Distinct messages per violation. */
  def failFirstCheck(expected: Int, passed: Int, failed: Int): StageResult =
    if (passed > 0)
      StageResult("container_execution", valid = false,
        s"$passed test(s) passed pre-agent; all must fail")
    else if (failed == 0)
      StageResult("container_execution", valid = false,
        "no tests failed pre-agent; expected all to fail")
    else if (failed != expected)
      StageResult("container_execution", valid = false,
        s"failed count $failed != expected $expected")
    else StageResult("container_execution", valid = true, s"all $failed tests fail pre-agent")

  // ---- full chain over a Dataset ----

  /** Run the whole chain over a datapoint table. Pure stages evaluate
    * as columns first; effectful stages run inside mapPartitions with
    * `workers`-bounded parallelism (docker daemon is the scarce
    * resource). The result is cached by the caller before any reuse so
    * docker work never re-executes on plan recompute (SURVEY §7.4.3).
    */
  def validateAll(spark: SparkSession, dps: DataFrame, runner: ProcessRunner,
                  workers: Int = 4, execTimeoutSec: Int = 600,
                  runDocker: Boolean = true,
                  pythonGrammar: Option[String] = None): Dataset[ValidationReport] = {
    import spark.implicits._
    val afCol =
      if (dps.columns.contains("additional_files")) col("additional_files")
      else lit("").as("additional_files")
    val pure = pureChecks(dps).select(
      col("task_id"), col("dockerfile"), col("dockerfile_ok"),
      col("test_functions"), afCol,
      col("syntax_ok"), col("syntax_err"), col("n_tests"), col("test_names"),
      col("weights_valid"), col("w_sum"),
      col("missing_weights"), col("extra_weights"))
    pure.repartition(workers).mapPartitions { rows =>
      // grammar-level V2 when an interpreter is available: the
      // reference's ast.parse + compile verdict replaces the
      // lexical-only one; one interpreter per partition, closed with
      // the task (the [[pyCompileCheck]] shape inlined into the chain)
      val grammar = pythonGrammar.map { py =>
        val c = new PyGrammarChecker(py)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => c.close()))
        c
      }
      rows.map { r =>
        val taskId = r.getAs[String]("task_id")
        val v1lint = StageResult("dockerfile_lint", r.getAs[Boolean]("dockerfile_ok"),
          if (r.getAs[Boolean]("dockerfile_ok")) "dependency lint ok"
          else "missing FROM or tmux/asciinema deps")
        // when the grammar gate is active, V4's expected count comes
        // from the SAME ast walk as the V2 verdict (the reference
        // derives expected_tests from len(test_names) of that walk,
        // `validators.py:215-219`) — nested test_ functions the
        // top-level lexical regex cannot see are counted, so V2 and V4
        // can never disagree on what "all tests fail" means
        val (v2, expectedTests) = grammar match {
          case Some(c) =>
            val (ok, msg, names) = c.check(r.getAs[String]("test_functions"))
            (StageResult("test_syntax", ok, msg), names.length)
          case None =>
            val lexErr = r.getAs[String]("syntax_err")
            (StageResult("test_syntax", r.getAs[Boolean]("syntax_ok"),
              if (lexErr != null) lexErr
              else s"${r.getAs[Int]("n_tests")} test function(s) found " +
                "(lexically clean; grammar-level validity is confirmed by " +
                "the container run, SURVEY §7.4.5)"),
              r.getAs[Int]("n_tests"))
        }
        val v3 = StageResult("test_weights", r.getAs[Boolean]("weights_valid"),
          if (r.getAs[Boolean]("weights_valid")) "weights valid"
          else s"sum=${r.getAs[Double]("w_sum")} missing=${r.getAs[Seq[String]]("missing_weights").mkString(",")} extra=${r.getAs[Seq[String]]("extra_weights").mkString(",")}")
        val effectful: Seq[StageResult] =
          if (!runDocker) Nil
          else runDockerStages(runner, taskId,
            dockerfile = r.getAs[String]("dockerfile"),
            additionalFilesJson = r.getAs[String]("additional_files"),
            testFunctions = r.getAs[String]("test_functions"),
            expectedTests = expectedTests,
            execTimeoutSec = execTimeoutSec,
            // the reference only puts test_names into the pipeline
            // context when the syntax verdict is valid
            // (`validators.py:171-174`), so a failed V2 — or a clean
            // parse that found zero test functions — means V4 never
            // starts a container (`validators.py:347-352`); the build
            // itself still runs (DockerfileValidator precedes the
            // syntax check unconditionally, `validate_datapoint.py:48-53`)
            execReady = v2.valid && expectedTests > 0)
        val stages = Seq(v1lint, v2, v3) ++ effectful
        ValidationReport(taskId, stages.forall(_.valid), stages)
      }
    }
  }

  /** V1 + V4 with real side effects, one datapoint (runs on an executor
    * inside `mapPartitions`). Mirrors the reference end to end:
    *  - V1: materialize Dockerfile + additional_files into a temp build
    *    context, `docker build --no-cache --force-rm -f ctx/Dockerfile
    *    ctx` (`validators.py:102-137`) — never stdin;
    *  - V4: start a long-lived container (`docker run -d … sleep
    *    infinity`), require tmux + asciinema (`validators.py:602-620`),
    *    `docker cp ctx/. container:/tests`, `docker exec bash
    *    /tests/run-tests.sh`, parse, fail-first check
    *    (`validators.py:592-645`);
    *  - V5: container stop/rm and image rmi ALWAYS run
    *    (`validators.py:644-646,735-741`).
    */
  def runDockerStages(runner: ProcessRunner, taskId: String, dockerfile: String,
                      additionalFilesJson: String, testFunctions: String,
                      expectedTests: Int, execTimeoutSec: Int,
                      execReady: Boolean = true): Seq[StageResult] = {
    val tag = s"graft-validate-$taskId".toLowerCase
    val ctx = java.nio.file.Files.createTempDirectory("graft-validate-")
    try {
      BuildContext.materialize(ctx, dockerfile, additionalFilesJson, testFunctions) match {
        case Some(err) =>
          Seq(StageResult("docker_build", valid = false, err),
            StageResult("container_execution", valid = false, "skipped: bad build context"))
        case None =>
          val (buildCode, buildOut) = runner.run(
            Seq("docker", "build", "--no-cache", "--force-rm", "-t", tag,
              "-f", ctx.resolve("Dockerfile").toString, ctx.toString), 300)
          val v1 = StageResult("docker_build", buildCode == 0,
            if (buildCode == 0) s"built $tag" else s"build failed: ${buildOut.take(500)}")
          val v4 =
            if (buildCode != 0)
              StageResult("container_execution", valid = false, "skipped: build failed")
            else if (!execReady)
              // V4's own prerequisite check: no valid test names in
              // context → fail WITHOUT starting a container, with the
              // reference's user-facing message (`validators.py:347-352`)
              StageResult("container_execution", valid = false,
                "Cannot execute tests - no test content available")
            else runContainerTests(runner, taskId, tag, ctx, expectedTests, execTimeoutSec)
          // V5: image cleanup always runs (`validators.py:735-741`)
          runner.run(Seq("docker", "rmi", "-f", tag), 60)
          Seq(v1, v4)
      }
    } finally BuildContext.deleteRecursive(ctx)
  }

  private def runContainerTests(runner: ProcessRunner, taskId: String, tag: String,
                                ctx: java.nio.file.Path, expectedTests: Int,
                                execTimeoutSec: Int): StageResult = {
    val cname = s"graft-test-$taskId".toLowerCase
    try {
      val (startCode, startOut) = runner.run(
        Seq("docker", "run", "-d", "--name", cname, tag, "sleep", "infinity"), 60)
      if (startCode != 0)
        return StageResult("container_execution", valid = false,
          s"failed to start container: ${startOut.take(200)}")
      for (dep <- Seq("tmux", "asciinema")) {
        val (c, _) = runner.run(Seq("docker", "exec", cname, "which", dep), 30)
        if (c != 0)
          return StageResult("container_execution", valid = false,
            s"$dep is not installed in the container")
      }
      val (cpCode, cpOut) = runner.run(
        Seq("docker", "cp", s"$ctx/.", s"$cname:/tests"), 60)
      if (cpCode != 0)
        return StageResult("container_execution", valid = false,
          s"failed to copy tests: ${cpOut.take(200)}")
      val (code, out) = runner.run(
        Seq("docker", "exec", cname, "bash", "/tests/run-tests.sh"), execTimeoutSec)
      if (code == 124) StageResult("container_execution", valid = false, "timeout")
      else {
        val (_, passed, failed, _) = parsePytestOutput(out)
        failFirstCheck(expectedTests, passed, failed)
      }
    } finally {
      // container cleanup always runs (`validators.py:644-646`)
      runner.run(Seq("docker", "stop", cname), 60)
      runner.run(Seq("docker", "rm", "-f", cname), 60)
    }
  }

  /** Whole-dataset re-verification in one job (replaces
    * `validate_all_prod_dps.py` + `create_verified_csv.py`): run the
    * chain, keep rows whose report is clean (J1 semi-join). */
  def verifiedDataset(spark: SparkSession, dps: DataFrame, runner: ProcessRunner,
                      workers: Int = 4, runDocker: Boolean = true,
                      pythonGrammar: Option[String] = None): DataFrame = {
    import spark.implicits._
    val reports = validateAll(spark, dps, runner, workers,
        runDocker = runDocker, pythonGrammar = pythonGrammar)
      .filter(_.overall).map(_.task_id).toDF("task_id")
      // docker side effects must not re-execute on recompute (§7.4.3)
      .localCheckpoint()
    dps.join(broadcast(reports), Seq("task_id"), "left_semi")
  }
}
