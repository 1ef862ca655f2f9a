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
      .withColumn("syntax_ok", size(col("test_names")) >= 1)
      .withColumn("problematic_imports",
        array_sort(array_intersect(
          regexp_extract_all(col("test_functions"),
            lit("(?m)^\\s*(?:import|from)\\s+(\\w+)"), lit(1)),
          array(problematic.map(lit): _*))))
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
    // "no tests collected" ⇒ failed := total (`validators.py:723-725`)
    if (failed == 0 && passed == 0 && collected > 0) failed = collected
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
                  runDocker: Boolean = true): Dataset[ValidationReport] = {
    import spark.implicits._
    val pure = pureChecks(dps).select(
      col("task_id"), col("dockerfile"), col("dockerfile_ok"),
      col("syntax_ok"), col("n_tests"), col("test_names"),
      col("weights_valid"), col("w_sum"),
      col("missing_weights"), col("extra_weights"))
    pure.repartition(workers).mapPartitions { rows =>
      rows.map { r =>
        val taskId = r.getAs[String]("task_id")
        val v1lint = StageResult("dockerfile_lint", r.getAs[Boolean]("dockerfile_ok"),
          if (r.getAs[Boolean]("dockerfile_ok")) "dependency lint ok"
          else "missing FROM or tmux/asciinema deps")
        val v2 = StageResult("test_syntax", r.getAs[Boolean]("syntax_ok"),
          s"${r.getAs[Int]("n_tests")} test function(s) found")
        val v3 = StageResult("test_weights", r.getAs[Boolean]("weights_valid"),
          if (r.getAs[Boolean]("weights_valid")) "weights valid"
          else s"sum=${r.getAs[Double]("w_sum")} missing=${r.getAs[Seq[String]]("missing_weights").mkString(",")} extra=${r.getAs[Seq[String]]("extra_weights").mkString(",")}")
        val effectful: Seq[StageResult] =
          if (!runDocker) Nil
          else {
            val tag = s"graft-validate-$taskId".toLowerCase
            val (buildCode, buildOut) = runner.run(
              Seq("docker", "build", "--no-cache", "-t", tag, "-"), 300)
            val v1 = StageResult("docker_build", buildCode == 0,
              if (buildCode == 0) s"built $tag" else s"build failed: ${buildOut.take(500)}")
            val v4 =
              if (buildCode != 0)
                StageResult("container_execution", valid = false, "skipped: build failed")
              else {
                val (code, out) = runner.run(
                  Seq("docker", "run", "--rm", tag, "bash", "run-tests.sh"), execTimeoutSec)
                if (code == 124) StageResult("container_execution", valid = false, "timeout")
                else {
                  val (_, passed, failed, _) = parsePytestOutput(out)
                  failFirstCheck(r.getAs[Int]("n_tests"), passed, failed)
                }
              }
            // V5: image cleanup always runs (`validators.py:735-741`)
            runner.run(Seq("docker", "rmi", "-f", tag), 60)
            Seq(v1, v4)
          }
        val stages = Seq(v1lint, v2, v3) ++ effectful
        ValidationReport(taskId, stages.forall(_.valid), stages)
      }
    }
  }

  /** Whole-dataset re-verification in one job (replaces
    * `validate_all_prod_dps.py` + `create_verified_csv.py`): run the
    * chain, keep rows whose report is clean (J1 semi-join). */
  def verifiedDataset(spark: SparkSession, dps: DataFrame, runner: ProcessRunner,
                      workers: Int = 4, runDocker: Boolean = true): DataFrame = {
    import spark.implicits._
    val reports = validateAll(spark, dps, runner, workers, runDocker = runDocker)
      .filter(_.overall).map(_.task_id).toDF("task_id")
      // docker side effects must not re-execute on recompute (§7.4.3)
      .localCheckpoint()
    dps.join(broadcast(reports), Seq("task_id"), "left_semi")
  }
}
