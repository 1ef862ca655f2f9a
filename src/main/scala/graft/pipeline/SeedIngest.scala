package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seed-ingestion ETL (S8 + F7): walk a tasks directory tree, clean the
  * boilerplate out of task.yaml / Dockerfile / tests python files, emit one
  * seed row per task directory — the distributed form of
  * `init_seed_tasks.py:91-168`.
  *
  * The reference loops directories single-threaded; here the whole tree
  * is ingested with one binaryFile scan, grouped by task directory, and
  * cleaned with codegen'd column expressions — at 100 TB of seed data
  * the scan parallelizes by file and the group-by shuffles only
  * (path, content) pairs.
  */
object SeedIngest {

  /** Cut content to start at the first `marker` occurrence, if any
    * (`init_seed_tasks.py:33-37,52-55` — Dockerfile `FROM`, task.yaml
    * `instruction:`). */
  def cutFrom(c: Column, marker: String): Column = {
    val idx = instr(c, marker)
    when(idx > 0, substring(c, idx, lit(Int.MaxValue))).otherwise(c)
  }

  /** Drop canary lines (`init_seed_tasks.py:41-46,61-65`). */
  def stripCanary(c: Column): Column = {
    val lines = split(c, "\n")
    array_join(
      filter(lines, l =>
        !l.contains("BENCHMARK DATA SHOULD NEVER APPEAR") &&
          !l.contains("terminal-bench-canary")),
      "\n")
  }

  /** Collapse runs of 3+ newlines to 2 and strip ALL leading/trailing
    * whitespace (`init_seed_tasks.py:82-88`) — Spark's `trim` only
    * removes spaces, so the Python-`strip()` behavior needs a regex. */
  def collapseBlanks(c: Column): Column =
    regexp_replace(regexp_replace(c, "\n{3,}", "\n\n"), "^\\s+|\\s+$", "")

  /** Full Dockerfile cleaning: cut to FROM, else strip canary lines. */
  def cleanDockerfile(c: Column): Column =
    collapseBlanks(when(instr(c, "FROM") > 0, cutFrom(c, "FROM"))
      .otherwise(stripCanary(c)))

  /** Full task.yaml cleaning: cut to `instruction:`. */
  def cleanTaskYaml(c: Column): Column =
    collapseBlanks(cutFrom(c, "instruction:"))

  /** Test-file cleaning: canary lines + the template comment block
    * ("This is a template test file" … "by the test harness" … blank)
    * (`init_seed_tasks.py:57-78`). The block skip is stateful across
    * lines, expressed as a filter over line index ranges.
    */
  def cleanTest(c: Column): Column = {
    val lines = split(stripCanary(c), "\n")
    // aggregate with (keptLines, skipping) state — same single-pass
    // state machine as the reference loop, over the line array
    val cleaned = aggregate(
      lines,
      struct(array().cast("array<string>").as("kept"), lit(false).as("skip")),
      (acc, l) => {
        val kept = acc.getField("kept")
        val skipping = acc.getField("skip")
        when(l.contains("This is a template test file"),
          struct(kept.as("kept"), lit(true).as("skip")))
          .when(skipping && l.contains("by the test harness"),
            struct(kept.as("kept"), lit(true).as("skip")))
          .when(skipping && trim(l) === "",
            struct(kept.as("kept"), lit(false).as("skip")))
          .otherwise(struct(concat(kept, array(l)).as("kept"), skipping.as("skip")))
      },
      acc => array_join(acc.getField("kept"), "\n"))
    collapseBlanks(cleaned)
  }

  /** Ingest a tasks directory: one row per task dir with cleaned
    * task_yaml, dockerfile, and a test-file map. */
  def ingest(spark: SparkSession, tasksDir: String): DataFrame = {
    val files = TableIO.readFileMap(spark, tasksDir)
      .withColumn("task_name", regexp_extract(col("relpath"), "^([^/]+)/", 1))
      .filter(col("task_name") =!= "")
      .withColumn("fname", regexp_replace(col("relpath"), "^[^/]+/", ""))
    files
      .groupBy(col("task_name"))
      .agg(
        max(when(col("fname") === "task.yaml", col("content"))).as("task_yaml_raw"),
        max(when(col("fname") === "Dockerfile", col("content"))).as("dockerfile_raw"),
        map_from_entries(array_sort(collect_list(
          when(col("fname").rlike("^tests/[^/]+\\.py$"),
            struct(regexp_replace(col("fname"), "^tests/", "").as("k"),
              col("content").as("v")))))).as("tests_raw"))
      .select(
        col("task_name"),
        cleanTaskYaml(col("task_yaml_raw")).as("task_yaml"),
        cleanDockerfile(col("dockerfile_raw")).as("dockerfile"),
        transform_values(col("tests_raw"), (_, v) => cleanTest(v)).as("test_files"))
      .orderBy(col("task_name"))
  }

  /** Load ingested seeds into a TaskStore as seed_dp tasks (driver-side
    * coordination rows; the content itself stays in the DataFrame). */
  def seedTasks(store: TaskStore, seeds: DataFrame): Int = {
    val rows = seeds.select("task_name").collect()
    rows.foreach { r =>
      val name = r.getString(0)
      store.createTask("seed_dp", data = Map("task_name" -> name),
        id = Some(s"seed_dp_$name"))
    }
    rows.length
  }
}
