package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableFuncs.portableRound

/** The reference's write-side "query language" and pure validation
  * logic, as declarative column programs (SURVEY §2.2–§2.6).
  *
  * Every operator keeps the table fully distributed — mutations are
  * projections/filters over the whole table followed by an atomic
  * overwrite ([[TableIO.atomicOverwrite]]), matching the reference's
  * full-file-rewrite model (`patch_dp.py:157-172`) but executed as a
  * parallel scan instead of a single-threaded DictReader loop. At
  * scale, single-row mutations on a parquet table would use a
  * Delta-style MERGE; the overwrite protocol here preserves the
  * reference's exact temp+rename semantics.
  */
object DatapointOps {

  // ---- F1/F4: lookups & guards ----

  /** Point lookup by key (F1; `patch_dp.py:50-55`). The equality
    * predicate pushes into the parquet scan (row-group min/max skip). */
  def pointLookup(df: DataFrame, taskId: String): DataFrame =
    df.filter(col("task_id") === taskId)

  /** Existence check (F4; `create_dp.py:42-49`) without collecting the
    * table: limit(1) short-circuits the scan. */
  def exists(df: DataFrame, taskId: String): Boolean =
    !pointLookup(df, taskId).limit(1).isEmpty

  // ---- M1–M6: mutations as projections ----

  /** Column patch by key (M1; `patch_dp.py:110-176`): update the given
    * columns of one row, stamp updated_at. Unknown columns are an
    * error, as in the reference's header check (`patch_dp.py:118-125`). */
  def patch(df: DataFrame, taskId: String, updates: Map[String, String],
            now: String): DataFrame = {
    val unknown = updates.keySet -- df.columns.toSet
    require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(", ")}")
    val hit = col("task_id") === taskId
    val patched = updates.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, when(hit, lit(v)).otherwise(col(c)))
    }
    if (df.columns.contains("updated_at"))
      patched.withColumn("updated_at", when(hit, lit(now)).otherwise(col("updated_at")))
    else patched
  }

  /** Row insert with duplicate-key guard (M2+F4/J3;
    * `create_dp.py:149-214`, `approve_datapoint.py:103-106`): the new
    * row is anti-joined against existing keys, so a duplicate insert is
    * a no-op rather than a corruption. */
  def insert(df: DataFrame, row: DataFrame): DataFrame =
    df.unionByName(
      row.join(df.select("task_id"), Seq("task_id"), "left_anti"),
      allowMissingColumns = true)

  /** Row delete (M3; `add_dp_to_review.py:130-151`). */
  def delete(df: DataFrame, taskId: String): DataFrame =
    df.filter(col("task_id") =!= taskId)

  /** Normalize-on-write (M5; `add_dp_to_review.py:71-79`): map any row
    * set onto the standard columns, filling missing with ''. */
  def normalize(df: DataFrame, standardColumns: Seq[String]): DataFrame =
    df.select(standardColumns.map { c =>
      (if (df.columns.contains(c)) coalesce(col(c), lit("")) else lit("")).as(c)
    }: _*)

  /** Transactional move staging→review (M4;
    * `add_dp_to_review.py:255-264`): returns (newReview, newStaging) in
    * commit order — the caller MUST commit review first, then staging,
    * so a crash between the two leaves a duplicate (recoverable), never
    * a lost row. */
  def moveToReview(staging: DataFrame, review: DataFrame, taskId: String,
                   reviewedAt: String): (DataFrame, DataFrame) = {
    val row = normalize(pointLookup(staging, taskId), Schemas.StagingColumns)
      .withColumn("reviewed_at", lit(reviewedAt))
    (insert(review, row), delete(staging, taskId))
  }

  /** Mark-reviewed update (M6; `approve_datapoint.py:166-184`). */
  def markReviewed(df: DataFrame, taskId: String, reviewedAt: String): DataFrame =
    df.withColumn("reviewed_at",
      when(col("task_id") === taskId, lit(reviewedAt)).otherwise(col("reviewed_at")))

  // ---- M7: nested file-map mutations ----

  /** File-map mutation modes over the additional_files JSON cell (M7;
    * `patch_additional_files.py:192-330`). `mode` ∈ update | remove |
    * replace | append. All are map-level column ops on the decoded
    * MapType — no row explosion. */
  def patchFiles(df: DataFrame, taskId: String, mode: String,
                 files: Map[String, String], now: String): DataFrame = {
    val hit = col("task_id") === taskId
    val cur = coalesce(
      from_json(col("additional_files"), Schemas.filesType),
      map().cast(Schemas.filesType))
    val litMap =
      if (files.isEmpty) map().cast(Schemas.filesType)
      else map(files.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val updated: Column = mode match {
      case "update" | "sync" => map_concat(
        map_filter(cur, (k, _) => !k.isin(files.keys.toSeq.map(lit): _*)), litMap)
      case "remove" => map_filter(cur, (k, _) => !k.isin(files.keys.toSeq.map(lit): _*))
      case "replace" => litMap
      case "append" => map_concat(
        map_filter(cur, (k, _) => !k.isin(files.keys.toSeq.map(lit): _*)),
        map_from_arrays(
          map_keys(litMap),
          transform(map_keys(litMap), k =>
            concat(coalesce(element_at(cur, k), lit("")), element_at(litMap, k)))))
      case other => throw new IllegalArgumentException(s"unknown mode: $other")
    }
    df.withColumn("additional_files",
        when(hit, to_json(updated)).otherwise(col("additional_files")))
      .withColumn("updated_at", when(hit, lit(now)).otherwise(col("updated_at")))
  }

  // ---- V3-as-columns: weight validation (C1+J5+A4+C13) ----

  /** Names of `def test_*` functions in a Python source column —
    * regex approximation of the reference's `ast.parse` walk
    * (`validators.py:194-219`); divergence documented in SURVEY §7.4. */
  def testNames(src: Column): Column =
    regexp_extract_all(src, lit("(?m)^\\s*def\\s+(test_\\w+)\\s*\\("), lit(1))

  /** One-pass weight validation report per row (V3;
    * `validators.py:256-327` + `patch_dp.py:75-103`):
    *  - weights cell parses as a JSON object of numbers,
    *  - every weight in (0, 1],
    *  - sum within 0.999–1.001,
    *  - weight keys == extracted test names (both directions, J5).
    * Returns the input plus a `weights_valid` boolean and diagnostic
    * columns; pure column logic, fully codegen-friendly.
    */
  def validateWeights(df: DataFrame,
                      weightsCol: String = "test_weights",
                      testsCol: String = "test_functions"): DataFrame = {
    val w = from_json(col(weightsCol), Schemas.weightsType)
    val names = testNames(col(testsCol))
    df.withColumn("w_parsed", w)
      .withColumn("w_sum", coalesce(aggregate(map_values(col("w_parsed")),
        lit(0.0), (a, x) => a + x), lit(0.0)))
      .withColumn("w_range_ok",
        forall(map_values(col("w_parsed")), v => v > 0.0 && v <= 1.0))
      .withColumn("missing_weights",
        array_sort(array_except(names, map_keys(col("w_parsed")))))
      .withColumn("extra_weights",
        array_sort(array_except(map_keys(col("w_parsed")), names)))
      .withColumn("weights_valid",
        col("w_parsed").isNotNull &&
          col("w_range_ok") &&
          col("w_sum") >= 0.999 && col("w_sum") <= 1.001 &&
          size(col("missing_weights")) === 0 &&
          size(col("extra_weights")) === 0)
      .drop("w_parsed")
  }

  // ---- C4/C5: tag & category validation ----

  /** Pipe-separated tag validation (C4; `categories_tags.py:48-70`):
    * 1–3 tags, all from the vocabulary. */
  def validateTags(tags: Column): Column = {
    val parsed = filter(transform(split(tags, "\\|"), trim(_)), t => t =!= "")
    val vocab = array(Schemas.Tags.map(lit): _*)
    tags.isNotNull && size(parsed) >= 1 && size(parsed) <= 3 &&
      size(array_except(parsed, vocab)) === 0
  }

  /** Category membership (C5; `categories_tags.py:43-45`). */
  def validateCategory(category: Column): Column =
    category.isin(Schemas.Categories: _*)

  // ---- A1–A3, A5: status aggregations ----

  /** Count by status over the full enum — zero rows included via a
    * broadcast dim join (A1; `task_manager.py:348-376`). */
  def statusCounts(tasks: DataFrame): DataFrame = {
    val spark = tasks.sparkSession
    import spark.implicits._
    val dim = Schemas.TaskStatuses.toDF("status")
    broadcast(dim).join(
        tasks.groupBy(col("status")).agg(count(lit(1)).as("n")), Seq("status"), "left")
      .select(col("status"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Per-type completion rate with `x/y (z%)` display (A3;
    * `data_pipeline.py:138-156`). */
  def completionRates(tasks: DataFrame): DataFrame =
    tasks.groupBy(col("type"))
      .agg(
        sum(when(col("status") === "completed", 1L).otherwise(0L)).as("completed"),
        count(lit(1)).as("total"))
      .withColumn("rate", portableRound(col("completed") / col("total") * 100, 1))
      .withColumn("display", concat(
        col("completed"), lit("/"), col("total"),
        lit(" ("), col("rate"), lit("%)")))

  /** Error grouping: counts + first-5 examples (A5;
    * `validate_all_prod_dps.py:234-271`). */
  def errorGroups(failed: DataFrame, errorCol: String = "error"): DataFrame =
    failed.groupBy(col(errorCol))
      .agg(count(lit(1)).as("n"),
        slice(array_sort(collect_list(col("task_id"))), 1, 5).as("examples"))

  // ---- J1/J2: dataset-level joins ----

  /** Verified-dataset semi-join (J1; `create_verified_csv.py:29-64`):
    * keep rows whose task_id has a completed validation task. The id
    * set is small relative to the table — broadcast it. */
  def verifiedFilter(dps: DataFrame, tasks: DataFrame): DataFrame = {
    val completedIds = tasks
      .filter(col("status") === "completed" && col("id").startsWith("validate_"))
      .select(regexp_replace(col("id"), "^validate_", "").as("task_id"))
    dps.join(broadcast(completedIds), Seq("task_id"), "left_semi")
  }

  /** Init anti-join (J2; `validate_all_prod_dps.py:98-129`): datapoints
    * with no existing validate_ task yet. */
  def unvalidated(dps: DataFrame, tasks: DataFrame): DataFrame = {
    val existing = tasks
      .filter(col("id").startsWith("validate_"))
      .select(regexp_replace(col("id"), "^validate_", "").as("task_id"))
    dps.join(broadcast(existing), Seq("task_id"), "left_anti")
  }
}
