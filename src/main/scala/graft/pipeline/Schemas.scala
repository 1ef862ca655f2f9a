package graft.pipeline

import org.apache.spark.sql.types._

/** Schemas + enum dimensions for the datapoint pipeline.
  *
  * Mirrors the reference's three lifecycle tables (staging → review →
  * production) and its enum dictionaries, re-typed for Spark:
  *  - staging header: `create_dp.py:35-39`
  *  - review = staging + reviewed_at (`add_dp_to_review.py:29-32`)
  *  - production adds classification columns (`approve_datapoint.py:110-114`)
  *  - difficulty enum: `create_dp.py:283`
  *  - task status enum: `task_manager.py:18-24`
  *  - 12 categories / 68 tags: `shared_tools/categories_tags.py:9-40`
  *
  * At rest every CSV cell is a string; `test_weights` and
  * `additional_files` carry JSON objects inside the cell
  * (`patch_dp.py:79-103`, `patch_additional_files.py:105-122`) — the
  * typed view decodes them to MapType columns with `from_json`.
  */
object Schemas {

  /** Staging table columns, in reference header order. */
  val StagingColumns: Seq[String] = Seq(
    "task_id", "prompt", "dockerfile", "test_functions", "test_weights",
    "additional_files", "difficulty", "created_at", "updated_at")

  /** Review = STANDARD_COLUMNS: staging + reviewed_at. */
  val ReviewColumns: Seq[String] = StagingColumns :+ "reviewed_at"

  /** Production (latest.csv) column order. */
  val ProductionColumns: Seq[String] = Seq(
    "task_id", "difficulty", "title", "use_case_category", "prompt",
    "category", "tags", "dockerfile", "test_functions", "test_weights",
    "additional_files", "created_at", "updated_at")

  private def stringSchema(cols: Seq[String]): StructType =
    StructType(cols.map(StructField(_, StringType, nullable = true)))

  val stagingSchema: StructType = stringSchema(StagingColumns)
  val reviewSchema: StructType = stringSchema(ReviewColumns)
  val productionSchema: StructType = stringSchema(ProductionColumns)

  /** JSON cell types. */
  val weightsType: MapType = MapType(StringType, DoubleType)
  val filesType: MapType = MapType(StringType, StringType)

  // ---- enum dimensions ----

  val Difficulties: Seq[String] =
    Seq("easy", "medium", "hard", "extremely_hard")

  val TaskStatuses: Seq[String] =
    Seq("pending", "in_progress", "completed", "failed", "cancelled")

  /** The 12 valid use-case categories — enum values are data semantics
    * from `categories_tags.py:9-22` (VALID_CATEGORIES). */
  val Categories: Seq[String] = Seq(
    "data-processing", "data-science", "debugging", "file-operations",
    "games", "machine-learning", "mathematics", "model-training",
    "scientific-computing", "security", "software-engineering",
    "system-administration")

  /** The 68-value tag vocabulary (≤3 pipe-separated per row) — enum
    * values are data semantics from `categories_tags.py:25-40`
    * (VALID_TAGS); validation rules at `categories_tags.py:48-70`. */
  val Tags: Seq[String] = Seq(
    "C", "RL", "algorithm-implementation", "algorithms", "analysis",
    "api", "audio-processing", "automation", "base64", "binary-processing",
    "build-automation", "caching", "cli", "cloud", "coding",
    "compiler-migration", "compression", "data", "data-extraction",
    "data-processing", "data-science", "debugging", "decrypt",
    "encryption", "file-operations", "file-recovery", "forensics",
    "games", "git", "images", "information-retrieval", "interactive",
    "logic", "long-context", "machine-learning", "mathematics", "maze",
    "model-training", "multiprocessing", "networking", "numpy",
    "optimization", "package-management", "parallel-computing",
    "pathfinding", "pattern-recognition", "performance-optimization",
    "physics", "python", "pytorch", "reinforcement-learning",
    "scheduling", "scientific-computation", "security",
    "signal-processing", "software-engineering", "software-installation",
    "string-manipulation", "synchronization", "sys-admin", "system",
    "text-processing", "troubleshooting", "unit-testing",
    "version-control", "web", "web-scraping", "web-server")

  /** Cancellation categories (`cancel_datapoint.py:26-32`). */
  val CancellationCategories: Seq[String] = Seq(
    "scope", "unfixable", "complexity", "quality", "other")

  require(Tags.size == 68, s"tag vocabulary must have 68 entries, got ${Tags.size}")
}
