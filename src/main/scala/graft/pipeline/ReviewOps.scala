package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Review-stage operators: approval into production, cancellation
  * artifacts, and the markdown projection (SURVEY §2 S10/M6/J3;
  * reference `approve_datapoint.py`, `cancel_datapoint.py`,
  * `read_datapoint.py`).
  */
object ReviewOps {

  /** Approve a review row into production
    * (`approve_datapoint.py:66-214`): validate enums, derive
    * title := task_id and use_case_category := category
    * (`approve_datapoint.py:120-122`), project onto the production
    * schema. A missing review row or a task_id already in production is
    * an ERROR, not a no-op (`approve_datapoint.py:103-106` raises) —
    * the CLI must not report "approved" while production is unchanged.
    * Returns the new production table; caller archives + commits
    * production first, then marks the review row
    * ([[DatapointOps.markReviewed]]) — same ordering as the reference. */
  def approve(review: DataFrame, production: DataFrame, taskId: String,
              category: String, tags: String, now: String): DataFrame = {
    require(Schemas.Categories.contains(category), s"invalid category: $category")
    val tagList = tags.split("\\|").map(_.trim).filter(_.nonEmpty)
    require(tagList.nonEmpty && tagList.length <= 3 &&
      tagList.forall(Schemas.Tags.contains),
      s"invalid tags: $tags")

    val row = DatapointOps.pointLookup(review, taskId)
    if (row.limit(1).isEmpty)
      throw new IllegalArgumentException(s"datapoint $taskId not found in review")
    if (DatapointOps.exists(production, taskId))
      throw new IllegalStateException(
        s"datapoint $taskId already exists in production — duplicate approval")
    val prodRow = row.select(
      col("task_id"),
      coalesce(nullIfEmpty(col("difficulty")), lit("medium")).as("difficulty"),
      col("task_id").as("title"),
      lit(category).as("use_case_category"),
      col("prompt"),
      lit(category).as("category"),
      lit(tags).as("tags"),
      col("dockerfile"),
      col("test_functions"),
      col("test_weights"),
      coalesce(nullIfEmpty(col("additional_files")), lit("{}")).as("additional_files"),
      coalesce(nullIfEmpty(col("created_at")), lit(now)).as("created_at"),
      coalesce(nullIfEmpty(col("updated_at")), lit(now)).as("updated_at"))
    // the duplicate/existence guards above already failed loudly, so the
    // anti-join inside insert is only belt-and-braces here
    DatapointOps.insert(production, prodRow)
  }

  private def nullIfEmpty(c: Column): Column = when(c === "", null).otherwise(c)

  /** Cancellation artifact row (`cancel_datapoint.py:64-73`): the JSON
    * record written alongside marking the review row. */
  def cancellationArtifact(taskId: String, category: String, reason: String,
                           cancelledBy: String, reviewAttempts: Int,
                           details: String, now: String): Column = {
    require(Schemas.CancellationCategories.contains(category),
      s"invalid cancellation category: $category")
    to_json(struct(
      lit(taskId).as("task_id"),
      lit(now).as("cancelled_at"),
      lit(cancelledBy).as("cancelled_by"),
      lit(category).as("category"),
      lit(reason).as("reason"),
      lit(reviewAttempts).as("review_attempts"),
      lit(details).as("details"),
      lit("cancelled").as("final_decision")))
  }

  /** Datapoint row → markdown projection (S10;
    * `read_datapoint.py:27-127`): one formatted document per row,
    * built from codegen'd string expressions — usable as a column on
    * millions of rows, not just a per-row CLI print. */
  def markdown(df: DataFrame, truncateFiles: Int = 1000): DataFrame = {
    val weights = from_json(col("test_weights"), Schemas.weightsType)
    val weightLines = when(weights.isNotNull,
      array_join(transform(map_keys(weights),
        k => concat(lit("- "), k, lit(": "), element_at(weights, k))), "\n"))
      .otherwise(coalesce(col("test_weights"), lit("No weights provided")))
    val files = from_json(col("additional_files"), Schemas.filesType)
    val fileSections = when(files.isNotNull && size(map_keys(files)) > 0,
      concat(lit("\n## Additional Files\n"),
        array_join(transform(map_keys(files), k => concat(
          lit("### "), k, lit("\n```\n"),
          substring(element_at(files, k), 1, truncateFiles),
          when(length(element_at(files, k)) > truncateFiles,
            lit("\n… (truncated)")).otherwise(lit("")),
          lit("\n```"))), "\n")))
      .otherwise(lit(""))
    df.select(
      col("task_id"),
      concat(
        lit("# Datapoint: "), col("task_id"), lit("\n\n## Status\n- Task ID: "),
        col("task_id"),
        lit("\n- Difficulty: "), coalesce(col("difficulty"), lit("Not specified")),
        lit("\n- Created: "), coalesce(col("created_at"), lit("")),
        lit("\n- Updated: "), coalesce(col("updated_at"), lit("")),
        lit("\n\n## Prompt\n"), coalesce(col("prompt"), lit("No prompt provided")),
        lit("\n\n## Dockerfile\n```dockerfile\n"),
        coalesce(col("dockerfile"), lit("No dockerfile provided")),
        lit("\n```\n\n## Test Functions\n```python\n"),
        coalesce(col("test_functions"), lit("No tests provided")),
        lit("\n```\n\n## Test Weights\n"), weightLines,
        fileSections).as("markdown"))
  }
}
