package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Typed row for the staging/review lifecycle tables (SURVEY §1.3,
  * §7.1 step 1): JSON cells decoded to Maps, ISO strings to
  * timestamps. The string-typed DataFrame stays the at-rest CSV
  * round-trip form; this is the analysis-side view.
  */
case class Datapoint(
    task_id: String,
    prompt: String,
    dockerfile: String,
    test_functions: String,
    test_weights: Map[String, Double],
    additional_files: Map[String, String],
    difficulty: String,
    created_at: Option[Timestamp],
    updated_at: Option[Timestamp],
    reviewed_at: Option[Timestamp])

object Typed {

  /** Decode a staging/review DataFrame into `Dataset[Datapoint]`.
    * Empty/absent JSON cells become empty maps; unparseable or absent
    * timestamps become None (the reference mixes ISO offsets and
    * blanks — `create_dp.py:196` vs empty drift cells). */
  def datapoints(df: DataFrame): Dataset[Datapoint] = {
    val spark = df.sparkSession
    import spark.implicits._
    val withReviewed =
      if (df.columns.contains("reviewed_at")) df
      else df.withColumn("reviewed_at", lit(null).cast("string"))
    withReviewed.select(
      col("task_id"),
      coalesce(col("prompt"), lit("")).as("prompt"),
      coalesce(col("dockerfile"), lit("")).as("dockerfile"),
      coalesce(col("test_functions"), lit("")).as("test_functions"),
      coalesce(from_json(col("test_weights"), Schemas.weightsType),
        map().cast(Schemas.weightsType)).as("test_weights"),
      coalesce(from_json(col("additional_files"), Schemas.filesType),
        map().cast(Schemas.filesType)).as("additional_files"),
      coalesce(col("difficulty"), lit("")).as("difficulty"),
      to_timestamp(col("created_at")).as("created_at"),
      to_timestamp(col("updated_at")).as("updated_at"),
      to_timestamp(col("reviewed_at")).as("reviewed_at")
    ).as[Datapoint]
  }
}
