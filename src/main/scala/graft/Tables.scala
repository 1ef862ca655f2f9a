package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver test data (TESTDATA.md).
  *
  * Canonical storage for the engine is Parquet: columnar, splittable,
  * predicate-pushdown- and column-pruning-friendly — unlike the
  * reference's multi-line CSVs (see `graft.pipeline.TableIO` for the
  * CSV edge). At 100 TB these reads rely on Catalyst pushing filters
  * and pruned schemas into the scan, so callers should `select`/
  * `filter` as early as possible and let the optimizer do the rest.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events `ts` column to session-zone TIMESTAMP (micros),
    * adapting to whatever physical type the file actually stores — the
    * header-driven tolerance the reference gets from `csv.DictReader`
    * (SURVEY §1.1): trust the file, not an assumption.
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so the
    *    loader sets `nanosAsLong` and the column arrives as LONG nanos →
    *    integral-divide to micros (`div` is long division; a double
    *    division loses precision above 2^53 ns) and re-type.
    *  - TIMESTAMP_NTZ (micros): cast to session-zone TIMESTAMP. Under the
    *    project-wide UTC session this is value-identical to DuckDB's
    *    naive TIMESTAMP read, and matches the `to_timestamp` literals the
    *    queries compare against (`CoreQueries.scala:26`).
    *  - TIMESTAMP: already what the queries expect — pass through.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) => df.withColumn("ts", col("ts").cast(TimestampType))
      // includes a missing ts column: pass through so SchemaCanary can
      // report exactly which column vanished rather than a loader throw
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame = {
    // harmless when ts is already timestamp-typed; required for nanos files
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** A named set of queries plus their DuckDB oracle SQL (driver contract:
  * same column names on both sides; driver sorts columns by name before
  * hashing). Modules register themselves in [[SparkEntry]].
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
