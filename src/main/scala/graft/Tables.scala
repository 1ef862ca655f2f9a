package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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

  /** The events parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long and truncate to microseconds —
    * the same precision DuckDB computes in (`epoch_us`), so both engines
    * see identical values. `div` is integral (long) division; a double
    * division would lose precision above 2^53 ns.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
