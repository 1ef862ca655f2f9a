package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The canary must be green on the real testdata, green on BOTH events
  * physical encodings the driver has shipped (nanos-as-long and NTZ
  * micros), and red — naming table and actual type — on a flipped one. */
class SchemaCanarySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("canary is green on the driver testdata") {
    val d = SchemaCanary.drift(spark, sf)
    assert(d.isEmpty, s"unexpected drift:\n${d.mkString("\n")}")
  }

  private def eventsFixture(writeTs: org.apache.spark.sql.Column, tsType: DataType): String = {
    val dir = Files.createTempDirectory("canary").toString
    spark.range(3).select(
      col("id").as("event_id"),
      writeTs.cast(tsType).as("ts"),
      col("id").as("user_id"),
      lit("click").as("event_type"),
      lit(1.5).as("value"),
      lit("{}").as("props")
    ).coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events loader adapts to an NTZ-micros file (the regenerated encoding)") {
    val dir = eventsFixture(lit("2024-03-01 10:00:00"), TimestampNTZType)
    assert(SchemaCanary.driftFor(spark, dir, "events").isEmpty)
    val ts = Tables.events(spark, dir).select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(_.getString(0)).toSet
    assert(ts == Set("2024-03-01 10:00:00"))
  }

  test("events loader adapts to a long-nanos column (the old encoding's nanosAsLong view)") {
    // TIMESTAMP(NANOS) files arrive as LongType under nanosAsLong; a plain
    // int64 nanos column exercises the identical loader branch
    val nanos = lit(1709287200L) * lit(1000000000L) // 2024-03-01 10:00:00 UTC in ns
    val dir = eventsFixture(nanos, LongType)
    assert(SchemaCanary.driftFor(spark, dir, "events").isEmpty)
    val ts = Tables.events(spark, dir).select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(_.getString(0)).toSet
    assert(ts == Set("2024-03-01 10:00:00"))
  }

  test("events loader passes a session-zone TIMESTAMP file through unchanged") {
    val dir = eventsFixture(lit("2024-03-01 10:00:00"), TimestampType)
    assert(SchemaCanary.driftFor(spark, dir, "events").isEmpty)
    assert(Tables.events(spark, dir).schema("ts").dataType == TimestampType)
  }

  test("canary goes RED on a type-flipped fixture, naming table and actual type") {
    val dir = eventsFixture(lit("2024-03-01 10:00:00"), StringType)
    val d = SchemaCanary.driftFor(spark, dir, "events")
    assert(d.nonEmpty)
    assert(d.exists(m => m.contains("events.ts") && m.contains("STRING")),
      s"drift message should name events.ts and the actual type: $d")
  }

  test("canary goes RED on a missing column, listing what the file has") {
    val dir = Files.createTempDirectory("canary").toString
    spark.range(3).select(col("id").as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val d = SchemaCanary.driftFor(spark, dir, "events")
    assert(d.exists(_.contains("MISSING")), d.mkString("\n"))
  }
}
