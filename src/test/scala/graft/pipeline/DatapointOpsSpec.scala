package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DatapointOpsSpec extends SparkSpec {
  import DatapointOps._

  val stagingCsv = "/root/reference/agents/dp_builder_workspace/staging/datapoints.csv"
  lazy val staging: DataFrame = TableIO.readCsv(spark, stagingCsv).cache()

  def mini: DataFrame = {
    import spark.implicits._
    Seq(
      ("t1", "p1", "d", "def test_a():\n  pass", """{"test_a": 1.0}""", "", "easy", "2026-01-01", "2026-01-01"),
      ("t2", "p2", "d", "def test_b():\n  pass", """{"test_b": 0.5}""", "", "hard", "2026-01-01", "2026-01-01")
    ).toDF(Schemas.StagingColumns: _*)
  }

  test("point lookup finds exactly the keyed row") {
    assert(pointLookup(staging, "draft_dp_89998cb9").count() <= 1)
    assert(exists(mini, "t1") && !exists(mini, "nope"))
  }

  test("patch updates one row's columns and stamps updated_at") {
    val out = patch(mini, "t1", Map("difficulty" -> "medium"), "2026-02-02")
    val t1 = out.filter(col("task_id") === "t1").head()
    val t2 = out.filter(col("task_id") === "t2").head()
    assert(t1.getAs[String]("difficulty") === "medium")
    assert(t1.getAs[String]("updated_at") === "2026-02-02")
    assert(t2.getAs[String]("difficulty") === "hard")
    assert(t2.getAs[String]("updated_at") === "2026-01-01")
    intercept[IllegalArgumentException] { patch(mini, "t1", Map("nope" -> "x"), "now") }
  }

  test("insert guards against duplicate keys") {
    val dup = mini.filter(col("task_id") === "t1")
    assert(insert(mini, dup).count() === 2) // no-op
    val fresh = dup.withColumn("task_id", lit("t3"))
    assert(insert(mini, fresh).count() === 3)
  }

  test("delete removes exactly the keyed row") {
    assert(delete(mini, "t1").count() === 1)
  }

  test("normalize maps onto standard columns, filling missing with ''") {
    import spark.implicits._
    val ragged = Seq(("t9", "p")).toDF("task_id", "prompt")
    val out = normalize(ragged, Schemas.ReviewColumns)
    assert(out.columns === Schemas.ReviewColumns.toArray)
    assert(out.head().getAs[String]("reviewed_at") === "")
  }

  test("moveToReview inserts into review then deletes from staging") {
    val review = normalize(spark.emptyDataFrame.limit(0).selectExpr("'' as task_id"),
      Schemas.ReviewColumns).limit(0)
    val (newReview, newStaging) = moveToReview(mini, review, "t1", "2026-03-03")
    assert(newReview.count() === 1)
    assert(newReview.head().getAs[String]("reviewed_at") === "2026-03-03")
    assert(newStaging.count() === 1)
    assert(newStaging.head().getAs[String]("task_id") === "t2")
  }

  test("patchFiles: update/remove/replace/append modes on the JSON file map") {
    import spark.implicits._
    val df = Seq(("t1", """{"a.txt": "A", "b.txt": "B"}""", "2026-01-01"))
      .toDF("task_id", "additional_files", "updated_at")
    def filesOf(out: DataFrame): Map[String, String] =
      out.select(from_json(col("additional_files"), Schemas.filesType)).head()
        .getAs[Map[String, String]](0)
    assert(filesOf(patchFiles(df, "t1", "update", Map("b.txt" -> "B2", "c.txt" -> "C"), "now"))
      === Map("a.txt" -> "A", "b.txt" -> "B2", "c.txt" -> "C"))
    assert(filesOf(patchFiles(df, "t1", "remove", Map("a.txt" -> ""), "now"))
      === Map("b.txt" -> "B"))
    assert(filesOf(patchFiles(df, "t1", "replace", Map("z.txt" -> "Z"), "now"))
      === Map("z.txt" -> "Z"))
    assert(filesOf(patchFiles(df, "t1", "append", Map("a.txt" -> "+more"), "now"))
      === Map("a.txt" -> "A+more", "b.txt" -> "B"))
  }

  test("validateWeights on the staging fixture: weight sums and key parity") {
    val checked = validateWeights(staging)
    // every staging row has a parseable weight map summing to ~1.0
    assert(checked.filter(col("w_sum") < 0.999 || col("w_sum") > 1.001).count() === 0)
    // tests-per-row histogram matches the golden stats {2:42, 3:4}
    val hist = checked
      .groupBy(size(DatapointOps.testNames(col("test_functions"))).as("n")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist === Map(2 -> 42L, 3 -> 4L))
    // exactly one fixture row has a genuine weights↔tests mismatch
    // (weight key test_typescript_pos_exists vs function
    // test_javascript_pos_exists) — the validator must catch it
    val bad = checked.filter(!col("weights_valid"))
      .select("task_id").collect().map(_.getString(0)).toSeq
    assert(bad === Seq("draft_dp_a78bda25"))
  }

  test("validateWeights flags range, sum, and key-parity violations") {
    import spark.implicits._
    val bad = Seq(
      ("ok", "def test_a():\n  pass\ndef test_b():\n  pass", """{"test_a":0.5,"test_b":0.5}"""),
      ("badsum", "def test_a():\n  pass", """{"test_a":0.5}"""),
      ("badrange", "def test_a():\n  pass\ndef test_b():\n  pass", """{"test_a":1.5,"test_b":-0.5}"""),
      ("missing", "def test_a():\n  pass\ndef test_b():\n  pass", """{"test_a":1.0}"""),
      ("extra", "def test_a():\n  pass", """{"test_a":0.5,"test_ghost":0.5}"""),
      ("unparseable", "def test_a():\n  pass", "not json")
    ).toDF("task_id", "test_functions", "test_weights")
    val got = validateWeights(bad).select("task_id", "weights_valid").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === Map("ok" -> true, "badsum" -> false, "badrange" -> false,
      "missing" -> false, "extra" -> false, "unparseable" -> false))
  }

  test("tag and category validation") {
    import spark.implicits._
    val rows = Seq(
      ("python|git", true), ("python", true),
      ("python|git|api|cli", false), // >3
      ("", false), ("notatag", false), ("python| git ", true) // trims
    ).toDF("tags", "expect")
    val got = rows.withColumn("ok", validateTags(col("tags")))
      .filter(col("ok") =!= col("expect")).count()
    assert(got === 0)
    val cats = Seq(("security", true), ("bogus", false)).toDF("category", "expect")
    assert(cats.withColumn("ok", validateCategory(col("category")))
      .filter(col("ok") =!= col("expect")).count() === 0)
  }

  test("statusCounts zero-fills the full enum") {
    import spark.implicits._
    val tasks = Seq(("a", "pending"), ("b", "pending"), ("c", "completed"))
      .toDF("id", "status")
    val m = statusCounts(tasks).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("pending" -> 2L, "in_progress" -> 0L, "completed" -> 1L,
      "failed" -> 0L, "cancelled" -> 0L))
  }

  test("verifiedFilter keeps only rows with completed validate_ tasks") {
    import spark.implicits._
    val dps = Seq("t1", "t2", "t3").toDF("task_id")
    val tasks = Seq(
      ("validate_t1", "completed"), ("validate_t2", "failed"), ("other_t3", "completed")
    ).toDF("id", "status")
    assert(verifiedFilter(dps, tasks).collect().map(_.getString(0)).toSeq === Seq("t1"))
    assert(unvalidated(dps, tasks).collect().map(_.getString(0)).sorted === Seq("t3"))
  }
}
