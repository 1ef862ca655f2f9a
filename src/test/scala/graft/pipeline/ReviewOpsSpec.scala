package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReviewOpsSpec extends SparkSpec {

  def review = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("t1", "fix the bug", "FROM x", "def test_a():\n  pass", """{"test_a": 1.0}""",
        "", "hard", "2026-01-01", "2026-01-02", ""),
      ("t2", "p2", "d2", "def test_b():\n  pass", """{"test_b": 1.0}""",
        "{}", "", "", "", "")
    ).toDF(Schemas.ReviewColumns: _*)
  }

  def emptyProd = {
    val spark2 = spark
    import spark2.implicits._
    Seq.empty[(String, String, String, String, String, String, String, String,
      String, String, String, String, String)].toDF(Schemas.ProductionColumns: _*)
  }

  test("approve projects onto the production schema with derived columns") {
    val prod = ReviewOps.approve(review, emptyProd, "t1",
      "debugging", "python|debugging", "2026-05-05")
    assert(prod.columns === Schemas.ProductionColumns.toArray)
    val r = prod.head()
    assert(r.getAs[String]("title") === "t1") // title := task_id
    assert(r.getAs[String]("use_case_category") === "debugging") // := category
    assert(r.getAs[String]("category") === "debugging")
    assert(r.getAs[String]("tags") === "python|debugging")
    assert(r.getAs[String]("difficulty") === "hard")
  }

  test("approve fills defaults: difficulty=medium, additional_files={}, timestamps=now") {
    val prod = ReviewOps.approve(review, emptyProd, "t2",
      "security", "security", "2026-05-05")
    val r = prod.head()
    assert(r.getAs[String]("difficulty") === "medium")
    assert(r.getAs[String]("additional_files") === "{}")
    assert(r.getAs[String]("created_at") === "2026-05-05")
  }

  test("approve validates enums and tag count") {
    intercept[IllegalArgumentException] {
      ReviewOps.approve(review, emptyProd, "t1", "not-a-category", "python", "now")
    }
    intercept[IllegalArgumentException] {
      ReviewOps.approve(review, emptyProd, "t1", "debugging", "a|b|c|d", "now")
    }
    intercept[IllegalArgumentException] {
      ReviewOps.approve(review, emptyProd, "t1", "debugging", "nonsense-tag", "now")
    }
  }

  test("approving an id already in production is an ERROR, not a no-op") {
    // reference raises ValueError (`approve_datapoint.py:103-106`); a
    // silent no-op would print "approved" while production is unchanged
    val once = ReviewOps.approve(review, emptyProd, "t1", "debugging", "python", "now")
      .localCheckpoint()
    val e = intercept[IllegalStateException] {
      ReviewOps.approve(review, once, "t1", "debugging", "python", "now")
    }
    assert(e.getMessage.contains("already exists in production"))
  }

  test("approving a task_id absent from review is an ERROR") {
    val e = intercept[IllegalArgumentException] {
      ReviewOps.approve(review, emptyProd, "nope", "debugging", "python", "now")
    }
    assert(e.getMessage.contains("not found in review"))
  }

  test("cancellation artifact carries the full reference record shape") {
    val spark2 = spark
    import spark2.implicits._
    val json = Seq(1).toDF("i")
      .select(ReviewOps.cancellationArtifact(
        "t1", "unfixable", "docker build impossible", "review_agent", 3,
        "details here", "2026-05-05").as("j"))
      .head().getString(0)
    val m = spark.read.json(Seq(json).toDS()).head()
    assert(m.getAs[String]("task_id") === "t1")
    assert(m.getAs[String]("category") === "unfixable")
    assert(m.getAs[Long]("review_attempts") === 3L)
    assert(m.getAs[String]("final_decision") === "cancelled")
    intercept[IllegalArgumentException] {
      ReviewOps.cancellationArtifact("t1", "bogus", "", "", 1, "", "now")
    }
  }

  test("markdown projection renders all sections and truncates long files") {
    val spark2 = spark
    import spark2.implicits._
    val big = "x" * 1500
    val df = Seq(("t1", "prompt here", "FROM x", "def test_a():\n  pass",
      """{"test_a": 0.6, "test_b": 0.4}""", s"""{"big.py": "$big", "small.txt": "hi"}""",
      "hard", "2026-01-01", "2026-01-02", ""))
      .toDF(Schemas.ReviewColumns: _*)
    val md = ReviewOps.markdown(df).head().getAs[String]("markdown")
    assert(md.startsWith("# Datapoint: t1"))
    assert(md.contains("## Prompt\nprompt here"))
    assert(md.contains("```dockerfile\nFROM x\n```"))
    assert(md.contains("- test_a: 0.6") && md.contains("- test_b: 0.4"))
    assert(md.contains("### big.py") && md.contains("… (truncated)"))
    assert(md.contains("### small.txt") && md.contains("hi"))
  }
}
