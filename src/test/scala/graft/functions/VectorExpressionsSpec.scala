package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  def df = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(1.0, 0.0), Array(0.0, 1.0)),
      (3L, Array(2.0, 0.0), Array(4.0, 0.0))
    ).toDF("id", "a", "b")
  }

  // reference implementation: the interpreted HOF fold the native
  // expressions replaced — kept here to pin bit-identical accumulation
  def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("ArrayDot matches the built-in fold bit-for-bit") {
    val rows = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("fast"),
      foldDot(col("a"), col("b")).as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("ArrayCosine matches the composed expression bit-for-bit") {
    val rows = df.select(
      VectorExpressions.cosineFused(col("a"), col("b")).as("fast"),
      (foldDot(col("a"), col("b")) /
        (sqrt(foldDot(col("a"), col("a"))) * sqrt(foldDot(col("b"), col("b"))))).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("cosine values are correct: orthogonal=0, parallel=1") {
    val m = df.select(col("id"), VectorExpressions.cosineFused(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(2L) === 0.0)
    assert(m(3L) === 1.0)
  }

  test("null inputs yield null, and the expression participates in codegen") {
    val spark2 = spark
    import spark2.implicits._
    val withNull = Seq((Some(Array(1.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    assert(withNull.select(VectorExpressions.dot(col("a"), col("b")))
      .head().isNullAt(0))
    // the generated plan stays inside WholeStageCodegen (no fallback) —
    // use a file-backed scan so ConvertToLocalRelation can't pre-evaluate
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val plan = emb.select(VectorExpressions.cosineFused(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    // '*(n)' prefixes mark WholeStageCodegen stages in the plan string;
    // the array_cosine projection must carry one (no codegen fallback)
    assert(plan.linesIterator.exists(l =>
      l.contains("array_cosine") && l.trim.startsWith("*(")))
  }
}
