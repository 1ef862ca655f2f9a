package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormWordsSpec extends SparkSpec {

  test("native norm_words equals the composed regex formulation on " +
    "adversarial inputs (unicode, punctuation runs, digits, empties)") {
    val spark2 = spark
    import spark2.implicits._
    val inputs = Seq(
      "the Quick  BROWN fox!!",
      "  leading and trailing   ",
      "",
      "...",
      "tabs\tand\nnewlines\r\nsplit words",
      "digits 123 mix3d w0rds 456",
      "unicode: café Über straße 中文 emoji😀tail",
      "Kelvin sign K maps to k",
      "a",
      "punct-hyphen under_score dot.sep comma,sep",
      "ALL CAPS SENTENCE",
      "x" * 2000 + "!" + "y" * 2000
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = inputs.toDF("id", "text")
    val both = df.select(col("id"),
      PortableFuncs.words(col("text")).as("native"),
      PortableFuncs.wordsComposed(col("text")).as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"mismatch for input id ${r.getLong(0)}")
    }
    // null text → null array on both paths
    val n = Seq((0L, None: Option[String])).toDF("id", "text")
      .select(PortableFuncs.words(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("norm_words stays inside whole-stage codegen over a file scan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = docs.select(PortableFuncs.words(col("text")).as("ws"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("norm_words") && l.trim.startsWith("*(")),
      s"norm_words fell out of codegen:\n$plan")
  }
}
