package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {

  test("native word_shingles equals the composed transform formulation, " +
    "and distinct mode equals array_distinct over it") {
    val spark2 = spark
    import spark2.implicits._
    val inputs = Seq(
      Seq("a", "b", "c", "d", "e"),
      Seq("x", "x", "x", "x"),          // duplicate shingles
      Seq("a", "b"),                    // fewer than n=4 words
      Seq("one"),
      Seq.empty[String],
      Seq("repeat", "me", "repeat", "me", "repeat", "me")
    ).zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
    val df = inputs.toDF("id", "ws")
    for (n <- Seq(2, 4)) {
      val rows = df.select(col("id"),
        PortableFuncs.shinglesFromWords(col("ws"), n).as("native"),
        PortableFuncs.shinglesComposed(col("ws"), n).as("composed"),
        PortableFuncs.distinctShingles(col("ws"), n).as("nativeDistinct"),
        array_distinct(PortableFuncs.shinglesComposed(col("ws"), n)).as("composedDistinct"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"all-shingles mismatch n=$n id=${r.getLong(0)}")
        assert(r.getSeq[String](3) === r.getSeq[String](4),
          s"distinct mismatch n=$n id=${r.getLong(0)}")
      }
    }
    // null words array → empty array, the composed otherwise-branch
    val n0 = Seq((0L, None: Option[Seq[String]])).toDF("id", "ws")
      .select(PortableFuncs.shinglesFromWords(col("ws"), 2)).head()
    assert(n0.getSeq[String](0) === Seq.empty)
  }

  test("word_shingles stays inside whole-stage codegen over a file scan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = docs
      .select(PortableFuncs.words(col("text")).as("ws"))
      .select(PortableFuncs.shinglesFromWords(col("ws"), 4).as("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("word_shingles") && l.trim.startsWith("*(")),
      s"word_shingles fell out of codegen:\n$plan")
  }
}
