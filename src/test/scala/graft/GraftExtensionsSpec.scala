package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("array_dot / array_cosine resolve in plain SQL via extensions") {
    val spark = SparkSpec.session // built with spark.sql.extensions=graft.GraftExtensions
    val row = spark.sql(
      """SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       array_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c""".stripMargin)
      .head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 1.0)
  }

  test("sketch kernels resolve in plain SQL: simhash60, minhash_sig, minhash_bands") {
    val spark = SparkSpec.session
    val row = spark.sql(
      """SELECT simhash60(array('a', 'b', 'a')) AS sh,
        |       minhash_sig(array('a','b','c','d','e'), 4, 16) AS sig,
        |       minhash_bands(array('a','b','c','d','e'), 4, 16, 4) AS bands""".stripMargin)
      .head()
    // same values as the Column API — one shared kernel
    import org.apache.spark.sql.functions.col
    import graft.functions.{MinHashExpression, SimHashExpression}
    val viaApi = spark.sql("SELECT array('a','b','a') AS w, array('a','b','c','d','e') AS s")
      .select(SimHashExpression.simhash60(col("w")).as("sh"),
        MinHashExpression.minhashSig(col("s"), 4, 16).as("sig"))
      .head()
    assert(row.getLong(0) === viaApi.getLong(0))
    assert(row.getSeq[String](1) === viaApi.getSeq[String](1))
    assert(row.getSeq[String](2).length === 4)
    // sketch parameters must be literals — a column reference is rejected
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), CAST(id AS INT), 16) FROM range(1)").head()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("norm_words resolves in plain SQL and matches the Column API") {
    val spark = SparkSpec.session
    val viaSql = spark.sql("SELECT norm_words('The Quick... brown FOX!!') AS ws")
      .head().getSeq[String](0)
    assert(viaSql === Seq("the", "quick", "brown", "fox"))
    import org.apache.spark.sql.functions.lit
    val viaApi = spark.range(1)
      .select(graft.functions.PortableFuncs.words(lit("The Quick... brown FOX!!")))
      .head().getSeq[String](0)
    assert(viaSql === viaApi)
  }

  test("word_shingles resolves in plain SQL, including distinct mode") {
    val spark = SparkSpec.session
    val r = spark.sql(
      """SELECT word_shingles(array('a','b','a','b'), 2) AS all,
        |       word_shingles(array('a','b','a','b'), 2, true) AS dst""".stripMargin)
      .head()
    assert(r.getSeq[String](0) === Seq("a b", "b a", "a b"))
    assert(r.getSeq[String](1) === Seq("a b", "b a"))
  }

  test("type mismatch surfaces the expression's own check message") {
    val spark = SparkSpec.session
    val e = intercept[Exception] {
      spark.sql("SELECT array_dot(array('x'), array(1.0d))").head()
    }
    assert(e.getMessage.contains("array_dot requires two array<double|float>"))
  }
}
