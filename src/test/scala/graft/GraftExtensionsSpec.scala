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

  test("type mismatch surfaces the expression's own check message") {
    val spark = SparkSpec.session
    val e = intercept[Exception] {
      spark.sql("SELECT array_dot(array('x'), array(1.0d))").head()
    }
    assert(e.getMessage.contains("array_dot requires two array<double>"))
  }
}
