package graft

import graft.functions.{ArrayCosine, ArrayDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering the engine's native expressions as
  * SQL functions, so `spark.sql("SELECT array_cosine(a, b) ...")`
  * works anywhere the library is on the classpath:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot takes exactly 2 arguments")
        ArrayDot(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_cosine"),
      new ExpressionInfo(classOf[ArrayCosine].getName, "array_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_cosine takes exactly 2 arguments")
        ArrayCosine(args(0), args(1))
      }))
  }
}
