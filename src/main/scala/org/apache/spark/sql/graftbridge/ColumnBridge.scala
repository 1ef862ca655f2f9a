package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the supported way to lift a custom Catalyst [[Expression]] into the
  * public Column API from outside Spark (Spark 4 removed the public
  * `new Column(expr)` constructor; `ExpressionUtils` replaces it in
  * `org.apache.spark.sql.classic.columnNodeSupport`).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
