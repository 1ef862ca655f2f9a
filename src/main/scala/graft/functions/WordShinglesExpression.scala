package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding-window word shingles — one pass over the words
  * array instead of the composed
  * `when(size ≥ n, transform(sequence(…), i → concat_ws(" ", element_at…)))`
  * chain, whose lambda evaluates interpreted (n `element_at` calls and
  * a `concat_ws` per shingle, no codegen, no CSE).
  *
  * Exact equivalence with the composed form (the DuckDB oracle keeps
  * its own formulation, so strings must match byte-for-byte):
  *  - shingle i = words[i..i+n-1] joined by one space, `concat_ws`
  *    null-skipping semantics (irrelevant in practice — [[NormWords]]
  *    arrays are null-free);
  *  - fewer than n words → EMPTY array (the composed `otherwise`),
  *    including a NULL input array (`when` on a null size also falls
  *    to the otherwise branch) — hence this expression is never null;
  *  - `distinct = true` keeps first occurrences in order, identical
  *    to `array_distinct` over the full shingle list.
  */
object WordShinglesExpression {
  def wordShingles(ws: Column, n: Int, distinct: Boolean = false): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(ws), n, distinct))
}

object WordShinglesKernel {
  def wordShingles(ws: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    if (ws == null) return new GenericArrayData(Array.empty[Any])
    val m = ws.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val sb = new java.lang.StringBuilder()
    val out = new java.util.ArrayList[AnyRef](m - n + 1)
    val seen = if (distinct) new java.util.HashSet[String]() else null
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var first = true
      var k = 0
      while (k < n) {
        if (!ws.isNullAt(i + k)) {
          if (!first) sb.append(' ')
          sb.append(ws.getUTF8String(i + k).toString)
          first = false
        }
        k += 1
      }
      val s = sb.toString
      if (seen == null || seen.add(s)) out.add(UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  // null input maps to the empty array (composed `otherwise` branch)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    WordShinglesKernel.wordShingles(
      child.eval(input).asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.WordShinglesKernel.wordShingles(
            ${c.isNull} ? null : ${c.value}, $n, $distinct);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
