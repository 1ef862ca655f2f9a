package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import java.security.MessageDigest

/** Native one-pass SimHash: words array → 60-bit signature.
  *
  * The composed formulation (explode words → md5/conv per row → 60
  * `sum(when(shiftright...))` aggregate columns → group back by doc)
  * multiplies rows ~100× and shuffles them just to sum per-bit ±1
  * counters. Per-document the computation is a simple fold, so this
  * expression does the whole thing rowside: md5 each word (identical
  * value to Spark's `md5`/the DuckDB oracle: first 15 hex chars = high
  * 60 bits of the digest), accumulate 60 counters, emit the sign bits.
  * No explode, no shuffle, frequency-weighted exactly like the
  * exploded form. Codegen emits a call to the static kernel — one
  * invocation per row inside WholeStageCodegen.
  */
object SimHashExpression {
  /** simhash60 over an array<string> words column (null → null). */
  def simhash60(words: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(words)))
}

object SimHashKernel {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** High 60 bits of md5(word) — identical to
    * `conv(substring(md5(w),1,15),16,10)`. */
  def hash60(word: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(word)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Frequency-weighted 60-bit SimHash over the words array. */
  def simhash60(words: ArrayData): Long = {
    val n = words.numElements()
    val counters = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val h = hash60(words.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (counters(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashKernel.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
