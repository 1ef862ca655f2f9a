package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass normalize+tokenize — the hot path of ~20 gate
  * queries (every text-analysis, dedup and curation operator starts
  * from `words(text)`).
  *
  * The composed formulation
  * `filter(split(trim(regexp_replace(regexp_replace(lower(text), …`
  * makes TWO full regex passes over every document, materializes the
  * collapsed string, splits it, and then runs an interpreted HOF
  * lambda per token to drop empties. This expression produces the
  * identical array in ONE byte scan of the lowercased string.
  *
  * Exact-equivalence argument (the DuckDB oracle keeps the regex
  * formulation, so this MUST match bit-for-bit):
  *  - lowercasing uses `UTF8String.toLowerCase` — the same call
  *    Spark's `lower()` makes, so Unicode case mappings agree;
  *  - the regex keeps `[a-z0-9 ]` and turns everything else into a
  *    space, then splits on runs of spaces dropping empties — i.e.
  *    every char outside ASCII `[a-z0-9]` is a separator and
  *    consecutive separators collapse. Iterating BYTES is safe: in
  *    UTF-8 every byte of a multi-byte character has the high bit
  *    set, so it can never alias an ASCII `[a-z0-9]` byte — each such
  *    byte just extends the separator run the regex would have
  *    produced for the character.
  */
object NormWordsExpression {
  /** Tokenize normalized text into words (null → null). */
  def normWords(text: Column): Column =
    ColumnBridge.column(NormWords(ColumnBridge.expression(text)))
}

object NormWordsKernel {
  def normWords(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val words = new java.util.ArrayList[UTF8String]()
    var i = 0
    var start = -1
    while (i < bytes.length) {
      val b = bytes(i)
      val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (keep) {
        if (start < 0) start = i
      } else if (start >= 0) {
        words.add(UTF8String.fromBytes(bytes, start, i - start))
        start = -1
      }
      i += 1
    }
    if (start >= 0)
      words.add(UTF8String.fromBytes(bytes, start, bytes.length - start))
    new GenericArrayData(words.toArray(new Array[UTF8String](words.size)))
  }
}

case class NormWords(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_words requires string, got ${other.simpleString}")
  }
  // elements are never null, matching the filtered-split formulation
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "norm_words"

  override def nullSafeEval(input: Any): Any =
    NormWordsKernel.normWords(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormWordsKernel.normWords($c)")

  override protected def withNewChildInternal(newChild: Expression): NormWords =
    copy(child = newChild)
}
