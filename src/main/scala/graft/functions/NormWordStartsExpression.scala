package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-word CHARACTER offsets for the [[NormWordsExpression]]
  * tokenize — the projection that lets span-granular dedup report
  * coordinates real curation can cut text by. `norm_word_starts(text)`
  * returns, aligned index-for-index with `norm_words(text)`, the
  * 0-based CODEPOINT offset of each word's first character in
  * `lower(text)`.
  *
  * Why offsets into `lower(text)`: the tokenizer scans the lowercased
  * bytes, so that string is the one coordinate system both engines
  * can state identically (DuckDB restates these offsets as cumulative
  * separator/word lengths over the same `lower(text)`). For the ASCII
  * case mappings — every byte the tokenizer keeps is ASCII `[a-z0-9]`
  * — lowercasing preserves length, so the offsets index the ORIGINAL
  * text too; only the rare length-changing Unicode mapping (e.g.
  * U+0130) shifts them, and then only for the characters after it.
  *
  * Codepoint counting rides the same single byte scan as the
  * tokenize: a UTF-8 continuation byte (high bits `10`) never starts
  * a character, so the codepoint index of byte `i` is the count of
  * non-continuation bytes before it. Word CONTENT is pure ASCII, so a
  * word's char length equals `length(word)` — the span consumer
  * derives char ends from the words array and never needs a second
  * offsets column. */
object NormWordStartsExpression {
  /** 0-based codepoint offset of each normalized word in lower(text),
    * aligned with `norm_words(text)` (null → null). */
  def normWordStarts(text: Column): Column =
    ColumnBridge.column(NormWordStarts(ColumnBridge.expression(text)))
}

object NormWordStartsKernel {
  def wordStarts(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    var starts = new Array[Long](16)
    var nw = 0
    var i = 0
    var chars = 0L     // codepoints seen strictly before byte i
    var inWord = false
    while (i < bytes.length) {
      val b = bytes(i)
      val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (keep) {
        if (!inWord) {
          if (nw == starts.length)
            starts = java.util.Arrays.copyOf(starts, nw * 2)
          // a keep byte is ASCII, hence a lead byte: chars IS its index
          starts(nw) = chars
          nw += 1
          inWord = true
        }
      } else inWord = false
      if ((b & 0xC0) != 0x80) chars += 1
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(starts, nw))
  }
}

case class NormWordStarts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_word_starts requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "norm_word_starts"

  override def nullSafeEval(input: Any): Any =
    NormWordStartsKernel.wordStarts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormWordStartsKernel.wordStarts($c)")

  override protected def withNewChildInternal(newChild: Expression): NormWordStarts =
    copy(child = newChild)
}
