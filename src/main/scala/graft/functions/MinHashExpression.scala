package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** Native one-pass MinHash signature: shingle array → array of
  * `numHashes` lexicographic-min md5 hex strings, permutation i keyed
  * as md5("i|" ++ shingle) — value-identical to the composed form
  * `min(md5(concat(lit("i|"), sh)))` over an exploded shingle table,
  * and to the DuckDB oracle `MIN(md5('i|' || sh))`.
  *
  * The composed form explodes every document into its shingles and
  * shuffles them through a 16-column min-aggregate; per document the
  * signature is a simple fold, so this runs rowside at scan speed —
  * no row expansion, no shuffle. Lexicographic min over a keyed md5
  * is a valid MinHash family (SURVEY §7.1 step 8 rationale).
  */
object MinHashExpression {
  /** Signature from the WORDS array — shingling happens inside the
    * kernel. Shingling as a Spark `transform` lambda is a trap: the
    * lambda's `element_at(ws, i)` references re-evaluate an inlined
    * words() regex chain per element once CollapseProject merges the
    * projections (observed 45s for 5000 docs); a kernel reads the
    * materialized array once. */
  def minhashSig(ws: Column, shingleSize: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(ws),
      shingleSize, numHashes))

  /** LSH band hashes in one pass from the words array: md5 of each
    * band's concatenated min signatures. Use with `posexplode`. */
  def minhashBandHashes(ws: Column, shingleSize: Int, numHashes: Int,
                        numBands: Int): Column =
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(ws),
      shingleSize, numHashes, numBands))
}

object MinHashKernel {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  def md5Hex(bytes: Array[Byte]): String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Distinct space-joined word n-gram shingles — identical strings to
    * `concat_ws(" ", ...)` over a sliding window with array_distinct. */
  def shingles(ws: ArrayData, shingleSize: Int): Array[String] = {
    val n = ws.numElements()
    if (n < shingleSize) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= n - shingleSize) {
      sb.setLength(0)
      var k = 0
      while (k < shingleSize) {
        if (k > 0) sb.append(' ')
        if (!ws.isNullAt(i + k)) sb.append(ws.getUTF8String(i + k).toString)
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** numHashes lexicographic-min keyed-md5 values over the shingle set
    * of the words array; fewer than shingleSize words → array of nulls
    * (callers filter `size(ws) >= shingleSize` first, matching the
    * exploded form that produced no row for such docs). */
  def minhash(ws: ArrayData, shingleSize: Int, numHashes: Int): ArrayData = {
    val shs = shingles(ws, shingleSize)
    val mins = new Array[UTF8String](numHashes)
    var i = 0
    while (i < shs.length) {
      val sh = shs(i)
      var p = 0
      while (p < numHashes) {
        val h = UTF8String.fromString(md5Hex(s"$p|$sh".getBytes("UTF-8")))
        if (mins(p) == null || h.compareTo(mins(p)) < 0) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }
}

object MinHashBandsKernel {
  /** Band b's hash = md5Hex(min[b*perBand] ++ … ++ min[(b+1)*perBand-1])
    * — value-identical to `md5(concat(m…))` / DuckDB `md5(m0||m1||…)`. */
  def bands(ws: ArrayData, shingleSize: Int, numHashes: Int,
            numBands: Int): ArrayData = {
    val mins = MinHashKernel.minhash(ws, shingleSize, numHashes)
    val perBand = numHashes / numBands
    val out = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      val sb = new java.lang.StringBuilder(32 * perBand)
      var k = 0
      while (k < perBand) {
        val m = mins.getUTF8String(b * perBand + k)
        if (m != null) sb.append(m.toString)
        k += 1
      }
      out(b) = UTF8String.fromString(
        MinHashKernel.md5Hex(sb.toString.getBytes("UTF-8")))
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashBands(child: Expression, shingleSize: Int, numHashes: Int,
                        numBands: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBandsKernel.bands(input.asInstanceOf[ArrayData], shingleSize,
      numHashes, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBandsKernel.bands($c, $shingleSize, $numHashes, $numBands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.minhash(input.asInstanceOf[ArrayData], shingleSize, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.minhash($c, $shingleSize, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
