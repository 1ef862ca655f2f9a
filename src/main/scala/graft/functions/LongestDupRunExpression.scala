package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Longest repeated word-run per document — the kernel companion to
  * `norm_words` / `word_shingles`: given a words array, the length of
  * the longest word SEQUENCE that occurs at least twice in the array
  * (occurrences may overlap; 0 when nothing repeats). The per-document
  * within-doc twin of [[graft.scale.Dedup.dupSpans]]' cross-document
  * spans: a high value flags degenerate repetition (lorem-loops,
  * keyword stuffing, decode glitches) that n-gram ratio heuristics
  * blur away, and unlike a fixed-k repeated-shingle check it finds the
  * maximal k in one pass.
  *
  * Algorithm: a suffix automaton over the word-id sequence — O(n)
  * states/transitions for an n-word document. A sequence repeats iff
  * some automaton state has occurrence count ≥ 2 (counts seeded at
  * non-clone states and propagated up suffix links in decreasing
  * max-length order); the answer is the max state length among those.
  * Per-row arithmetic only — as a projection this runs scan-side
  * inside WholeStageCodegen with no shuffle, no row expansion.
  *
  * The DuckDB oracle states the same number independently via the
  * classic suffix-sort identity: the longest repeated substring length
  * equals the maximum longest-common-prefix of lexicographically
  * ADJACENT suffixes — two completely different algorithms agreeing is
  * the correctness check.
  */
object LongestDupRunExpression {
  def longestDupRun(ws: Column): Column =
    ColumnBridge.column(LongestDupRun(ColumnBridge.expression(ws)))
}

object LongestDupRunKernel {

  /** Suffix-automaton longest-repeated-run length over a string array. */
  def longestDupRun(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n < 2) return 0
    // dense word ids: the automaton alphabet is the document's own
    // vocabulary, so transition maps stay small
    val ids = new Array[Int](n)
    locally {
      val dict = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](n * 2)
      var i = 0
      while (i < n) {
        val w = arr.getUTF8String(i)
        val seen = dict.get(w)
        if (seen == null) { dict.put(w, dict.size); ids(i) = dict.size - 1 }
        else ids(i) = seen
        i += 1
      }
    }
    // suffix automaton: at most 2n-1 states for n >= 2
    val cap = 2 * n + 2
    val len = new Array[Int](cap)
    val link = new Array[Int](cap)
    val cnt = new Array[Int](cap)
    val trans = new Array[java.util.HashMap[Integer, Integer]](cap)
    trans(0) = new java.util.HashMap[Integer, Integer]()
    link(0) = -1
    var size = 1
    var last = 0
    var i = 0
    while (i < n) {
      val c: Integer = ids(i)
      val cur = size; size += 1
      len(cur) = len(last) + 1
      cnt(cur) = 1
      trans(cur) = new java.util.HashMap[Integer, Integer]()
      var p = last
      while (p != -1 && !trans(p).containsKey(c)) {
        trans(p).put(c, cur); p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q: Int = trans(p).get(c)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          cnt(clone) = 0
          trans(clone) = new java.util.HashMap[Integer, Integer](trans(q))
          while (p != -1 && {
            val t = trans(p).get(c); t != null && t.intValue() == q
          }) {
            trans(p).put(c, clone); p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      i += 1
    }
    // occurrence counts: propagate up suffix links in decreasing len
    // order (counting sort by len — len(v) <= n always)
    val byLen = new Array[Int](n + 2)
    var v = 1
    while (v < size) { byLen(len(v)) += 1; v += 1 }
    var l = 1
    while (l <= n) { byLen(l) += byLen(l - 1); l += 1 }
    val order = new Array[Int](size - 1)
    v = 1
    while (v < size) {
      byLen(len(v)) -= 1; order(byLen(len(v))) = v; v += 1
    }
    var best = 0
    var k = order.length - 1
    while (k >= 0) {
      val s = order(k)
      if (cnt(s) >= 2 && len(s) > best) best = len(s)
      if (link(s) > 0) cnt(link(s)) += cnt(s)
      else if (link(s) == 0) () // root collects everything; never counted
      k -= 1
    }
    best
  }
}

case class LongestDupRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"longest_dup_run requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "longest_dup_run"

  override def nullSafeEval(input: Any): Any =
    LongestDupRunKernel.longestDupRun(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LongestDupRunKernel.longestDupRun($c)")

  override protected def withNewChildInternal(newChild: Expression): LongestDupRun =
    copy(child = newChild)
}
