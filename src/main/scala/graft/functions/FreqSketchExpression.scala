package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a bounded aggregate:
  * `misraGries(item, capacity)` evaluates to an `array<string>` of at
  * most `capacity` candidate items containing EVERY item whose true
  * frequency exceeds N / (capacity + 1) (Misra & Gries 1982; merge
  * rule per Agarwal et al. 2013, "Mergeable Summaries").
  *
  * The candidate SET is what matters: estimated counts (and therefore
  * which sub-threshold items survive) depend on partitioning and merge
  * order, so the eval deliberately exposes items only — an exact
  * confirm pass downstream restores run-invariant counts
  * ([[graft.scale.TextAnalysis.heavyHitters]], the q93 Bloom-confirm
  * pattern on the frequency axis).
  *
  * Scale shape: the partial (map-side) buffer never exceeds `capacity`
  * entries, so the exchange carries O(capacity · tasks) rows
  * regardless of corpus size OR vocabulary size — the property a plain
  * `groupBy(token).count()` lacks (its exchange is vocabulary-sized,
  * 10⁸+ keys at 100 TB of web text by Heaps' law).
  */
object FreqSketch {
  def misraGries(item: Column, capacity: Int): Column =
    ColumnBridge.column(MisraGriesAggregate(ColumnBridge.expression(item),
      capacity).toAggregateExpression())

  /** Exactness-certifying variant: `struct<cand: array<string>,
    * exact: boolean>` — `exact` is true iff NO decrement ever ran in
    * any partial buffer or merge, i.e. the observed vocabulary never
    * exceeded `capacity` anywhere: then `cand` IS the exact vocabulary
    * and every count was exact. The q96 certification reads this flag
    * instead of re-counting the vocabulary (an exact countDistinct is
    * a vocabulary-sized exchange — the very cost this sketch exists to
    * avoid at 100 TB). */
  def misraGriesExact(item: Column, capacity: Int): Column =
    ColumnBridge.column(MisraGriesAggregate(ColumnBridge.expression(item),
      capacity, withExact = true).toAggregateExpression())

  /** Estimate-emitting variant: `array<struct<item, est>>` ordered
    * (est DESC, item ASC). For surfaces where no exact confirm pass is
    * possible (a streaming window that has already closed): every
    * estimate undercounts by at most N/(capacity+1), and every item
    * above that bound is present — the caller publishes the bound
    * alongside ([[graft.streaming.EventStreams.topTokenMonitor]]).
    * Batch paths that CAN re-scan should confirm instead
    * ([[graft.scale.TextAnalysis.heavyHitters]]). */
  def misraGriesCounts(item: Column, capacity: Int): Column =
    ColumnBridge.column(MisraGriesAggregate(ColumnBridge.expression(item),
      capacity, withCounts = true).toAggregateExpression())
}

/** Mutable Misra–Gries state: at most `cap` (item, count) entries.
  * `add` runs the classic update (hit → increment; room → insert;
  * full → decrement-all, dropping zeros); `spill` runs the mergeable
  * reduction (subtract the (cap+1)-th largest count, drop ≤ 0) used
  * after summary merges. Both preserve the ≤ N/(cap+1) undercount
  * invariant; decrement-all amortizes to O(1) per update (each sweep
  * retires cap+1 units of inserted weight). */
final class MgBuffer(val cap: Int) {
  val counts = new java.util.HashMap[UTF8String, Long](cap * 2)
  /** True once ANY decrement ran (add's sweep or spill's subtraction)
    * in this buffer's history — merged buffers OR their flags. While
    * false, every stored count is exact and the entry set is the
    * complete observed vocabulary. */
  var decremented: Boolean = false

  def add(item: UTF8String, w: Long): Unit = {
    val cur = counts.get(item)
    if (cur != 0L) counts.put(item, cur + w)
    else if (counts.size < cap) counts.put(item, w)
    else {
      // no slot: decrement all by min(w, smallest count); repeating
      // until either w is exhausted or a slot opens keeps the
      // weighted update exact (w > 1 arrives only via merge())
      decremented = true
      var rem = w
      while (rem > 0 && counts.size == cap) {
        var minC = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) { val c = it0.next(); if (c < minC) minC = c }
        val dec = math.min(rem, minC)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nc = e.getValue - dec
          if (nc <= 0L) it.remove() else e.setValue(nc)
        }
        rem -= dec
      }
      if (rem > 0) counts.put(item, rem)
    }
  }

  /** Reduce to ≤ cap entries after a merge: subtract the (cap+1)-th
    * largest count from every entry and drop the non-positive. */
  def spill(): Unit = {
    if (counts.size <= cap) return
    decremented = true
    val vals = new Array[Long](counts.size)
    var i = 0
    val it0 = counts.values().iterator()
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    // (cap+1)-th largest = index size-cap-1 of the ascending sort
    val sub = vals(vals.length - cap - 1)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nc = e.getValue - sub
      if (nc <= 0L) it.remove() else e.setValue(nc)
    }
  }
}

case class MisraGriesAggregate(
    item: Expression,
    capacity: Int,
    withCounts: Boolean = false,
    withExact: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  override def child: Expression = item
  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType && capacity >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and capacity >= 1, got " +
        s"${item.dataType.simpleString}, capacity=$capacity")

  override def dataType: DataType =
    if (withExact) StructType(Seq(
      StructField("cand", ArrayType(StringType, containsNull = false),
        nullable = false),
      StructField("exact", BooleanType, nullable = false)))
    else if (withCounts) ArrayType(
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("est", LongType, nullable = false))),
      containsNull = false)
    else ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    if (v != null) {
      // clone: the UTF8String may alias a buffer the scan reuses
      buf.add(v.asInstanceOf[UTF8String].clone(), 1L)
    }
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.decremented ||= other.decremented
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.counts.get(e.getKey)
      buf.counts.put(e.getKey, cur + e.getValue)
    }
    buf.spill()
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    if (withCounts) {
      val entries = new Array[(UTF8String, Long)](buf.counts.size)
      var i = 0
      val it = buf.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
      }
      // est DESC, item ASC — the board order a monitor reads top-down
      val sorted = entries.sortWith { (a, b) =>
        if (a._2 != b._2) a._2 > b._2 else a._1.compareTo(b._1) < 0
      }
      new GenericArrayData(sorted.map(e =>
        new GenericInternalRow(Array[Any](e._1, e._2))).asInstanceOf[Array[Any]])
    } else {
      val items = new Array[AnyRef](buf.counts.size)
      buf.counts.keySet().toArray(items)
      // UTF8 binary ascending — a deterministic order for the emitted
      // candidate list (the set, not the order, is the contract)
      java.util.Arrays.sort(items,
        (a: AnyRef, b: AnyRef) =>
          a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))
      val arr = new GenericArrayData(items.asInstanceOf[Array[Any]])
      if (withExact)
        new GenericInternalRow(Array[Any](arr, !buf.decremented))
      else arr
    }
  }

  /** Buffer wire-format version. v2 added the `decremented` exactness
    * flag in front of the entry count; the leading version byte makes
    * a stale streaming-state checkpoint (e.g. one written by the
    * pre-flag format, whose first byte is a count/boolean 0x00/0x01)
    * fail LOUDLY on restore instead of silently misparsing — an
    * MG-bearing streaming checkpoint from an older build must be
    * discarded, not resumed. */
  private val MgWireVersion: Byte = 2

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(MgWireVersion)
    out.writeBoolean(buf.decremented)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ver = in.readByte()
    require(ver == MgWireVersion,
      s"Misra-Gries buffer wire-format $ver != $MgWireVersion: this is " +
        "a checkpoint from an incompatible build - discard and rebuild " +
        "the streaming state")
    val buf = new MgBuffer(capacity)
    buf.decremented = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesAggregate =
    copy(item = newChild)
}
