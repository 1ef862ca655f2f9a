package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Weighted mode aggregate: `weightedMode(label, w)` returns the label
  * with the LARGEST total weight in the group, smallest label on ties —
  * the exact argmax the label-propagation ballot step computes.
  *
  * Why it exists: the two-step ballot idiom
  * `groupBy(node, label).agg(sum(w))` → `groupBy(node).agg(max_by(...))`
  * pays TWO exchanges per LPA round — one hash-partitioned by
  * (node, label) for the tally, another by (node) for the argmax. This
  * aggregate folds both into ONE `groupBy(node)` exchange: the map-side
  * partial collapses each task's ballots into a (label → weight) map
  * bounded by the node's distinct candidate labels (its neighborhood),
  * so the exchange carries the same (node, label, weight) information
  * the tally exchange carried — and the second exchange disappears.
  * Over `iters` fixed rounds that removes `iters` full shuffle barriers
  * from the critical path of q80/q85.
  *
  * Determinism: weights are integral and summed in longs — associative,
  * partition-order exact (the same contract as the two-step form; see
  * [[graft.scale.Dedup.labelPropagationWeighted]]); the (weight DESC,
  * label ASC) final scan is a total order. Semantics are spec-pinned
  * equal to the two-step formulation, ties included.
  */
object WeightedMode {
  def weightedMode(label: Column, w: Column): Column =
    ColumnBridge.column(WeightedModeAggregate(ColumnBridge.expression(label),
      ColumnBridge.expression(w)).toAggregateExpression())
}

/** Mutable state: a primitive-keyed label → summed-weight map. Node
  * neighborhoods in near-dup graphs are small (dozens), so a LongMap
  * stays tiny; the map is the partial that crosses the exchange. */
final class WeightedModeBuffer {
  val m: scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]
  def add(label: Long, w: Long): Unit =
    m.update(label, m.getOrElse(label, 0L) + w)
}

case class WeightedModeAggregate(
    label: Expression,
    w: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[WeightedModeBuffer] with BinaryLike[Expression] {

  override def left: Expression = label
  override def right: Expression = w
  override def prettyName: String = "weighted_mode"
  // empty group (all-null inputs) has no mode
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (label.dataType == LongType && w.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint) inputs, got " +
        s"(${label.dataType.simpleString}, ${w.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def createAggregationBuffer(): WeightedModeBuffer =
    new WeightedModeBuffer()

  override def update(buf: WeightedModeBuffer, input: InternalRow): WeightedModeBuffer = {
    val l = label.eval(input)
    val wv = w.eval(input)
    if (l != null && wv != null)
      buf.add(l.asInstanceOf[Long], wv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: WeightedModeBuffer, other: WeightedModeBuffer): WeightedModeBuffer = {
    other.m.foreachEntry((l, wv) => buf.add(l, wv))
    buf
  }

  override def eval(buf: WeightedModeBuffer): Any = {
    if (buf.m.isEmpty) return null
    var bestLabel = 0L
    var bestW = Long.MinValue
    var first = true
    buf.m.foreachEntry { (l, wv) =>
      if (first || wv > bestW || (wv == bestW && l < bestLabel)) {
        bestLabel = l; bestW = wv; first = false
      }
    }
    bestLabel
  }

  override def serialize(buf: WeightedModeBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m.size)
    buf.m.foreachEntry { (l, wv) => out.writeLong(l); out.writeLong(wv) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): WeightedModeBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new WeightedModeBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedModeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedModeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedModeAggregate =
    copy(label = newLeft, w = newRight)
}
