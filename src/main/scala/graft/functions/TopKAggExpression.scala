package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate: `topK(score, id, k)` keeps the k largest
  * (score, id) pairs per group — ordered by score DESC with id ASC as
  * the deterministic tiebreak — and evaluates to
  * `array<struct<id: bigint, score: double>>` in that order.
  *
  * This replaces the `row_number() OVER (PARTITION BY group ORDER BY
  * score DESC)` + `rank <= k` idiom on the exact-kNN path. The window
  * formulation shuffles EVERY scored row into its group's partition
  * and sorts the lot — at 100 TB that's corpus-size rows per query
  * funneled through Q partitions. As a TypedImperativeAggregate the
  * partial (map-side) aggregate caps each task's contribution at k
  * rows per group, so the exchange carries O(k · tasks · groups)
  * rows regardless of corpus size, and the final merge is a k-way
  * list merge. Semantics are pinned identical to the window form by
  * SimilaritySpec (equality on random corpora, exact-tie battery).
  *
  * The buffer is a pair of primitive arrays compacted by sort+truncate
  * whenever they fill (amortized O(log cap) per row, no boxing);
  * shuffle serialization writes the compacted ≤ k survivors only.
  */
object TopKAgg {
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKAggregate(ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())

  /** String-keyed variant: ties broken by id ASC in UTF8 binary order
    * (DuckDB's default varchar collation, so oracle ordering matches). */
  def topKStr(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKStrAggregate(ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())
}

/** Mutable aggregation state for [[TopKAggregate]]: parallel primitive
  * arrays holding up to `cap` candidate (score, id) pairs; `compact()`
  * sorts by (score DESC, id ASC) and truncates to k. */
final class TopKBuffer(val k: Int) {
  val cap: Int = math.max(4 * k, 64)
  var scores: Array[Double] = new Array[Double](cap)
  var ids: Array[Long] = new Array[Long](cap)
  var size: Int = 0

  def add(score: Double, id: Long): Unit = {
    if (size == cap) compact()
    scores(size) = score
    ids(size) = id
    size += 1
  }

  /** Sort candidates by (score DESC, id ASC) and keep the first k. */
  def compact(): Unit = {
    val idx = Array.range(0, size).sortWith { (a, b) =>
      val c = java.lang.Double.compare(scores(b), scores(a))
      if (c != 0) c < 0 else ids(a) < ids(b)
    }
    val keep = math.min(k, size)
    val ns = new Array[Double](cap)
    val ni = new Array[Long](cap)
    var i = 0
    while (i < keep) { ns(i) = scores(idx(i)); ni(i) = ids(idx(i)); i += 1 }
    scores = ns
    ids = ni
    size = keep
  }
}

case class TopKAggregate(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = id
  override def prettyName: String = "top_k"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint) inputs and k >= 1, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString}), k=$k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.add(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    buf.compact()
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    buf.compact()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i))
      out.writeLong(buf.ids(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAggregate =
    copy(score = newLeft, id = newRight)
}

/** [[TopKBuffer]]'s string-keyed sibling: ids are owned UTF8String
  * copies (update MUST clone — the evaluated value may point into a
  * reused unsafe-row buffer), ordered score DESC then id ASC in UTF8
  * binary order. */
final class TopKStrBuffer(val k: Int) {
  val cap: Int = math.max(4 * k, 64)
  var scores: Array[Double] = new Array[Double](cap)
  var ids: Array[UTF8String] = new Array[UTF8String](cap)
  var size: Int = 0

  def add(score: Double, id: UTF8String): Unit = {
    if (size == cap) compact()
    scores(size) = score
    ids(size) = id
    size += 1
  }

  def compact(): Unit = {
    val idx = Array.range(0, size).sortWith { (a, b) =>
      val c = java.lang.Double.compare(scores(b), scores(a))
      if (c != 0) c < 0 else ids(a).compareTo(ids(b)) < 0
    }
    val keep = math.min(k, size)
    val ns = new Array[Double](cap)
    val ni = new Array[UTF8String](cap)
    var i = 0
    while (i < keep) { ns(i) = scores(idx(i)); ni(i) = ids(idx(i)); i += 1 }
    scores = ns
    ids = ni
    size = keep
  }
}

case class TopKStrAggregate(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] with BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = id
  override def prettyName: String = "top_k_str"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == StringType && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, string) inputs and k >= 1, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString}), k=$k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // clone: the UTF8String may alias a buffer the scan reuses
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(buf: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    var i = 0
    while (i < other.size) { buf.add(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKStrBuffer): Any = {
    buf.compact()
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    buf.compact()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i))
      val b = buf.ids(i).getBytes
      out.writeInt(b.length)
      out.write(b)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKStrBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(s, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKStrAggregate =
    copy(score = newLeft, id = newRight)
}
