package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * `TypedImperativeAggregate` — the kind of custom sketch SURVEY §7.4
  * anticipates ("MinHash/HLL as TypedImperativeAggregate"), built the
  * Spark-native way: a bounded k-element buffer per partition, partial
  * buffers merged map-side, O(k) state regardless of group cardinality.
  *
  * The aggregate returns the k-th smallest DISTINCT value of its input
  * (or null if fewer than k distinct values were seen). Fed with the
  * cross-engine [[CrossHash.h60]] 60-bit hash, the result is exactly
  * reproducible by any engine (the DuckDB oracle computes it with a
  * window rank), and the standard KMV estimate
  * `(k-1) * 2^60 / kth_min` estimates the group's distinct count —
  * a mergeable sketch usable at any scale, unlike exact COUNT(DISTINCT)
  * whose state grows with cardinality.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  // fail at construction (analysis for the SQL surface), not as a
  // NoSuchElementException on an empty buffer inside a task
  require(k >= 1, s"kmv_kth_min: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_kth_min"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast() // keep the k smallest distinct
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) null else buf.last().longValue()

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** k-th smallest distinct value of `c` (null if < k distinct). */
  def kth_min(c: Column, k: Int): Column =
    Bridge.column(KmvSketchAgg(Bridge.expression(c), k).toAggregateExpression())
}
