package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType}

import scala.collection.mutable.ArrayBuffer

/** Bounded per-group collect: gathers up to `cap` child values, and the
  * moment a group exceeds the cap its result becomes NULL — the group is
  * marked oversized without ever holding more than `cap + 1` elements of
  * state on any partial, merge, or final buffer.
  *
  * This is the aggregation-side form of [[graft.operators.Dedup.capBuckets]]
  * (drop every LSH bucket larger than the cap): instead of counting
  * bucket sizes in one pass and anti-joining the hot set in a second,
  * the single groupBy both applies the cap and materializes the bucket
  * members for pair generation — one shuffle where the count + anti-join
  * + self-join formulation needs three reads of the banded rows. The
  * bounded buffer is what makes it 100-TB-safe: a degenerate bucket
  * (boilerplate corpus, hot template) saturates at cap + 1 elements
  * instead of OOMing the executor the way a plain `collect_list` would.
  *
  * Reference context: the LSH dedup operators this serves re-express
  * `datafusion-table-providers`-adjacent pipeline needs; the aggregate
  * itself follows Spark's own `Collect` buffer/serialize design.
  */
case class CollectCappedAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "collect_capped"

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

  private def copyValue(v: Any): Any = v match {
    case r: UnsafeRow => r.copy()
    case other => InternalRow.copyValue(other)
  }

  override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    // saturated at cap + 1: the group is already known-oversized, stop
    // accumulating (state stays bounded on every partial)
    if (buf.length <= cap) {
      val v = child.eval(input)
      if (v != null) buf += copyValue(v)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    var i = 0
    while (buf.length <= cap && i < other.length) {
      buf += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: ArrayBuffer[Any]): Any =
    if (buf.length > cap) null else new GenericArrayData(buf.toArray)

  // serialize partials as a single-column UnsafeRow holding the array
  // (the same scheme Spark's own Collect aggregate uses)
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      buf += copyValue(arr.get(i, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCappedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCappedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectCappedAgg =
    copy(child = newChildren.head)
}

/** Weighted form of [[CollectCappedAgg]]: gathers child values while the
  * group's Σ `weight` stays ≤ `cap`, NULL once it exceeds — the
  * bucket-drop census when each collected row REPRESENTS `weight` raw
  * rows (the r17 exact-duplicate pre-collapse: one row per distinct
  * SimHash signature carrying its copy count, capped on the RAW doc
  * count so the collapsed plan is byte-identical to the uncollapsed
  * oracle's bucket census). Same bounded-state guarantee: weights are
  * ≥ 1, so at most `cap` elements are ever held, and a saturated
  * buffer clears its items and stops accumulating.
  */
case class CollectWeightCappedAgg(
    child: Expression,
    weight: Expression,
    cap: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CollectWeightCappedAgg.Buf] {
  import CollectWeightCappedAgg.Buf

  require(cap > 0, s"cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "collect_wcapped"

  override def createAggregationBuffer(): Buf = new Buf(0L, ArrayBuffer.empty)

  private def copyValue(v: Any): Any = v match {
    case r: UnsafeRow => r.copy()
    case other => InternalRow.copyValue(other)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    if (buf.w <= cap) { // saturated buffers stop accumulating
      // NULL children are ignored ENTIRELY — item AND weight (ADVICE
      // r17): the unweighted twin skips NULL children without consuming
      // cap budget, and this aggregate's contract is "the weighted form
      // of CollectCappedAgg", so a NULL item must not count toward the
      // census either. Bounded state is unaffected: a skipped row adds
      // nothing to the buffer.
      val v = child.eval(input)
      if (v != null) {
        val w = weight.eval(input)
        require(w != null, "collect_wcapped: weight must be non-null")
        val wv = w.asInstanceOf[Number].longValue()
        // the bounded-state guarantee (≤ cap items held) REQUIRES every
        // row to consume cap budget: a zero/negative weight would collect
        // without bound, and clamping at cap + 1 each step is what keeps
        // the running sum overflow-free — enforce, don't assume
        require(wv >= 1, s"collect_wcapped: weight must be ≥ 1, got $wv")
        // clamp the addend too: buf.w ≤ cap+1 by invariant, so the sum of
        // two clamped terms cannot overflow for any input weight
        buf.w = math.min(buf.w + math.min(wv, cap + 1), cap + 1)
        if (buf.w > cap) buf.items.clear()
        else buf.items += copyValue(v)
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf.w = math.min(buf.w + other.w, cap + 1)
    if (buf.w > cap) buf.items.clear()
    else buf.items ++= other.items
    buf
  }

  override def eval(buf: Buf): Any =
    if (buf.w > cap) null else new GenericArrayData(buf.items.toArray)

  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false),
      org.apache.spark.sql.types.LongType))

  override def serialize(buf: Buf): Array[Byte] =
    projection.apply(InternalRow.apply(
      new GenericArrayData(buf.items.toArray), buf.w)).getBytes

  override def deserialize(bytes: Array[Byte]): Buf = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = new Buf(row.getLong(1), ArrayBuffer.empty)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      buf.items += copyValue(arr.get(i, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectWeightCappedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectWeightCappedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectWeightCappedAgg =
    copy(child = newChildren.head, weight = newChildren(1))
}

object CollectWeightCappedAgg {
  /** Mutable buffer: running Σ weight (clamped at cap + 1) + items. */
  final class Buf(var w: Long, val items: ArrayBuffer[Any])
}

object CollectCapped {
  /** Array of up to `cap` values of `c` per group; NULL once the group
    * exceeds the cap. Element order is accumulation order — sort in the
    * query if determinism over elements is needed.
    */
  def collect_capped(c: Column, cap: Int): Column =
    Bridge.column(CollectCappedAgg(Bridge.expression(c), cap).toAggregateExpression())

  /** Array of values of `c` per group while Σ `w` ≤ `cap`; NULL once the
    * group's Σ `w` exceeds the cap.
    */
  def collect_wcapped(c: Column, w: Column, cap: Long): Column =
    Bridge.column(CollectWeightCappedAgg(Bridge.expression(c),
      Bridge.expression(w), cap).toAggregateExpression())
}
