package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Misra–Gries frequent-items ("heavy hitters") sketch as a native
  * Catalyst `TypedImperativeAggregate` — the second mergeable sketch of
  * the sketch family SURVEY §7.4 anticipates (KMV is the first,
  * [[KmvSketchAgg]]).
  *
  * State is a bounded map of at most `capacity` (item → counter)
  * entries. The classic guarantees hold under merge (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): every item with true frequency
  * > n/(capacity+1) is present, and each reported counter
  * undercounts by at most n/(capacity+1). When the number of DISTINCT
  * items never exceeds `capacity`, no decrement ever fires and every
  * counter is EXACT — the regime the correctness gate exercises (the
  * q88 oracle is a plain GROUP BY count), while FreqSketchSpec also
  * pins the bounded-error behavior with capacity < distinct.
  *
  * Scale shape: O(capacity) state per group regardless of group size,
  * partial sketches merged map-side — the distributed-safe replacement
  * for an exact token-frequency GROUP BY whose state is
  * vocabulary-sized.
  */
case class FreqSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity >= 1, s"freq_sketch: capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def offer(buf: java.util.HashMap[String, Long], item: String,
      weight: Long): Unit = FreqSketch.offer(buf, item, weight, capacity)

  override def update(buf: java.util.HashMap[String, Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.getKey, e.getValue)
    }
    buf
  }

  /** Deterministic output: map in sorted-key order (map equality is
    * order-insensitive, but a stable order keeps row bytes identical
    * across partitionings for the driver's hash compare). */
  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new java.util.ArrayList[String](buf.keySet())
    java.util.Collections.sort(keys)
    val n = keys.size()
    val ks = new Array[Any](n)
    val vs = new Array[Any](n)
    var i = 0
    while (i < n) {
      val k = keys.get(i)
      ks(i) = UTF8String.fromString(k)
      vs(i) = buf.get(k)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed UTF-8 (writeUTF caps at 64 KB per string; a
      // degenerate "item" — an unsplit document — must not crash the
      // aggregation, it just costs its own bytes)
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** Misra–Gries heavy-hitter sketch of `c`: map(item → counter),
    * ≤ `capacity` entries, mergeable, exact when distinct ≤ capacity. */
  def freq_sketch(c: Column, capacity: Int): Column =
    Bridge.column(FreqSketchAgg(Bridge.expression(c), capacity).toAggregateExpression())

  /** The Misra–Gries step, weighted so sketch merge reuses it (and so
    * streaming state updates share the exact same code path —
    * [[graft.streaming.EventStream.heavyHittersStream]]): increment if
    * present or under capacity; otherwise decrement EVERY counter by
    * min(remaining weight, smallest counter) — the textbook decrement
    * when weight = 1 — dropping zeroed entries, until either the weight
    * is exhausted (item absorbed by the decrements) or a slot frees for
    * the leftover weight. */
  private[graft] def offer(buf: java.util.HashMap[String, Long], item: String,
      weight: Long, capacity: Int): Unit = {
    if (weight <= 0L) return
    val cur = buf.get(item) // null unboxes to 0; zero counters never stored
    if (cur != 0L) { buf.put(item, cur + weight); return }
    if (buf.size < capacity) { buf.put(item, weight); return }
    var remaining = weight
    while (remaining > 0L && buf.size >= capacity) {
      var minC = Long.MaxValue
      val it0 = buf.values().iterator()
      while (it0.hasNext) minC = math.min(minC, it0.next())
      val step = math.min(remaining, minC)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - step
        if (nv == 0L) it.remove() else e.setValue(nv)
      }
      remaining -= step
    }
    if (remaining > 0L) buf.put(item, remaining)
  }
}
