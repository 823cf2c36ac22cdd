package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Adaptive power-of-two histogram — the rank/quantile member of the
  * engine's mergeable-sketch family ([[KmvSketchAgg]] distinct counts,
  * [[FreqSketch]] heavy hitters): per group, a capacity-bounded
  * histogram of `floor(v / 2^shift)` bins where `shift` GROWS until the
  * distinct bins fit.
  *
  * Unlike sampling-based quantile sketches (GK, KLL, t-digest), the
  * final state is a PURE FUNCTION of the input multiset: greedy
  * coarsen-on-overflow always terminates at the MINIMAL shift at which
  * the whole group's values fit in `capacity` bins (a subset can never
  * need a coarser grid than its superset, so no prefix or merge order
  * can overshoot). That makes the sketch deterministic across
  * partitionings, merge orders, AND engines — the approximate regime
  * hash-matches a DuckDB oracle, not just the exact one (the q121
  * gate; FreqSketch by contrast can only pin its exact regime).
  *
  * Guarantees: when a group has ≤ capacity distinct values the
  * histogram is exact (shift 0). Beyond that, any quantile read from
  * the histogram (the lower bound of the bin containing the target
  * rank — [[RankHist.quantile]]) is within `2^shift` of the true value
  * — a VALUE-error bound, the natural contract for length/latency/size
  * distributions. State is O(capacity) longs, merge is map-side
  * combinable — usable per-group at any cardinality where an exact
  * sort-based quantile would shuffle the world.
  */
final class RankHistBuf(var shift: Int) {
  val bins = new java.util.HashMap[Long, Long]()

  def add(bin: Long, cnt: Long): Unit = {
    val prev = bins.get(bin)
    bins.put(bin, prev + cnt) // get returns 0L when absent (unboxed default)
  }

  /** One coarsening step: halve the grid. */
  def coarsen(): Unit = {
    val old = bins.entrySet().iterator()
    val next = new java.util.HashMap[Long, Long]()
    while (old.hasNext) {
      val e = old.next()
      val nb = e.getKey >> 1
      next.put(nb, next.get(nb) + e.getValue)
    }
    bins.clear()
    bins.putAll(next)
    shift += 1
  }
}

case class RankHistAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RankHistBuf] {

  require(capacity >= 2, s"rank_hist: capacity must be >= 2, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "rank_hist"

  override def dataType: DataType = RankHist.resultType

  override def createAggregationBuffer(): RankHistBuf = new RankHistBuf(0)

  private def longOf(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"rank_hist: integral input required, got ${other.getClass.getSimpleName}")
  }

  private def fit(buf: RankHistBuf): Unit =
    while (buf.bins.size > capacity) buf.coarsen()

  override def update(buf: RankHistBuf, input: InternalRow): RankHistBuf = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(longOf(v) >> buf.shift, 1L)
      fit(buf)
    }
    buf
  }

  override def merge(buf: RankHistBuf, other: RankHistBuf): RankHistBuf = {
    while (buf.shift < other.shift) buf.coarsen()
    val delta = buf.shift - other.shift
    val it = other.bins.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.add(e.getKey >> delta, e.getValue)
    }
    fit(buf)
    buf
  }

  override def eval(buf: RankHistBuf): Any = {
    val entries = new Array[(Long, Long)](buf.bins.size)
    val it = buf.bins.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    java.util.Arrays.sort(entries, Ordering.by((p: (Long, Long)) => p._1))
    val rows = entries.map { case (bin, cnt) =>
      InternalRow(bin << buf.shift, cnt)
    }
    InternalRow(buf.shift, new GenericArrayData(rows.toIndexedSeq))
  }

  override def serialize(buf: RankHistBuf): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.shift)
    out.writeInt(buf.bins.size)
    val it = buf.bins.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RankHistBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new RankHistBuf(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RankHistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RankHistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RankHistAgg =
    copy(child = newChildren.head)
}

object RankHist {
  val resultType: StructType = StructType(Seq(
    StructField("shift", IntegerType, nullable = false),
    StructField("bins", ArrayType(StructType(Seq(
      StructField("bin_lo", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  /** struct(shift, bins sorted by bin_lo) histogram of integral column
    * `c` at ≤ `capacity` bins.
    */
  def rank_hist(c: Column, capacity: Int): Column =
    Bridge.column(RankHistAgg(Bridge.expression(c), capacity).toAggregateExpression())

  /** Value-error quantile read: the lower bound of the bin containing
    * rank `ceil(permille/1000 * total)` (1-based over the sorted
    * multiset). Within `2^shift` of the true quantile.
    */
  def quantile(shift: Int, bins: Seq[(Long, Long)], permille: Int): Long = {
    require(bins.nonEmpty,
      "rank_hist quantile: empty histogram (group had no non-null values)")
    require(permille >= 0 && permille <= 1000,
      s"rank_hist quantile: permille must be in [0, 1000], got $permille")
    val total = bins.map(_._2).sum
    val target = math.max(1L, (total * permille + 999) / 1000)
    var cum = 0L
    for ((lo, cnt) <- bins) {
      cum += cnt
      if (cum >= target) return lo
    }
    bins.last._1
  }
}
