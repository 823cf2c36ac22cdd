package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

import java.nio.ByteBuffer

/** Mergeable accumulator state of [[GramAgg]]: the upper triangle of a
  * d×d int64 Gramian in row-major order, plus the row count. `d = -1`
  * until the first vector fixes the dimension.
  */
final class GramBuf(var d: Int, var n: Long, var acc: Array[Long])

/** Exact d×d Gramian (Σ qᵢ·qⱼᵀ over all input vectors) as a native
  * Catalyst `TypedImperativeAggregate` — the single-pass, map-side-
  * combinable statistic that PCA / whitening / OPQ rotation training
  * over an embedding corpus needs (the covariance follows from the
  * Gramian, the mean vector, and the count — the mean is the d
  * diagonal-adjacent linear sums, recoverable by aggregating
  * `array(1L) ++ q`, see [[graft.operators.Similarity.gramMatrix]]).
  *
  * Built like the repo's other sketches ([[KmvSketchAgg]],
  * [[FreqSketchAgg]]): O(d²) state per group regardless of corpus
  * size, partials merged map-side by elementwise addition, so the
  * shuffle carries one ~d²/2-long buffer per partition — a 100 TB
  * corpus reduces to ONE 2 080-long row at d = 64. All arithmetic is
  * int64 over quantized components (|q| ≤ ~10³ ⇒ per-row products
  * ≤ 10⁶; overflow needs ~10¹² rows × that, far past any corpus
  * here), so any engine reproduces the result bit-for-bit — the
  * DuckDB oracle computes the same sums from an unnest self-join.
  *
  * Returns ARRAY<ARRAY<BIGINT>>: the full symmetric d×d matrix
  * (null for an empty group). Reference analog: the vector-analytics
  * surface the reference leaves to its engines; re-expressed here as
  * a first-class mergeable aggregate.
  */
case class GramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(ArrayType(LongType))
  override def prettyName: String = "graft_gram"
  // Integral arrays only, widened NATIVELY by the element reader below —
  // not by a cast in the builder, which would also accept array<double>
  // (silent truncation) or array<string> (elements nulled): exactly the
  // plausible-garbage class this check exists to reject loudly.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType | ShortType | ByteType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram needs an integral array (ARRAY<BIGINT>..ARRAY<TINYINT>), " +
        s"got ${t.catalogString}")
  }

  @transient private lazy val getElem: (ArrayData, Int) => Long =
    child.dataType match {
      case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toLong
      case ArrayType(ShortType, _) => (a, i) => a.getShort(i).toLong
      case ArrayType(ByteType, _) => (a, i) => a.getByte(i).toLong
      case _ => (a, i) => a.getLong(i)
    }

  override def createAggregationBuffer(): GramBuf = new GramBuf(-1, 0L, null)

  override def update(buf: GramBuf, input: InternalRow): GramBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      // a vector with ANY null component is skipped whole, like SQL
      // aggregates skip NULL inputs — a partial read would silently
      // treat the null slot as 0 (Unsafe) or NPE (Generic)
      var k = 0
      while (k < d) { if (arr.isNullAt(k)) return buf; k += 1 }
      if (buf.d < 0) { buf.d = d; buf.acc = new Array[Long](d * (d + 1) / 2) }
      else require(d == buf.d,
        s"graft_gram: ragged input — vector of length $d after ${buf.d}")
      var i = 0
      var idx = 0
      while (i < d) {
        val xi = getElem(arr, i)
        var j = i
        while (j < d) {
          buf.acc(idx) += xi * getElem(arr, j)
          idx += 1
          j += 1
        }
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: GramBuf, other: GramBuf): GramBuf = {
    if (other.d < 0) buf
    else if (buf.d < 0) other
    else {
      require(buf.d == other.d,
        s"graft_gram: merging dimensions ${buf.d} and ${other.d}")
      var i = 0
      while (i < buf.acc.length) { buf.acc(i) += other.acc(i); i += 1 }
      buf.n += other.n
      buf
    }
  }

  override def eval(buf: GramBuf): Any = {
    if (buf.d < 0) return null
    val d = buf.d
    def tri(i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
    val rows = new Array[Any](d)
    var i = 0
    while (i < d) {
      val row = new Array[Any](d)
      var j = 0
      while (j < d) {
        row(j) = if (j >= i) buf.acc(tri(i, j)) else buf.acc(tri(j, i))
        j += 1
      }
      rows(i) = new GenericArrayData(row)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: GramBuf): Array[Byte] = {
    val len = if (buf.d < 0) 0 else buf.acc.length
    val bb = ByteBuffer.allocate(4 + 8 + 8 * len)
    bb.putInt(buf.d)
    bb.putLong(buf.n)
    var i = 0
    while (i < len) { bb.putLong(buf.acc(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val n = bb.getLong
    if (d < 0) new GramBuf(-1, n, null)
    else {
      val acc = new Array[Long](d * (d + 1) / 2)
      var i = 0
      while (i < acc.length) { acc(i) = bb.getLong; i += 1 }
      new GramBuf(d, n, acc)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}

object Gram {
  /** Full symmetric d×d int64 Gramian of an integral-array column `c`
    * as ARRAY<ARRAY<BIGINT>> (null over an empty group). Narrower
    * integer arrays widen inside the aggregate's element reader; any
    * non-integral array (double, string, …) fails analysis loudly —
    * no builder-side cast exists to silently truncate through.
    */
  def gram(c: Column): Column =
    Bridge.column(GramAgg(Bridge.expression(c)).toAggregateExpression())

  /** The augmented-vector convention, defined ONCE for batch and
    * streaming callers: prepend a constant 1 so a single Gramian pass
    * carries the count (cell 0,0), the linear sums (row 0) and G.
    */
  def augmented(c: Column): Column = {
    import org.apache.spark.sql.functions.{array, concat, lit}
    concat(array(lit(1L)), c)
  }
}
