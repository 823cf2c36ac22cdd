package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaved key over 2 or 3 integral columns — the
  * multi-dimensional data-layout primitive. Sorting/range-partitioning
  * by `zorder(a, b)` clusters rows so that EVERY interleaved dimension
  * has narrow per-file min/max zone maps, which is what lets a 100 TB
  * table skip files on a predicate over the SECOND (or third) dimension
  * — a linear sort gives that power to its leading column only. (The
  * reference has no layout story at all: its providers stream whatever
  * the remote returns, single-partition — `core/src/sql/
  * sql_provider_datafusion/mod.rs:312-317`; this operator exists for
  * the lakehouse side of the engine, where WE own the files.)
  *
  * Key contract (what the DuckDB oracle reproduces with plain bit
  * arithmetic): each input is masked to its low 16 bits; bit `i` of
  * argument `j` (0-based, left to right) lands at interleaved position
  * `i * n + j` for `n` arguments. So for `zorder(a, b)`, `a` holds the
  * even bits and `b` the odd bits; later arguments are "more
  * significant" at equal bit index. Inputs must already be 16-bit
  * bucket ranks — [[graft.operators.Layout.rankScale]] produces them
  * from arbitrary-range columns; raw key columns under 65536 (all
  * TPC-H keys at test scale) can interleave directly. NULL in ⇒ NULL
  * out. The bit-spread uses the textbook Morton magic-number sequence
  * (public domain bit-twiddling); ZOrderSpec randomized-verifies it
  * against a bit-by-bit reference loop.
  */
case class ZOrder2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.key2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder.key2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

/** 3-column form of [[ZOrder2]] — same contract, bit `i` of argument
  * `j` at position `i * 3 + j`.
  */
case class ZOrder3(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrder.key3(a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.ZOrder.key3($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ZOrder3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ZOrder {

  /** Bits taken from each input column. 16 × 3 = 48 interleaved bits —
    * the key always fits a positive Long for both arities.
    */
  val Bits = 16
  val Mask: Long = (1L << Bits) - 1

  /** Spread the low 16 bits of `v` to the even bit positions (bit i →
    * bit 2i). Textbook Morton Part1By1 magic numbers.
    */
  def spread2(v: Long): Long = {
    var x = v & Mask
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Spread the low 16 bits of `v` to every third bit (bit i → bit 3i).
    * Textbook Morton Part1By2 magic numbers (21-bit-capable masks; we
    * feed ≤16 bits).
    */
  def spread3(v: Long): Long = {
    var x = v & Mask
    x = (x | (x << 32)) & 0x001F00000000FFFFL
    x = (x | (x << 16)) & 0x001F0000FF0000FFL
    x = (x | (x << 8)) & 0x100F00F00F00F00FL
    x = (x | (x << 4)) & 0x10C30C30C30C30C3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  def key2(a: Long, b: Long): Long = spread2(a) | (spread2(b) << 1)

  def key3(a: Long, b: Long, c: Long): Long =
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)

  /** Column builder: 2 or 3 integral columns → interleaved Long key.
    * Inputs are cast to LONG (callers quantize doubles themselves —
    * a silent truncation here would diverge from any SQL oracle).
    */
  def zorder(cols: Column*): Column = cols.map(c =>
    Bridge.expression(c.cast("long"))) match {
    case Seq(a, b) => Bridge.column(ZOrder2(a, b))
    case Seq(a, b, c) => Bridge.column(ZOrder3(a, b, c))
    case other => throw new IllegalArgumentException(
      s"graft_zorder takes 2 or 3 columns, got ${other.length}")
  }

  /** The same interleave as DuckDB-runnable SQL (for oracle queries):
    * 16 disjoint-bit terms per column, summed (+ ≡ | on disjoint bits).
    * `exprs` must already be integer-typed SQL expressions.
    */
  def sql(exprs: String*): String = {
    require(exprs.length == 2 || exprs.length == 3,
      s"zorder sql takes 2 or 3 expressions, got ${exprs.length}")
    val n = exprs.length
    val terms = exprs.zipWithIndex.flatMap { case (e, j) =>
      (0 until Bits).map(i =>
        s"((((CAST($e AS BIGINT)) >> $i) & 1) << ${i * n + j})")
    }
    s"CAST((${terms.mkString(" + ")}) AS BIGINT)"
  }
}
