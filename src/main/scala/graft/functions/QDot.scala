package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact int64 dot product of two quantized (long-array) vectors — the
  * inner loop of every embedding operator (near-dup q45, ANN
  * q62/q63/q70). A native Catalyst expression with codegen: the
  * equivalent `aggregate(zip_with(a, b, _*_), 0, _+_)` runs the lambda
  * interpreter per element, which is the hot path at N·Q dot products
  * per query; this stays a tight primitive loop inside
  * WholeStageCodegen.
  *
  * Semantics match the HOF formulation on well-formed inputs (equal
  * lengths, no null elements — guaranteed by
  * [[graft.operators.EmbeddingLsh.quantize]]): null array in → null out,
  * and length mismatch folds over the common prefix.
  *
  * Overflow is LOUD, not wrapping: the accumulator uses
  * `Math.multiplyExact`/`addExact` (HotSpot intrinsics — an untaken
  * branch in the hot loop), so an out-of-bound corpus throws
  * ArithmeticException exactly where the DuckDB oracle's BIGINT
  * multiply errors — symmetric failure on both engines (ADVICE r13).
  */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDot =
    copy(left = newLeft, right = newRight)
}

object QDot {
  def dot(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    acc
  }

  def qdot(a: Column, b: Column): Column =
    Bridge.column(QDot(Bridge.expression(a), Bridge.expression(b)))
}
