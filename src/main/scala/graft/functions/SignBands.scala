package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All sign-LSH band values of a 64-dim quantized vector in ONE pass —
  * a native codegen expression replacing `numBands × bandBits`
  * interpreted `aggregate(sequence(0,63), ...)` higher-order calls per
  * row (the signature computation is the second hot loop of the
  * embedding operators after [[QDot]]).
  *
  * The hyperplane components are the same fixed integer formula the
  * DuckDB oracle evaluates ([[graft.operators.EmbeddingLsh.hcomp]]):
  * H(j)(i) = ((53·(j+1) + 97·i) · 2654435761) mod 1009 − 504. Vectors
  * shorter than 64 elements produce all-zero bits, matching the HOF and
  * SQL formulations where an out-of-bounds index nulls the whole dot.
  */
case class SignBands(child: Expression, numBands: Int, bandBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bands"

  override protected def nullSafeEval(input: Any): Any =
    SignBands.bandsOf(input.asInstanceOf[ArrayData], numBands, bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignBands.bandsOf($c, $numBands, $bandBits)")

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object SignBands {
  def bandsOf(q: ArrayData, numBands: Int, bandBits: Int): ArrayData = {
    val out = new Array[Long](numBands)
    if (q.numElements() >= 64) {
      val nh = numBands * bandBits
      var j = 0
      while (j < nh) {
        var acc = 0L
        var i = 0
        while (i < 64) {
          acc += q.getLong(i) * ((53L * (j + 1) + 97L * i) * 2654435761L % 1009L - 504L)
          i += 1
        }
        if (acc >= 0) out(j / bandBits) |= 1L << (j % bandBits)
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  def sign_bands(q: Column, numBands: Int, bandBits: Int): Column =
    Bridge.column(SignBands(Bridge.expression(q), numBands, bandBits))
}
