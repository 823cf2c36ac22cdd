package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes — the
  * document-fingerprinting primitive (content-defined chunking /
  * Karp-Rabin style). A native Catalyst expression with codegen so it
  * stays inside WholeStageCodegen on the 100 TB scan path (a Scala UDF
  * would break the codegen span and force row serialization).
  *
  * Input is coerced to string by the `rolling_hash` helper; null in →
  * null out (UnaryExpression default null handling).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Multiplier-31 polynomial over bytes, seeded with a large prime so
    * short strings don't collide with small integers.
    */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31L * h + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(c.cast("string"))))
}
