package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of maximal runs of characters from a literal ASCII set —
  * `char_run_count(text, "aeiou")` ≡ `regexp_count(text, '[aeiou]+')`
  * — as a single UTF-8 byte scan ([[BpeCount]]'s lesson applied to the
  * general positive-class-run pattern: the regex engine's per-position
  * alternation loop costs ~15× the scan). Any byte outside the set —
  * including every byte of a multi-byte code point — breaks the run,
  * exactly as a code point outside an ASCII class does for the regex.
  * CharRunCountSpec randomized-compares against `regexp_count`.
  */
case class CharRunCount(child: Expression, chars: String)
  extends UnaryExpression {

  require(chars.nonEmpty && chars.forall(c => c < 128),
    "char_run_count: the class must be non-empty ASCII")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "char_run_count"

  @transient private lazy val set: Array[Boolean] = {
    val a = new Array[Boolean](128)
    chars.foreach(c => a(c) = true)
    a
  }

  override protected def nullSafeEval(input: Any): Any =
    CharRunCount.count(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("runSet", set, "boolean[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CharRunCount.count($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharRunCount =
    copy(child = newChild)
}

object CharRunCount {
  def count(s: UTF8String, set: Array[Boolean]): Int = {
    val bytes = s.getBytes
    var c = 0
    var inRun = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && set(b)) {
        if (!inRun) c += 1
        inRun = true
      } else inRun = false
      i += 1
    }
    c
  }

  def char_run_count(c: Column, chars: String): Column =
    Bridge.column(CharRunCount(Bridge.expression(c.cast("string")), chars))
}
