package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Token count of the BPE pre-tokenizer pattern
  * `[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]` as a single UTF-8 byte scan — the
  * pattern is a deterministic partition of the character classes, so
  * no regex engine is needed: a maximal letter run is one token, each
  * digit is one token, every other non-space code point is one token,
  * spaces separate. One linear pass, no per-match allocation, inside
  * WholeStageCodegen — measured 7.7 → 0.53 s on the 500 k-doc text
  * curve point vs `regexp_count` (and 7.4 s for the original
  * `regexp_extract_all`): java.util.regex's alternation loop IS the
  * cost, not the match-list allocation.
  *
  * Exactly equal to the regex count by construction (the classes are
  * disjoint and the alternation is first-match): BpeCountSpec
  * randomized-compares it against `regexp_count` on mixed
  * letter/digit/punct/unicode strings, and the q35 DuckDB gate keeps
  * the regex form as its oracle. Non-ASCII: both Java regex and RE2
  * match `[^A-Za-z0-9 ]` per code POINT, so the scan counts UTF-8
  * lead bytes and skips continuation bytes.
  */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var c = 0
    var inLetters = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b & 0xc0) == 0x80) {
        // UTF-8 continuation byte: part of the lead byte's code point
      } else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        if (!inLetters) c += 1
        inLetters = true
      } else {
        inLetters = false
        if (b != ' ') c += 1 // digit or any other code point: one token
      }
      i += 1
    }
    c
  }

  def bpe_count(c: Column): Column =
    Bridge.column(BpeCount(Bridge.expression(c.cast("string"))))
}
