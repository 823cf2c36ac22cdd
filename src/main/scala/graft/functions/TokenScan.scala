package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-space token scans — the allocation-free twins of
  * `size(split(text, " "))` and `size(filter(split(text, " "),
  * t.isin(words)))`, byte-equal to those forms on every input
  * (Spark's split keeps trailing empty segments, so the token count
  * is exactly #spaces + 1; empty segments never equal a non-empty
  * word). The split-based forms allocate a token ARRAY per row only
  * to count it — the q35/q30 lesson ([[BpeCount]]) applied to the
  * stopword-density family (lang-id, confusion matrix).
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenScan.tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScan.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Count of space-delimited segments byte-equal to any of the literal
  * `words` (the stopword-hit counter).
  */
case class TokenHits(child: Expression, words: Seq[String])
  extends UnaryExpression {

  require(words.nonEmpty && words.forall(w => w.nonEmpty && !w.contains(' ')),
    "token_hits: words must be non-empty and cannot contain the delimiter")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_hits"

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenScan.hits(input.asInstanceOf[UTF8String], wordBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenWords", wordBytes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScan.hits($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHits =
    copy(child = newChild)
}

/** One-pass term-frequency vector: `[dl, tf_0, …, tf_{n-1}]` where dl
  * is the single-space token count (`size(split(text,' '))` — empty
  * segments included) and tf_i the count of segments byte-equal to
  * literal `terms(i)` (`size(filter(split(text,' '), x -> x = t_i))`).
  * The BM25 scorer's former shape materialized the split array and
  * re-scanned it once PER TERM (16 array filters); this is ONE byte
  * scan computing all counts — VERDICT r15 #3's fix for q157's 2.6×
  * single-node gap, and it removes the SQL-string interpolation of
  * caller-supplied terms entirely (ADVICE r15: a quote in a term
  * could break the lambda expression; terms here are opaque bytes).
  */
case class TokenTf(child: Expression, terms: Seq[String])
  extends UnaryExpression {

  require(terms.nonEmpty && terms.forall(t => t.nonEmpty && !t.contains(' ')),
    "token_tf: terms must be non-empty and cannot contain the delimiter")
  // the scan is first-match-wins per segment, so a DUPLICATED term would
  // silently collect tf=0 for every later copy — a divergence from the
  // documented size(filter(...)) twin (which counts each copy fully).
  // Reject rather than dedupe: a duplicate query term is a caller bug
  // either way (VERDICT r16 #2 / ADVICE r16)
  require(terms.distinct.size == terms.size,
    s"token_tf: duplicate terms ${terms.diff(terms.distinct).distinct.mkString(",")}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_tf"

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenScan.tf(input.asInstanceOf[UTF8String], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tfTerms", termBytes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenScan.tf($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenTf =
    copy(child = newChild)
}

object TokenScan {
  def tf(s: UTF8String, terms: Array[Array[Byte]]): ArrayData = {
    val b = s.getBytes
    val counts = new Array[Long](terms.length + 1)
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        counts(0) += 1L // dl: every segment, empty ones included
        val len = i - start
        var t = 0
        var matched = false
        while (!matched && t < terms.length) {
          val tb = terms(t)
          if (tb.length == len) {
            var k = 0
            while (k < len && tb(k) == b(start + k)) k += 1
            if (k == len) { counts(t + 1) += 1L; matched = true }
          }
          t += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  def tokenCount(s: UTF8String): Int = {
    val b = s.getBytes
    var c = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') c += 1; i += 1 }
    c
  }

  def hits(s: UTF8String, words: Array[Array[Byte]]): Int = {
    val b = s.getBytes
    var c = 0
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        val len = i - start
        var w = 0
        var matched = false
        while (!matched && w < words.length) {
          val wb = words(w)
          if (wb.length == len) {
            var k = 0
            while (k < len && wb(k) == b(start + k)) k += 1
            matched = k == len
          }
          w += 1
        }
        if (matched) c += 1
        start = i + 1
      }
      i += 1
    }
    c
  }

  def token_count(c: Column): Column =
    Bridge.column(TokenCount(Bridge.expression(c.cast("string"))))

  def token_hits(c: Column, words: Seq[String]): Column =
    Bridge.column(TokenHits(Bridge.expression(c.cast("string")), words))

  def token_tf(c: Column, terms: Seq[String]): Column =
    Bridge.column(TokenTf(Bridge.expression(c.cast("string")), terms))
}
