package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-token span hashes of a document in ONE byte scan (r20
  * optimization round): element j (0-based) is
  * `h60(concat_ws(' ', tok_{j+1} .. tok_{j+k}))` for
  * `tok = split(text, ' ')`, in position order, with
  * `h60 = conv(substring(md5(s), 1, 15), 16, 10)` — i.e. exactly the
  * stream the shingle/span family produced via
  * `split → filter(size ≥ k) → explode(transform(sequence(1, size-k+1),
  * i -> concat_ws(' ', element_at(a,i) .. element_at(a,i+k-1)))) →
  * CrossHash.h60`. Fewer than k tokens ⇒ empty array (the explode then
  * emits no rows, matching the old size-filter).
  *
  * What stays: one MD5 per span (the cross-engine [[CrossHash]]
  * contract — every oracle replays the same md5 chain). What goes, per
  * span: the split token ARRAY, the k `element_at` lambda calls, the
  * concat_ws string allocation, the md5 HEX-string allocation, the
  * substring, and the base-16 string reparse (`conv`) — a k-token span
  * of a single-space-split text IS the input's byte span from token
  * j's start to token j+k−1's end (adjacent segments are separated by
  * exactly one delimiter byte — the [[TokenStats]]/[[FeatureBuckets]]
  * zero-copy span trick, k-token general form), and the 60-bit value
  * reads directly from the digest's first 8 bytes. SpanHashSpec pins
  * value equality with the split+concat+md5-hex chain for the two
  * deployed widths (k=2 shingles, k=[[graft.operators.Dedup.SpanK]]
  * dup-spans).
  */
case class SpanHash(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "span_hash60: k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hash60"

  override protected def nullSafeEval(input: Any): Any =
    SpanHash.compute(input.asInstanceOf[UTF8String], k)

  // `compute`, not `eval`: a companion method named like an inherited
  // case-class member gets no static forwarder and Janino would silently
  // fall back to interpreted execution (the FeatureBuckets ADVICE r19
  // lesson; SpanHashSpec runs CODEGEN_ONLY to pin it)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanHash.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): SpanHash =
    copy(child = newChild)
}

/** The k-token span STRINGS of a document in one byte scan — the
  * [[SpanHash]] twin for consumers whose OUTPUT carries the span text
  * (q49's inverted-index terms): element j is
  * `concat_ws(' ', tok_{j+1} .. tok_{j+k})`, byte-equal by the span
  * identity (adjacent single-space-split segments ARE the contiguous
  * byte range). Replaces split + k element_at lambda calls + concat_ws
  * per position with ONE boundary scan + one byte copy per span (the
  * copy is deliberate: a zero-copy view could alias a buffer the
  * scan reuses across rows once it escapes the expression).
  */
case class SpanStrings(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "span_strings: k must be positive")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "span_strings"

  override protected def nullSafeEval(input: Any): Any =
    SpanHash.computeStrings(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanHash.computeStrings($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): SpanStrings =
    copy(child = newChild)
}

object SpanHash {

  /** h60 of every k-token span, position order; empty when n < k. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var j = 0
    var st = 0
    i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        starts(j) = st; ends(j) = i; j += 1; st = i + 1
      }
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    j = 0
    while (j <= n - k) {
      out(j) = FeatureBuckets.h60(b, starts(j), ends(j + k - 1) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  def span_hash60(c: Column, k: Int): Column =
    Bridge.column(SpanHash(Bridge.expression(c.cast("string")), k))

  /** Every k-token span as a string, position order; empty when n < k. */
  def computeStrings(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var j = 0
    var st = 0
    i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        starts(j) = st; ends(j) = i; j += 1; st = i + 1
      }
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    j = 0
    while (j <= n - k) {
      out(j) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(b, starts(j), ends(j + k - 1)))
      j += 1
    }
    new GenericArrayData(out)
  }

  def span_strings(c: Column, k: Int): Column =
    Bridge.column(SpanStrings(Bridge.expression(c.cast("string")), k))
}
