package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The DSIR hashed feature profile of a document in ONE pass
  * (r19 optimization): bucket ids `h60(feature) % buckets` for every
  * token and every adjacent bigram of `split(text, ' ')`, exactly the
  * ids the former chain produced via
  * `explode(concat(a, transform(..., concat(tok_i, ' ', tok_{i+1}))))`
  * → `conv(substring(md5(tok), 1, 15), 16, 10) % buckets`.
  *
  * What stays: one MD5 per feature (the cross-engine [[CrossHash.h60]]
  * contract — the oracle replays the same md5). What goes, per
  * feature: the hex-digest STRING allocation, the substring, the
  * base-16 reparse (`conv`), the bigram concat string, the exploded
  * string row through two projections, and downstream the broadcast
  * join probe + per-doc aggregation exchange (the caller folds weights
  * over this array with a literal-table lookup instead). The first 15
  * hex chars of an md5 are the digest's first 60 bits, so the value is
  * the big-endian long of bytes 0..7 shifted right 4 — no hex string
  * exists at all. A bigram's UTF-8 bytes are the input's byte span
  * from token i's start to token i+1's end (the [[TokenStats]] span
  * trick), so no concat exists either. FeatureBucketsSpec pins value
  * equality with the split+md5-hex chain.
  */
case class FeatureBuckets(child: Expression, buckets: Int)
  extends UnaryExpression {

  require(buckets > 0, "feature_buckets: buckets must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "feature_buckets"

  override protected def nullSafeEval(input: Any): Any =
    FeatureBuckets.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FeatureBuckets.compute($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): FeatureBuckets =
    copy(child = newChild)
}

object FeatureBuckets {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The 60-bit cross-engine hash of a byte span — numerically equal to
    * `conv(substring(md5(s), 1, 15), 16, 10)`: 15 hex chars are the
    * first 60 bits of the digest, i.e. the big-endian long of its first
    * 8 bytes with the low nibble dropped.
    */
  def h60(b: Array[Byte], off: Int, len: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(b, off, len)
    val dig = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Token buckets then adjacent-bigram buckets, in position order —
    * the multiset the DSIR model and scorer consume (order never
    * matters downstream; both sides count or sum).
    *
    * Named `compute`, NOT `eval` (ADVICE r19): a companion method that
    * shares a name with an inherited case-class member (`Expression.eval`)
    * gets NO static forwarder from scalac, so the generated code's
    * `graft.functions.FeatureBuckets.compute(...)` static call would fail
    * Janino compilation and every stage containing this expression would
    * silently fall back to interpreted execution — correctness intact,
    * the r19 codegen win gone. FeatureBucketsSpec executes this
    * expression under CODEGEN_ONLY + fallback-off to pin the forwarder.
    */
  def compute(s: UTF8String, buckets: Int): ArrayData = {
    val b = s.getBytes
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
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
    val m = if (n >= 2) n + (n - 1) else n
    val out = new Array[Long](m)
    j = 0
    while (j < n) {
      out(j) = h60(b, starts(j), ends(j) - starts(j)) % buckets
      j += 1
    }
    j = 0
    while (j < n - 1) {
      out(n + j) = h60(b, starts(j), ends(j + 1) - starts(j)) % buckets
      j += 1
    }
    new GenericArrayData(out)
  }

  def feature_buckets(c: Column, buckets: Int): Column =
    Bridge.column(FeatureBuckets(Bridge.expression(c.cast("string")), buckets))
}
