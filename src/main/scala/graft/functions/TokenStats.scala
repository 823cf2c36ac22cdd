package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics — the allocation-light twins of the
  * split-array quality/repetition chains (r19 optimization round,
  * guide §"per-task work": eliminate per-row array materialization in
  * the hot gate path, the [[BpeCount]]/[[TokenTf]] lesson applied to
  * the quality-gate family).
  *
  * [[TokenQuality]] ≡ `[size(a), size(array_distinct(a)),
  * size(filter(a, t -> t IN stopwords))]` for `a = split(text, ' ')`,
  * byte-equal on every input: segments are the spans between single
  * spaces (trailing/leading empties included, exactly as Spark's
  * split keeps them), distinctness is exact byte equality via a
  * content-hashed set of zero-copy views, never a hash-only
  * approximation.
  *
  * [[RepStats]] ≡ `[size(a),
  * size(a) - 1 - size(array_distinct(bigrams)),
  * longest-equal-run-of-sorted(a)]` where
  * `bigrams = transform(sequence(1, size(a)-1),
  * i -> concat(element_at(a,i), ' ', element_at(a,i+1)))` — the q76
  * chain. Two exactness tricks make it one pass: a bigram's
  * concatenated string IS the original text's byte span from token i's
  * start to token i+1's end (adjacent segments are separated by
  * exactly one space by construction), so bigram distinctness is a set
  * of zero-copy spans of the input; and the longest equal run of the
  * sorted token array is exactly the maximum token multiplicity, so no
  * sort happens at all (a count map replaces sort_array + aggregate).
  * TokenStatsSpec property-pins both against the split-based forms.
  */
case class TokenQuality(child: Expression, stopwords: Seq[String])
  extends UnaryExpression {

  require(stopwords.forall(w => w.nonEmpty && !w.contains(' ')),
    "token_quality: stopwords cannot be empty or contain the delimiter")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_quality"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.quality(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualStops", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.quality($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenQuality =
    copy(child = newChild)
}

/** The curate-family quality+language predicate as ONE boolean byte
  * scan: `(nd - sh) * qualityDen >= qualityNum * n AND
  * sh * densityDen > n` over the [[TokenQuality]] counts. Exists
  * because a Filter whose condition inlines `token_quality(text)[i]`
  * four times evaluates the scan four times per row (FilterExec does
  * no subexpression elimination), and the predicate legitimately
  * WANTS to push below the dedup aggregate / join to drop rows before
  * the shuffle — so the single-pass form must be the predicate itself,
  * not a projected column. Integer arithmetic is 32-bit, matching the
  * int-typed compare the split form produced.
  */
case class TokenQualityGate(child: Expression, stopwords: Seq[String],
    qualityNum: Int, qualityDen: Int, densityDen: Int)
  extends UnaryExpression {

  require(stopwords.forall(w => w.nonEmpty && !w.contains(' ')),
    "token_quality_gate: stopwords cannot be empty or contain the delimiter")

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "token_quality_gate"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.qualityGate(input.asInstanceOf[UTF8String], stopBytes,
      qualityNum, qualityDen, densityDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gateStops", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenStats.qualityGate($c, $ref, $qualityNum, $qualityDen, $densityDen)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenQualityGate =
    copy(child = newChild)
}

case class RepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.repStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.repStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object TokenStats {

  /** [n_tokens, n_distinct_tokens, stopword_hits] in one byte scan. */
  def quality(s: UTF8String, stops: Array[Array[Byte]]): ArrayData = {
    val b = s.getBytes
    val seen = new java.util.HashSet[UTF8String]()
    var n = 0L
    var sh = 0L
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        n += 1L
        val len = i - start
        seen.add(UTF8String.fromBytes(b, start, len))
        var t = 0
        var matched = false
        while (!matched && t < stops.length) {
          val tb = stops(t)
          if (tb.length == len) {
            var k = 0
            while (k < len && tb(k) == b(start + k)) k += 1
            if (k == len) { sh += 1L; matched = true }
          }
          t += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array[Long](n, seen.size.toLong, sh))
  }

  /** [n_tokens, n_dup_bigrams, top_tok_count] in one byte scan.
    * n_dup_bigrams = (n_tokens - 1) - |distinct adjacent pairs| and
    * top_tok_count = max token multiplicity — both exact (content-
    * compared views, no hash-only shortcuts). For n_tokens < 2 the
    * bigram term is meaningless (callers filter n >= 2); it emits 0.
    */
  def repStats(s: UTF8String): ArrayData = {
    val b = s.getBytes
    // token boundaries first: starts(j) .. ends(j) byte spans
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
    // max token multiplicity via a count map over zero-copy views
    val counts = new java.util.HashMap[UTF8String, Int]()
    var top = 0L
    j = 0
    while (j < n) {
      val tok = UTF8String.fromBytes(b, starts(j), ends(j) - starts(j))
      val c = counts.merge(tok, 1, (a: Int, b0: Int) => a + b0)
      if (c > top) top = c.toLong
      j += 1
    }
    // distinct adjacent bigrams: the span from token j's start to
    // token j+1's end IS concat(tok_j, ' ', tok_{j+1})
    var dup = 0L
    if (n >= 2) {
      val bgs = new java.util.HashSet[UTF8String]()
      j = 0
      while (j < n - 1) {
        bgs.add(UTF8String.fromBytes(b, starts(j), ends(j + 1) - starts(j)))
        j += 1
      }
      dup = (n - 1).toLong - bgs.size.toLong
    }
    new GenericArrayData(Array[Long](n.toLong, dup, top))
  }

  /** Boolean quality+language gate in one scan (int32 compares, the
    * split form's types).
    */
  def qualityGate(s: UTF8String, stops: Array[Array[Byte]],
      qualityNum: Int, qualityDen: Int, densityDen: Int): Boolean = {
    val v = quality(s, stops).asInstanceOf[GenericArrayData]
    val n = v.getLong(0).toInt
    val nd = v.getLong(1).toInt
    val sh = v.getLong(2).toInt
    (nd - sh) * qualityDen >= qualityNum * n && sh * densityDen > n
  }

  def token_quality(c: Column, stopwords: Seq[String]): Column =
    Bridge.column(TokenQuality(Bridge.expression(c.cast("string")), stopwords))

  def rep_stats(c: Column): Column =
    Bridge.column(RepStats(Bridge.expression(c.cast("string"))))

  def token_quality_gate(c: Column, stopwords: Seq[String],
      qualityNum: Int, qualityDen: Int, densityDen: Int): Column =
    Bridge.column(TokenQualityGate(Bridge.expression(c.cast("string")),
      stopwords, qualityNum, qualityDen, densityDen))
}
