package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash signature of a single-space-tokenized document as ONE
  * codegen'd byte scan — the native form of the
  * explode → h60 → groupBy(doc,th) → 60-SUM-columns pipeline that
  * [[graft.operators.Dedup.simhashOf]] used through r15 (the q43/q44
  * family's hot loop, the largest real multiples left in the
  * comparable-41 per VERDICT r15 #1).
  *
  * Semantics are bit-identical to that pipeline by construction:
  * `split(text, " ")` keeps empty segments, so every span between
  * single-space delimiters (including zero-length ones) is a token;
  * each token votes its h60 bits ±1 per OCCURRENCE (the
  * count-weighted vote over distinct tokens the old aggregate computed
  * equals the unweighted per-occurrence vote — ±c ≡ c copies of ±1);
  * h60(tok) = first 15 hex chars of md5(utf8(tok)) as a 60-bit integer
  * = top 60 bits of the raw digest, read here without the hex detour.
  * The q43/q44/q80 DuckDB oracles keep the per-distinct-token SQL
  * formulation; SimHashSpec randomized-compares this expression against
  * the old aggregate form on mixed unicode/empty-token inputs.
  *
  * Scale shape: the signature is a pure row-local projection — a
  * document's tokens never exist as rows at all (the old form exploded
  * them and shuffled twice). Per-token cost is one MD5 over the token
  * bytes (same hash both forms pay) plus a 60-iteration vote loop on a
  * stack-local array; no per-token allocation beyond the digest's
  * 16-byte output buffer, reused across the row.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash.signature(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash {

  // MessageDigest is stateful; one instance per executor thread.
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def signature(s: UTF8String): Long = {
    val b = s.getBytes
    val votes = new Array[Int](60)
    val digest = md5.get()
    val out = new Array[Byte](16)
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        digest.reset()
        digest.update(b, start, i - start)
        digest.digest(out, 0, 16)
        // h60 = conv(substr(hex(digest),1,15),16,10): bytes 0..6 whole,
        // then the HIGH nibble of byte 7 — the top 60 bits, big-endian.
        var h = 0L
        var k = 0
        while (k < 7) { h = (h << 8) | (out(k) & 0xffL); k += 1 }
        h = (h << 4) | ((out(7) & 0xf0L) >> 4)
        var bit = 0
        while (bit < 60) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 60) { if (votes(bit) > 0) sig |= 1L << bit; bit += 1 }
    sig
  }

  def simhash60(c: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(c.cast("string"))))
}
