package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** token_count/token_hits must be byte-equal to the split-based forms
  * they replace — including empty strings, repeated/leading/trailing
  * spaces (Spark's split keeps trailing empty segments) and words that
  * appear as substrings of larger tokens (no hit).
  */
class TokenScanSpec extends AnyFunSuite with SparkFixture {

  private val words = Seq("the", "a")

  test("randomized equality against split forms") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Seq("the", "a", "fox", "thee", "athe", "", " ", "é日")
    val strs = Seq.fill(300)(
      (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")) ++ Seq("", " ", "  ", "the", "a the ", " the")
    val a = split(col("t"), " ")
    val rows = strs.toDF("t").select(col("t"),
      TokenScan.token_count(col("t")).as("tc"),
      size(a).as("tcs"),
      TokenScan.token_hits(col("t"), words).as("th"),
      size(filter(a, t => t.isin(words: _*))).as("ths")).collect()
    for (r <- rows) {
      assert(r.getInt(1) == r.getInt(2), s"count '${r.getString(0)}'")
      assert(r.getInt(3) == r.getInt(4), s"hits '${r.getString(0)}'")
    }
  }

  test("token_tf: randomized equality against split + per-term filters") {
    import spark.implicits._
    val rnd = new scala.util.Random(57)
    val terms = Seq("spark", "merge", "window", "a", "日本")
    val vocab = terms ++ Seq("sparkle", "the", "", "x", "aspark")
    val strs = Seq.fill(300)(
      (0 until rnd.nextInt(15)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")) ++ Seq("", " ", "spark", " spark ", "a a a")
    val a = split(col("t"), " ")
    val refCols = size(a).cast("long") +:
      terms.map(tm => size(filter(a, x => x === tm)).cast("long"))
    val rows = strs.toDF("t").select(col("t"),
      TokenScan.token_tf(col("t"), terms).as("v"),
      array(refCols: _*).as("ref")).collect()
    for (r <- rows)
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"'${r.getString(0)}'")
  }

  test("token_tf: a quote inside a term is just bytes, never SQL") {
    import spark.implicits._
    val rows = Seq("don't stop don't", "dont stop").toDF("t")
      .select(TokenScan.token_tf(col("t"), Seq("don't", "stop")).as("v"))
      .collect().map(_.getSeq[Long](0))
    assert(rows(0) == Seq(3L, 2L, 1L) && rows(1) == Seq(2L, 0L, 1L))
  }

  test("token_tf: duplicate terms are rejected, not silently zeroed") {
    // the one-pass scan is first-match-wins per segment: Seq("a","a")
    // would return tf=0 for the second copy where the documented
    // size(filter(...)) twin returns the full count — the constructor
    // must reject the divergence (VERDICT r16 #2)
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Seq("a b a").toDF("t")
        .select(TokenScan.token_tf(col("t"), Seq("a", "b", "a")))
    }
    assert(e.getMessage.contains("duplicate terms a"), e.getMessage)
  }

  test("null in, null out") {
    import spark.implicits._
    val out = Seq(Option.empty[String]).toDF("t")
      .select(TokenScan.token_count(col("t")),
        TokenScan.token_hits(col("t"), words),
        TokenScan.token_tf(col("t"), words)).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1) && out(0).isNullAt(2))
  }
}
