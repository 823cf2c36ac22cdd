package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** One-pass token statistics (r19 optimization): [[TokenQuality]] and
  * [[RepStats]] must be VALUE-equal to the split-array chains they
  * replaced in qualityScore / curate / tokenBudget / semanticCurate /
  * repetitionStats — including empty segments from leading/trailing/
  * consecutive spaces, the empty string, unicode tokens, and repeated
  * bigrams — because five oracle-checked gates hash against those
  * semantics.
  */
class TokenStatsSpec extends AnyFunSuite with SparkFixture {

  private val texts: Seq[String] = Seq(
    "", " ", "  ", "a", "a a", "a  a", " a", "a ", "the a the a",
    "x y x y x", "the the the", "a b a b a b", "á ß 漢字 á ß",
    "tok", "tok tok", "tok  tok tok", "one two three four",
    "a a a a a a a a", "p q r p q r p q", " leading and trailing ")

  private def randomTexts(count: Int): Seq[String] = {
    val word = Gen.oneOf("a", "b", "the", "tok", "xyz", "á", "漢", "")
    val gen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    (1L to count.toLong).map(s => gen.apply(Gen.Parameters.default, Seed(s)).get)
  }

  test("token_quality ≡ size/array_distinct/filter-isin split chain") {
    val stops = Seq("the", "a")
    val df = spark.createDataFrame(
      (texts ++ randomTexts(300)).zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val a = split(col("text"), " ")
    val rows = df.select(col("doc_id"),
        TokenStats.token_quality(col("text"), stops).as("v"),
        size(a).as("n"), size(array_distinct(a)).as("nd"),
        size(filter(a, t => t.isin(stops: _*))).as("sh"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Long](1)
      assert(v(0) == r.getInt(2).toLong, s"n mismatch on doc ${r.getLong(0)}")
      assert(v(1) == r.getInt(3).toLong, s"nd mismatch on doc ${r.getLong(0)}")
      assert(v(2) == r.getInt(4).toLong, s"sh mismatch on doc ${r.getLong(0)}")
    }
  }

  test("token_quality_gate ≡ the (nd-sh)*qDen >= qNum*n AND sh*dDen > n split predicate") {
    val stops = Seq("the", "a")
    val df = spark.createDataFrame(
      (texts ++ randomTexts(300)).zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val a = split(col("text"), " ")
    val n = size(a)
    val nd = size(array_distinct(a))
    val sh = size(filter(a, t => t.isin(stops: _*)))
    val rows = df.select(col("doc_id"),
        TokenStats.token_quality_gate(col("text"), stops, 1, 2, 20).as("g"),
        ((nd - sh) * 2 >= lit(1) * n && sh * 20 > n).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2),
      s"gate mismatch on doc ${r.getLong(0)}"))
  }

  test("token_quality with empty stopword list scores zero hits") {
    val df = spark.createDataFrame(Seq((1L, "a b a"))).toDF("doc_id", "text")
    val v = df.select(TokenStats.token_quality(col("text"), Seq.empty).as("v"))
      .head().getSeq[Long](0)
    assert(v.toSeq == Seq(3L, 2L, 0L))
  }

  test("rep_stats ≡ bigram-distinct + sorted-run split chain") {
    val df = spark.createDataFrame(
      (texts ++ randomTexts(300)).zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val bigrams = expr(
      "transform(sequence(1, size(a) - 1), i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))")
    val topTok = expr(
      """aggregate(sort_array(a),
           named_struct('prev', '', 'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
           (acc, x) -> named_struct(
             'prev', x,
             'run', IF(x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)),
             'best', GREATEST(acc.best, IF(x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)))),
           acc -> acc.best)""")
    val rows = df
      .select(col("doc_id"), TokenStats.rep_stats(col("text")).as("v"),
        split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), col("v"),
        size(col("a")).as("n"),
        (size(col("a")) - 1 - size(array_distinct(bigrams))).as("dup"),
        topTok.as("top"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Long](1)
      assert(v(0) == r.getInt(2).toLong, s"n mismatch on doc ${r.getLong(0)}")
      assert(v(1) == r.getInt(3).toLong, s"dup mismatch on doc ${r.getLong(0)}")
      assert(v(2) == r.getLong(4), s"top mismatch on doc ${r.getLong(0)}")
    }
  }

  test("null text propagates null (nullSafeEval contract)") {
    val df = spark.createDataFrame(Seq((1L, "a b"), (2L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TokenStats.token_quality(col("text"), Seq("a")).as("q"),
        TokenStats.rep_stats(col("text")).as("r"))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[Long](1).toSeq == Seq(2L, 2L, 1L))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
  }
}
