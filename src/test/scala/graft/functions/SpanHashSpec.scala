package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[SpanHash]] must reproduce the split → concat_ws(' ') → md5-hex →
  * conv chain it replaced EXACTLY — position order included — because
  * every shingle/span oracle (q41–q44, q48, q74/q75, q97, q100, q113,
  * q156) replays that md5 chain in DuckDB and q156 additionally consumes
  * the 1-based span POSITIONS.
  */
class SpanHashSpec extends AnyFunSuite with SparkFixture {

  private def randomTexts(count: Int): Seq[String] = {
    val word = Gen.oneOf("a", "b", "the", "tok", "xyz", "á", "漢", "")
    val gen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    (1L to count.toLong).map(s => gen.apply(Gen.Parameters.default, Seed(s)).get)
  }

  private val adversarial = Seq("", " ", "  ", "a", "a b", "a b c",
    "the a the a", "á ß 漢字 x y z w v", "x  y", " lead tok tok2",
    "trail ", "a b c d e f g h", "a b c d e f g h i j")

  private def refChain(k: Int) = {
    val elems = (0 until k).map(j => s"element_at(a, i + $j)").mkString(", ")
    s"transform(sequence(1, size(a) - ${k - 1}), i -> concat_ws(' ', $elems))"
  }

  for (k <- Seq(2, graft.operators.Dedup.SpanK)) {
    test(s"span_hash60(text, $k) ≡ split→concat_ws→h60, positions included") {
      val texts = adversarial ++ randomTexts(200)
      val df = spark.createDataFrame(
          texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
        .toDF("doc_id", "text")
      val ref = df
        .select(col("doc_id"), split(col("text"), " ").as("a"))
        .filter(size(col("a")) >= k)
        .select(col("doc_id"), posexplode(expr(refChain(k))).as(Seq("p", "s")))
        .select(col("doc_id"), col("p"), CrossHash.h60(col("s")).as("h"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val got = df
        .select(col("doc_id"),
          posexplode(SpanHash.span_hash60(col("text"), k)).as(Seq("p", "h")))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got == ref, s"span hash stream diverged at k=$k")
    }
  }

  test("span_strings(text, 2) ≡ split→concat_ws, positions included") {
    val texts = adversarial ++ randomTexts(200)
    val df = spark.createDataFrame(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val ref = df
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), posexplode(expr(refChain(2))).as(Seq("p", "s")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val got = df
      .select(col("doc_id"),
        posexplode(SpanHash.span_strings(col("text"), 2)).as(Seq("p", "s")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(got == ref, "span string stream diverged")
  }

  test("codegen compiles — companion helper keeps its static forwarder (ADVICE r19 lesson)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = spark.range(0, 16).select(col("id"),
          SpanHash.span_hash60(concat_ws(" ", lit("a"), col("id"), lit("b"),
            lit("c")), 2).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got.size == 16)
      val want = SpanHash.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("a 5 b c"), 2)
        .toLongArray.toSeq
      assert(got(5L) == want && want.size == 3)
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
