package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[FeatureBuckets]] must reproduce the DSIR feature chain it replaced
  * EXACTLY — `h60(feature) % B` over `explode(concat(tokens, adjacent
  * bigrams))` with `h60 = conv(substring(md5(s),1,15),16,10)` — because
  * the q162/q163 oracles replay that md5 chain in DuckDB. Multiset
  * equality (order is never consumed downstream).
  */
class FeatureBucketsSpec extends AnyFunSuite with SparkFixture {

  private val B = 4096

  private def randomTexts(count: Int): Seq[String] = {
    val word = Gen.oneOf("a", "b", "the", "tok", "xyz", "á", "漢", "")
    val gen = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    (1L to count.toLong).map(s => gen.apply(Gen.Parameters.default, Seed(s)).get)
  }

  test("feature_buckets ≡ explode(tokens ++ bigrams) → md5-hex h60 % B, as multisets") {
    val texts = Seq("", " ", "a", "a b", "a b c", "the a the a",
      "á ß 漢字", "x  y", " lead", "trail ") ++ randomTexts(200)
    val df = spark.createDataFrame(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val refRows = df
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), explode(concat(col("a"), expr(
        "IF(size(a) < 2, array(), transform(sequence(1, size(a) - 1), " +
          "i -> concat(element_at(a, i), ' ', element_at(a, i + 1))))")))
        .as("tok"))
      .select(col("doc_id"),
        (CrossHash.h60(col("tok")) % B).as("b"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    val gotRows = df
      .select(col("doc_id"), FeatureBuckets.feature_buckets(col("text"), B).as("fb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    assert(gotRows.keySet == refRows.keySet)
    gotRows.foreach { case (id, got) =>
      assert(got == refRows(id), s"bucket multiset mismatch on doc $id")
    }
  }

  test("codegen compiles — companion helper keeps its static forwarder (ADVICE r19)") {
    // The generated code calls `graft.functions.FeatureBuckets.compute(...)`
    // as a STATIC method. scalac omits the static forwarder when the
    // companion method's name clashes with an inherited case-class member
    // (r19 shipped the helper as `eval`, clashing with Expression.eval —
    // Janino failed and every feature_buckets stage silently ran
    // interpreted, defeating the optimization while all value specs
    // passed). CODEGEN_ONLY + fallback-off turns that silent downgrade
    // into a loud failure here.
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(0, 64).select(col("id"),
        FeatureBuckets.feature_buckets(
          concat_ws(" ", lit("tok"), col("id"), lit("x")), B).as("fb"))
      val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got.size == 64)
      // value spot-check against the direct helper (3 tokens + 2 bigrams)
      val want = FeatureBuckets.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("tok 7 x"), B)
        .toLongArray.toSeq
      assert(got(7L) == want)
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("h60 span hash equals conv(substring(md5,1,15),16,10) on direct strings") {
    val df = spark.createDataFrame(
      Seq((1L, "spark"), (2L, ""), (3L, "a b"), (4L, "漢字")))
      .toDF("id", "s")
    val stripped = regexp_replace(col("s"), " ", "")
    val rows = df.select(
        CrossHash.h60(stripped).as("ref"),
        element_at(FeatureBuckets.feature_buckets(stripped, Int.MaxValue), 1))
      .collect()
    // single-token inputs (spaces stripped so the whole string is one
    // token): pin bucket == h60 % Int.MaxValue
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) % Int.MaxValue.toLong)
    }
  }
}
