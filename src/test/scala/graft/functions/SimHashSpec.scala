package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SimHash60 must equal the aggregate pipeline it replaces —
  * explode(split(text,' ')) → h60 → groupBy(doc,th) count →
  * 60 signed-SUM vote columns → bit pack — on every input, including
  * empty tokens (split keeps empty segments), unicode, and the empty
  * string (one empty token, NOT zero tokens). The aggregate form below
  * is the verbatim r14/r15 implementation, which the q43/q44/q80 DuckDB
  * oracles pinned for six rounds; randomized equality here extends that
  * pin to the byte-scan expression.
  */
class SimHashSpec extends AnyFunSuite with SparkFixture {

  import graft.functions.CrossHash.h60

  /** The r15 formulation, kept as the in-test reference. */
  private def aggregateForm(df: DataFrame): DataFrame = {
    val votes = (0 until 60).map(b =>
      sum(expr(s"CASE WHEN shiftright(th, $b) % 2 = 1 THEN c ELSE -c END")).as(s"s$b"))
    val pack = (0 until 60).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    df.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), h60(col("tok")).as("th"))
      .groupBy("doc_id", "th").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), pack.as("simhash"))
  }

  private def compare(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val scan = df.select(col("doc_id"), SimHash.simhash60(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = aggregateForm(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scan.keySet == agg.keySet)
    for ((id, s) <- scan)
      assert(s == agg(id), s"doc $id: '${texts(id.toInt)}'")
  }

  test("hand cases: empty string, repeated tokens, empty segments, unicode") {
    compare(Seq(
      "", // ONE empty token (split(\"\", \" \") = [\"\"])
      " ", // two empty tokens
      "a", "a a", "a a a", // repetition shifts votes
      "a  b", // empty middle segment votes too
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld 日本語 test",
      "trailing space ",
      " leading space"))
  }

  test("randomized equality against the r15 aggregate form") {
    val rnd = new scala.util.Random(61)
    val words = Seq("alpha", "beta", "gamma", "δelta", "ep", "x", "", "99",
      "longer-token-with-punct!", "日本")
    val texts = Seq.fill(120)(
      (0 until rnd.nextInt(30)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" "))
    compare(texts)
  }

  test("null in, null out; signature fits in 60 bits") {
    import spark.implicits._
    val out = Seq(Option.empty[String], Some("x y z")).toDF("t")
      .select(SimHash.simhash60(col("t"))).collect()
    assert(out(0).isNullAt(0))
    val sig = out(1).getLong(0)
    assert(sig >= 0L && sig < (1L << 60))
  }
}
