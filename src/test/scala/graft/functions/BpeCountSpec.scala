package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BpeCount must equal the regex it replaces — `regexp_count(text,
  * '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')` — on every input, including
  * multi-byte code points (both Java regex and RE2 match the negated
  * class per code POINT, so the byte scan counts lead bytes only).
  */
class BpeCountSpec extends AnyFunSuite with SparkFixture {

  private val Pattern = graft.operators.TextAnalysis.BpePattern

  test("hand cases: runs, digits, punctuation, spaces, unicode") {
    import spark.implicits._
    val cases = Seq(
      "" -> 0, // empty
      "   " -> 0, // spaces only
      "abc" -> 1, // one letter run
      "abc def" -> 2,
      "a1b2" -> 4, // runs broken by single-digit tokens
      "123" -> 3, // each digit its own token
      "don't stop!" -> 5, // don / ' / t / stop / !
      "héllo wörld" -> 6, // h/é/llo + w/ö/rld — non-ASCII splits the runs
      "日本語" -> 3, // one token per code point
      "a  b" -> 2 // multiple spaces
    )
    val got = cases.map(_._1).toDF("t")
      .select(col("t"), BpeCount.bpe_count(col("t")).as("c"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    for ((s, want) <- cases) assert(got(s) == want, s"'$s'")
  }

  test("randomized equality against the regex oracle, interpreted and codegen") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val alphabet = "abzAZ019 .,!?-€日ß\t\n"
    val strs = Seq.fill(300)(
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    val df = strs.toDF("t").select(col("t"),
      BpeCount.bpe_count(col("t")).as("scan"),
      regexp_count(col("t"), lit(Pattern)).cast("int").as("re"))
    val rows = df.collect()
    for (r <- rows)
      assert(r.getInt(1) == r.getInt(2), s"'${r.getString(0)}'")
  }

  test("null in, null out") {
    import spark.implicits._
    val out = Seq(Option.empty[String], Some("x")).toDF("t")
      .select(BpeCount.bpe_count(col("t"))).collect()
    assert(out(0).isNullAt(0) && out(1).getInt(0) == 1)
  }
}
