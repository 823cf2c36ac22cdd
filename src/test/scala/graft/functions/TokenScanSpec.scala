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

  test("null in, null out") {
    import spark.implicits._
    val out = Seq(Option.empty[String]).toDF("t")
      .select(TokenScan.token_count(col("t")),
        TokenScan.token_hits(col("t"), words)).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
  }
}
