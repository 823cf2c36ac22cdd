package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** char_run_count(text, cls) must equal regexp_count(text, '[cls]+')
  * on every input, multi-byte code points included (any byte outside
  * the ASCII class breaks a run, as any non-class code point does for
  * the regex).
  */
class CharRunCountSpec extends AnyFunSuite with SparkFixture {

  test("hand cases: runs, case sensitivity, multi-byte break, plus fixed counts") {
    import spark.implicits._
    val cases =
      Seq("", "xyz", "aeiou", "banana", "queueing", "aéa", "AEIOU")
    val df = cases.toDF("t").select(col("t"),
      CharRunCount.char_run_count(col("t"), "aeiou").as("c"),
      regexp_count(col("t"), lit("[aeiou]+")).cast("int").as("re"))
    val got = df.collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    for ((s, (c, re)) <- got) assert(c == re, s"'$s'")
    assert(got("banana")._1 == 3) // a / a / a
    assert(got("aéa")._1 == 2) // é breaks the run
    assert(got("AEIOU")._1 == 0) // case-sensitive, like the regex
  }

  test("randomized equality against the regex, mixed unicode") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val alphabet = "aeioubcdxyz AEIOU.é日0"
    val strs = Seq.fill(300)(
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    val rows = strs.toDF("t").select(col("t"),
      CharRunCount.char_run_count(col("t"), "aeiou").as("scan"),
      regexp_count(col("t"), lit("[aeiou]+")).cast("int").as("re")).collect()
    for (r <- rows) assert(r.getInt(1) == r.getInt(2), s"'${r.getString(0)}'")
  }

  test("non-ASCII class rejected at construction") {
    val e = intercept[IllegalArgumentException] {
      CharRunCount(org.apache.spark.sql.catalyst.expressions.Literal("x"), "aé")
    }
    assert(e.getMessage.contains("ASCII"))
  }
}
