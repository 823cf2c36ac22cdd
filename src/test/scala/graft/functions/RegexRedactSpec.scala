package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[RegexRedact]] must equal `(regexp_count, regexp_replace)` exactly —
  * the q115/q84 oracles hash both the counts and the rewritten text.
  */
class RegexRedactSpec extends AnyFunSuite with SparkFixture {

  private val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  test("regex_redact ≡ (regexp_count, regexp_replace) on adversarial inputs") {
    val texts = Seq(
      "", "no match here", "a@b.co", "x a@b.co y c@d.org z",
      "adjacent a@b.co,c@d.ee!", "unicode á@b.co 漢", "@@@ not@an@email",
      "trailing a@b.co", "a@b.co", "dots a.b.c@d.e.fg end",
      "many a@b.co a@b.co a@b.co a@b.co")
    val df = spark.createDataFrame(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("id", "text")
    val rows = df.select(
        RegexRedact.regex_redact(col("text"), email, "<EMAIL>").as("r"),
        regexp_count(col("text"), lit(email)).as("n"),
        regexp_replace(col("text"), email, "<EMAIL>").as("t"))
      .collect()
    rows.foreach { r =>
      val s = r.getStruct(0)
      assert(s.getInt(0) == r.getInt(1), s"count mismatch on '${r.getString(2)}'")
      assert(s.getString(1) == r.getString(2), "replacement mismatch")
    }
  }

  test("word-boundary alternation pattern (the q84 shape)") {
    val pat = "(\\bcustomer\\b|\\bspark\\b)"
    val df = spark.createDataFrame(Seq(
      (1L, "customer spark customers sparky customer"),
      (2L, "spark-customer spark_customer"),
      (3L, ""))).toDF("id", "text")
    val rows = df.select(
        RegexRedact.regex_redact(col("text"), pat, "<x>").as("r"),
        regexp_count(col("text"), lit(pat)).as("n"),
        regexp_replace(col("text"), pat, "<x>").as("t"))
      .collect()
    rows.foreach { r =>
      val s = r.getStruct(0)
      assert(s.getInt(0) == r.getInt(1) && s.getString(1) == r.getString(2))
    }
  }

  test("replacement with $ or backslash is rejected loudly") {
    intercept[IllegalArgumentException] {
      RegexRedact(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        "a", "$1")
    }
  }
}
