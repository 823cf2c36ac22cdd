package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins [[EditDistance]] (Myers bit-parallel) to reference semantics:
  * a naive Wagner–Fischer DP here, and Spark's built-in `levenshtein`
  * end-to-end. q116 swaps the built-in for this expression, so
  * value-identity IS the correctness contract — the DuckDB oracle
  * still computes plain `levenshtein`.
  */
class EditDistanceSpec extends AnyFunSuite with graft.SparkFixture {

  private def d(a: String, b: String): Int =
    EditDistance.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Textbook O(n·m) reference DP over code points. */
  private def naive(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val dp = Array.tabulate(x.length + 1)(i => i)
    for (j <- 1 to y.length) {
      var diag = dp(0)
      dp(0) = j
      for (i <- 1 to x.length) {
        val tmp = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          diag + (if (x(i - 1) == y(j - 1)) 0 else 1))
        diag = tmp
      }
    }
    dp(x.length)
  }

  test("known distances") {
    assert(d("kitten", "sitting") == 3)
    assert(d("", "") == 0)
    assert(d("", "abc") == 3)
    assert(d("abc", "") == 3)
    assert(d("abc", "abc") == 0)
    assert(d("flaw", "lawn") == 2)
    assert(d("intention", "execution") == 5)
  }

  test("prefix/suffix stripping does not break boundary cases") {
    assert(d("aaaaab", "aaaaac") == 1)
    assert(d("xabc", "abc") == 1)
    assert(d("abc", "abcx") == 1)
    assert(d("aXa", "aYa") == 1)
    assert(d("ab", "ba") == 2)
  }

  test("property: equals naive DP on random strings across block boundaries") {
    val rnd = new Random(42)
    // small alphabet → dense edits; lengths straddle the 64/128/192-bit
    // block boundaries the blocked Myers carries horizontal deltas across
    for (trial <- 0 until 2000) {
      val alpha = "ab" + ("cdefgh".take(rnd.nextInt(6)))
      val la = rnd.nextInt(200)
      val lb = rnd.nextInt(200)
      val a = Array.fill(la)(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Array.fill(lb)(alpha(rnd.nextInt(alpha.length))).mkString
      assert(d(a, b) == naive(a, b), s"trial $trial: a=$a b=$b")
    }
  }

  test("property: exact lengths at block boundaries 63/64/65/127/128/129") {
    val rnd = new Random(7)
    for (la <- Seq(63, 64, 65, 127, 128, 129); lb <- Seq(1, 63, 64, 65, 128, 200)) {
      val a = Array.fill(la)(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Array.fill(lb)(('a' + rnd.nextInt(3)).toChar).mkString
      assert(d(a, b) == naive(a, b), s"la=$la lb=$lb")
    }
  }

  test("non-ASCII code points, including supplementary planes") {
    assert(d("héllo", "hello") == 1) // code-point unit, unlike DuckDB's bytes
    assert(d("日本語", "日本") == 1)
    val emoji = new String(Character.toChars(0x1f600))
    assert(d(s"a${emoji}b", "ab") == 1)
    val rnd = new Random(11)
    val alpha = Array(0x61, 0xe9, 0x4e9c, 0x1f600, 0x62)
    for (_ <- 0 until 300) {
      val a = Array.fill(rnd.nextInt(80))(alpha(rnd.nextInt(alpha.length)))
        .flatMap(Character.toChars).mkString
      val b = Array.fill(rnd.nextInt(80))(alpha(rnd.nextInt(alpha.length)))
        .flatMap(Character.toChars).mkString
      assert(d(a, b) == naive(a, b), s"a=$a b=$b")
    }
  }

  test("matches Spark's built-in levenshtein end-to-end, and from SQL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(3)
    val rows = (0 until 500).map { _ =>
      val alpha = "abcde"
      (Array.fill(rnd.nextInt(150))(alpha(rnd.nextInt(5))).mkString,
        Array.fill(rnd.nextInt(150))(alpha(rnd.nextInt(5))).mkString)
    } :+ ((null: String, "x")) :+ (("x", null: String))
    val df = rows.toDF("a", "b")
    val bad = df.select(
      EditDistance.edit_distance(col("a"), col("b")).as("mine"),
      levenshtein(col("a"), col("b")).as("ref"))
      .filter(not(col("mine") <=> col("ref")))
      .count()
    assert(bad == 0)
    df.createOrReplaceTempView("ed_pairs")
    val badSql = spark.sql(
      "SELECT count(*) FROM ed_pairs " +
        "WHERE NOT graft_edit_distance(a, b) <=> levenshtein(a, b)")
      .head().getLong(0)
    assert(badSql == 0)
  }
}
