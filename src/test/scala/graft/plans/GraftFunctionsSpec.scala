package graft.plans

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface must agree bit-for-bit with the DataFrame
  * twins the operators use — one semantics, two entry points.
  */
class GraftFunctionsSpec extends AnyFunSuite with SparkFixture {

  test("graft_h60 in SQL equals CrossHash.h60 in the DataFrame API") {
    import spark.implicits._
    val df = Seq("", "a", "hello world", "ünïcödé ✓").toDF("s")
    df.createOrReplaceTempView("h60_in")
    val sql = spark.sql("SELECT s, graft_h60(s) AS h FROM h60_in")
      .as[(String, Long)].collect().toMap
    val api = df.select(col("s"), graft.functions.CrossHash.h60(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    assert(sql == api)
  }

  test("graft_rolling_hash and graft_qdot evaluate the native expressions") {
    import spark.implicits._
    val rh = spark.sql("SELECT graft_rolling_hash('abc') AS h").as[Long].head()
    assert(rh == graft.functions.RollingHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))

    val qd = spark.sql(
      "SELECT graft_qdot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").as[Long].head()
    assert(qd == 1L * 4 + 2L * 5 + 3L * 6)
  }

  test("graft_sign_bands requires literal shape args and matches the expression") {
    import spark.implicits._
    val sql = spark.sql(
      "SELECT graft_sign_bands(array(1L, -2L, 3L, -4L, 5L, -6L, 7L, -8L), 2, 4) AS b")
      .as[Seq[Long]].head()
    assert(sql.length == 2)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_sign_bands(array(1L), cast(rand()*2 AS INT), 4)").collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("graft_kmv_kth_min aggregates in SQL with GROUP BY, matching the Column form") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 2, s"v$i")).toDF("g", "s")
    df.createOrReplaceTempView("kmv_in")
    val sql = spark.sql(
      "SELECT g, graft_kmv_kth_min(graft_h60(s), 5) AS kth FROM kmv_in GROUP BY g")
      .as[(Int, Long)].collect().toMap
    val api = df.groupBy("g")
      .agg(graft.functions.KmvSketch.kth_min(
        graft.functions.CrossHash.h60(col("s")), 5).as("kth"))
      .as[(Int, Long)].collect().toMap
    assert(sql == api && sql.size == 2)
  }

  test("graft_freq_sketch aggregates in SQL, exact under capacity") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("s")
    df.createOrReplaceTempView("fs_in")
    val m = spark.sql("SELECT graft_freq_sketch(s, 8) AS m FROM fs_in")
      .as[Map[String, Long]].head()
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("graft_bpe_count and graft_gram evaluate the native expressions in SQL") {
    import spark.implicits._
    val bc = spark.sql("SELECT graft_bpe_count('don''t stop!') AS c").as[Int].head()
    assert(bc == 5) // don / ' / t / stop / !
    // the Gramian aggregate wraps like a built-in aggregate and matches
    // the Column form used by Similarity.gramMatrix
    Seq(Tuple1(Seq(1L, 2L)), Tuple1(Seq(3L, 4L))).toDF("q")
      .createOrReplaceTempView("gram_in")
    val g = spark.sql("SELECT graft_gram(q) AS g FROM gram_in")
      .as[Seq[Seq[Long]]].head()
    assert(g == Seq(Seq(1L * 1 + 3L * 3, 1L * 2 + 3L * 4),
      Seq(1L * 2 + 3L * 4, 2L * 2 + 4L * 4)))
    // non-integral arrays fail analysis through the SQL surface too
    Seq(Tuple1(Seq(1.5, 2.5))).toDF("q").createOrReplaceTempView("gram_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_gram(q) FROM gram_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("integral") ||
      e.getMessage.contains("graft_gram"), e.getMessage)
  }

  test("graft_char_run_count / graft_token_count / graft_token_hits in SQL") {
    import spark.implicits._
    val r = spark.sql(
      "SELECT graft_char_run_count('banana', 'aeiou') AS runs, " +
        "graft_token_count('a the fox') AS n, " +
        "graft_token_hits('a the fox', 'the', 'a') AS h")
      .as[(Int, Int, Int)].head()
    assert(r == ((3, 3, 2)))
    // non-literal class/word args are rejected at analysis, like the
    // sketch-shape literals
    val e = intercept[Exception] {
      spark.sql("SELECT graft_char_run_count('x', concat('a','e'))").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("graft_json_get: bare-key catch-all extraction ≡ get_json_object, codegen'd") {
    import spark.implicits._
    val df = Seq(
      ("""{"age":34,"name":"alice","tags":["x"]}""", "age"),
      ("""{"age":null,"name":"bob"}""", "age"),
      ("""{"name":"carol"}""", "age")).toDF("data", "k")
    df.createOrReplaceTempView("jg_in")
    // literal key: the JSONPath concat constant-folds
    val lit = spark.sql(
      "SELECT graft_json_get(data, 'age') AS v FROM jg_in").as[String].collect().toSeq
    val ref = df.select(get_json_object(col("data"), "$.age").as("v"))
      .as[String].collect().toSeq
    assert(lit == ref && lit == Seq("34", null, null))
    // dynamic key column works too (path built per row)
    val dyn = spark.sql(
      "SELECT graft_json_get(data, k) AS v FROM jg_in").as[String].collect().toSeq
    assert(dyn == lit)
    // stays inside whole-stage codegen: no UDF, native GetJsonObject
    // (a non-local source — the literal frame folds to LocalTableScan)
    val plan = spark.range(10)
      .selectExpr("""concat('{"age":', id, '}') AS data""")
      .selectExpr("graft_json_get(data, 'age') AS v")
      .queryExecution.executedPlan.toString
    // the `*(N)` prefix marks whole-stage-codegen stages; the folded
    // `$.age` path shows the literal-key concat constant-folded
    assert(plan.contains("*(1) Project") &&
      plan.contains("get_json_object") && plan.contains("$.age"), plan)
  }

  test("graft_json_get rejects JSONPath metacharacters in literal keys (ADVICE r10)") {
    spark.range(1).selectExpr("""'{"a":{"b":1}}' AS data""")
      .createOrReplaceTempView("jg_meta")
    for (k <- Seq("a.b", "a[0]", "*", "a'b", "$x", "t?")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_json_get(data, '${k.replace("'", "''")}') FROM jg_meta")
          .collect()
      }
      assert(e.getMessage.contains("metacharacters"), s"key '$k': ${e.getMessage}")
    }
    // non-literal keys stay the caller's contract — still evaluate
    assert(spark.sql(
      "SELECT graft_json_get(data, concat('a', '')) FROM jg_meta").count() == 1)
  }

  test("graft_bloom_agg/graft_might_contain: no false negatives, exact after the verifying join") {
    import spark.implicits._
    (1L to 500L).map(i => i * 7).toDF("k").createOrReplaceTempView("bl_build")
    spark.range(0, 5000).toDF("k").createOrReplaceTempView("bl_probe")
    // every true member passes (a bloom filter can never drop a member)
    val kept = spark.sql(
      "SELECT k FROM bl_probe WHERE graft_might_contain(" +
        "(SELECT graft_bloom_agg(k, 1000) FROM bl_build), k)")
      .as[Long].collect().toSet
    val members = (1L to 500L).map(_ * 7).filter(_ < 5000).toSet
    assert(members.subsetOf(kept), s"bloom dropped ${members -- kept}")
    // and the filter is selective: false positives are a small residue,
    // discarded exactly by the semi join (the q137 contract)
    assert(kept.size < 2500, s"bloom not selective: ${kept.size} of 5000 kept")
    val exact = spark.sql(
      "SELECT p.k FROM bl_probe p WHERE graft_might_contain(" +
        "(SELECT graft_bloom_agg(k, 1000) FROM bl_build), p.k) " +
        "AND p.k IN (SELECT k FROM bl_build)").as[Long].collect().toSet
    assert(exact == members)
    // arity misuse fails at analysis with the documented signature
    val e = intercept[Exception] {
      spark.sql("SELECT graft_might_contain(1) FROM bl_probe").collect()
    }
    assert(e.getMessage.contains("graft_might_contain"), e.getMessage)
  }
}
