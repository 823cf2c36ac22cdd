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
}
