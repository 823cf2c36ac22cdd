package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two shuffle-shaping techniques the 100 TB design names:
  * bucketed co-located joins (no exchange) and salted skew aggregation.
  */
class ScaleSpec extends AnyFunSuite with SparkFixture {

  test("bucketed tables join with NO shuffle on either side") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b1")
    spark.sql("DROP TABLE IF EXISTS b2")
    (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("b1")
    (1L to 1000L).map(i => (i, i * 2)).toDF("k", "rv")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("b2")
    // disable broadcast so the join exercises the bucketed SMJ path the
    // technique exists for (at real scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b1").join(spark.table("b2"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation matches direct groupBy under heavy skew") {
    import spark.implicits._
    // one hot key with 50k distinct-payload rows, 100 normal keys
    val skewed = ((1 to 50000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).flatMap(k => (1 to 10).map(_ => (s"k$k", 2.0))))
      .toDF("key", "v").repartition(16)

    val direct = skewed.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(skewed, "key", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(salted("hot") == 50000L && salted("k7") == 10L)
    assert(direct("hot") == 50000L)

    val directSum = skewed.groupBy("key")
      .agg(sum(col("v").cast("decimal(18,2)")).as("sum"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val saltedSum = Scale.saltedSum(skewed, "key", col("v").cast("decimal(18,2)"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(saltedSum.view.mapValues(_.doubleValue()).toMap ==
      directSum.view.mapValues(_.doubleValue()).toMap)

    // the first phase genuinely splits the hot key across salts — and
    // deterministically (content hash, not position), so a task retry
    // re-derives identical routing
    val phase1 = skewed
      .withColumn("__salt", pmod(hash(col("key"), col("v")), lit(8)))
      .filter(col("key") === "hot").select("__salt").distinct().count()
    assert(phase1 > 1, s"hot key not split: $phase1 salt values")
  }

  test("LSH bucket cap bounds banded self-join fanout on a degenerate corpus") {
    import spark.implicits._
    // a template cluster floods one band value with 2000 members (an
    // uncapped self-join would emit ~2M pairs on ONE shuffle key), plus
    // 60 healthy buckets of 5 members each
    val rows = (1L to 2000L).map(i => (i, 0, "HOT")) ++
      (1L to 300L).map(i => (i, 1, s"s${i % 60}"))
    val sig = rows.toDF("doc_id", "band", "sig")
    val capped = Dedup.capBuckets(sig, Dedup.BucketCap, "band", "sig")

    assert(capped.filter(col("band") === 0).count() == 0,
      "degenerate bucket must be dropped whole")
    assert(capped.count() == 300, "healthy buckets must survive intact")
    val maxBucket = capped.groupBy("band", "sig").count()
      .agg(max("count")).as[Long].head()
    assert(maxBucket <= Dedup.BucketCap)

    // per-key fanout is now ≤ C(cap,2); here: 60 buckets × C(5,2)
    val pairs = capped.as("x").join(capped.as("y"),
      col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id"))
    assert(pairs.count() == 60 * 10)
  }
}
