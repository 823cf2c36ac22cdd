package graft.functions

import graft.SparkFixture
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** [[CollectCappedAgg]] semantics: bounded state, null-on-overflow, and
  * [[Dedup.bucketPairs]] equivalence to the brute-force formulation
  * across partition layouts (merges of saturated partials).
  */
class CollectCappedSpec extends AnyFunSuite with SparkFixture {

  test("collect_capped: under-cap groups collect all, over-cap groups null") {
    import spark.implicits._
    val df = (1 to 50).map(i => (if (i <= 45) "big" else "small", i.toLong))
      .toDF("g", "v").repartition(8) // force cross-partition merges
    val out = df.groupBy("g")
      .agg(CollectCapped.collect_capped(col("v"), 10).as("vs"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out("big").isEmpty, "45 > cap=10 must yield null")
    assert(out("small").get.sorted == (46L to 50L))
  }

  test("bucketPairs == capBuckets + self-join, any partitioning") {
    import spark.implicits._
    val rnd = new Random(7)
    // skewed buckets: some under, some exactly at, some over the cap
    val rows = (1 to 400).map { i =>
      val bucket = rnd.nextInt(12)
      (bucket, i.toLong)
    }
    for (cap <- Seq(3, 20, 100); parts <- Seq(1, 7)) {
      val df = rows.toDF("b", "doc_id").repartition(parts)
      val got = Dedup.bucketPairs(df, Seq("b"), cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sizes = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val want = (for {
        (b, members) <- rows.groupBy(_._1).toSeq if sizes(b) <= cap
        Seq(x, y) <- members.map(_._2).combinations(2).toSeq
      } yield (math.min(x, y), math.max(x, y))).toSet
      assert(got == want, s"cap=$cap parts=$parts")
    }
  }

  test("bucketPairs keeps non-numeric id types (documented any-id surface)") {
    import spark.implicits._
    val rows = Seq(("b1", "uuid-a"), ("b1", "uuid-c"), ("b1", "uuid-b"), ("b2", "uuid-z"))
      .toDF("b", "doc_id").repartition(3)
    val got = Dedup.bucketPairs(rows, Seq("b"), cap = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("uuid-a", "uuid-b"), ("uuid-a", "uuid-c"), ("uuid-b", "uuid-c")))
  }

  test("collect_wcapped: caps on the weight SUM, keeps members under it, rejects weight < 1") {
    import spark.implicits._
    // weights are copy counts (the r17 pre-collapse): bucket g=0 sums
    // to 6 ≤ cap 6 (kept, all members), g=1 sums to 7 > 6 (dropped)
    val df = Seq((0L, 10L, 2L), (0L, 11L, 3L), (0L, 12L, 1L),
      (1L, 20L, 4L), (1L, 21L, 3L)).toDF("g", "id", "w").repartition(3)
    val out = df.groupBy("g")
      .agg(CollectCapped.collect_wcapped(col("id"), col("w"), 6L).as("xs"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).sorted)).toMap
    assert(out(0L) == Seq(10L, 11L, 12L), out.toString)
    assert(out(1L) == null, "over-weight bucket must be NULL (dropped)")
    // the bounded-state guarantee needs every row to consume budget:
    // zero/negative weights are rejected, not silently collected
    val e = intercept[org.apache.spark.SparkException] {
      Seq((0L, 1L, 0L)).toDF("g", "id", "w").groupBy("g")
        .agg(CollectCapped.collect_wcapped(col("id"), col("w"), 6L))
        .collect()
    }
    assert(e.getMessage.contains("weight must be"),
      s"zero weight not rejected: ${e.getMessage}")
  }

  test("collect_wcapped ignores NULL children entirely, like its unweighted twin (ADVICE r17)") {
    import spark.implicits._
    // g=0 carries a NULL item with weight 5: were the weight consumed
    // (the r17 behavior), the bucket would exceed cap 6 and drop — the
    // documented 'weighted form of CollectCappedAgg' contract says a
    // NULL child is invisible to item AND census alike
    val df = Seq((0L, Some(10L), 2L), (0L, None, 5L), (0L, Some(11L), 3L))
      .toDF("g", "id", "w").repartition(2)
    val out = df.groupBy("g")
      .agg(CollectCapped.collect_wcapped(col("id"), col("w"), 6L).as("xs"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).sorted)).toMap
    assert(out(0L) == Seq(10L, 11L),
      s"NULL child must not consume weight budget: ${out(0L)}")
  }

  test("collect_capped over struct elements survives serialize/merge") {
    import spark.implicits._
    val df = (1L to 30L).map(i => (i % 3, i, i * 100)).toDF("g", "a", "b")
      .repartition(5)
    val out = df.groupBy("g")
      .agg(CollectCapped.collect_capped(struct(col("a"), col("b")), 15).as("xs"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1))).sorted
      }.toMap
    for (g <- 0L to 2L)
      assert(out(g) == (1L to 30L).filter(_ % 3 == g).map(i => (i, i * 100)))
  }
}
