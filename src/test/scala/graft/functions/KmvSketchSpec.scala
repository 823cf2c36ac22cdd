package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV TypedImperativeAggregate: bounded-state distinct sketch whose
  * partial buffers merge across partitions without value loss.
  */
class KmvSketchSpec extends AnyFunSuite with SparkFixture {

  test("kth_min returns the k-th smallest distinct value across partitions") {
    import spark.implicits._
    // 40 values with duplicates, scattered over 8 partitions
    val df = (1L to 20L).flatMap(v => Seq(v * 10, v * 10)).toDF("v").repartition(8)
    val got = df.agg(KmvSketch.kth_min(col("v"), 5)).collect()(0).getLong(0)
    assert(got == 50L) // 5th smallest distinct of 10,20,...,200
  }

  test("fewer than k distinct values yields null") {
    import spark.implicits._
    val got = Seq(1L, 1L, 2L).toDF("v")
      .agg(KmvSketch.kth_min(col("v"), 5)).collect()(0)
    assert(got.isNullAt(0))
  }

  test("grouped sketch state stays k-bounded and correct per group") {
    import spark.implicits._
    val df = (1L to 1000L).map(v => (v % 4, v)).toDF("g", "v").repartition(16)
    val rows = df.groupBy("g").agg(KmvSketch.kth_min(col("v"), 3).as("kth"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // group g holds values {g, g+4, g+8, ...} (with g=0 -> {4,8,...});
    // 3rd smallest is g+8 except g=0 where it is 12
    assert(rows == Map(0L -> 12L, 1L -> 9L, 2L -> 10L, 3L -> 11L))
  }

  test("serialization round-trip preserves the buffer") {
    val agg = KmvSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L), 4)
    val buf = agg.createAggregationBuffer()
    Seq(9L, 3L, 7L, 1L, 5L, 3L).foreach { v =>
      buf.add(v); if (buf.size > 4) buf.pollLast()
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toArray.toSeq == Seq(1L, 3L, 5L, 7L))
    assert(agg.eval(back) == 7L)
  }
}
