package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Misra–Gries TypedImperativeAggregate: exact in the
  * distinct ≤ capacity regime, classic bounded undercount beyond it,
  * and merge-safe across partitionings.
  */
class FreqSketchSpec extends AnyFunSuite with SparkFixture {

  test("exact counts when distinct items fit the capacity, any partitioning") {
    import spark.implicits._
    val rnd = new Random(7)
    val items = Seq.fill(5000)(s"tok${rnd.nextInt(40)}")
    val expect = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = items.toDF("t").repartition(16)
      .agg(FreqSketch.freq_sketch(col("t"), 64).as("m"))
      .selectExpr("explode(m)").as[(String, Long)].collect().toMap
    assert(got == expect)
  }

  test("bounded state and bounded undercount when capacity < distinct") {
    import spark.implicits._
    val rnd = new Random(11)
    // 200 distinct, heavily skewed: tok0 appears ~half the time
    val items = Seq.fill(8000)(
      if (rnd.nextBoolean()) "tok0" else s"tok${1 + rnd.nextInt(199)}")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cap = 20
    val got = items.toDF("t").repartition(8)
      .agg(FreqSketch.freq_sketch(col("t"), cap).as("m"))
      .selectExpr("explode(m)").as[(String, Long)].collect().toMap
    assert(got.size <= cap, s"state exceeded capacity: ${got.size}")
    val maxErr = items.size.toLong / (cap + 1)
    got.foreach { case (k, c) =>
      assert(c <= truth(k), s"$k overcounted: $c > ${truth(k)}")
      assert(truth(k) - c <= maxErr, s"$k undercount ${truth(k) - c} > $maxErr")
    }
    // the guaranteed heavy hitter must be present and dominate
    assert(got.contains("tok0") && got("tok0") > maxErr)
  }

  test("randomized merge-invariance: sketch equals single-partition sketch") {
    import spark.implicits._
    val rnd = new Random(23)
    val items = Seq.fill(3000)(s"w${rnd.nextInt(30)}")
    def sketch(parts: Int) = items.toDF("t").repartition(parts)
      .agg(FreqSketch.freq_sketch(col("t"), 32).as("m"))
      .selectExpr("explode(m)").as[(String, Long)].collect().toMap
    // 30 distinct < 32 capacity: every partitioning must agree exactly
    assert(sketch(1) == sketch(13))
  }

  test("grouped sketches keep per-group state independent") {
    import spark.implicits._
    val df = (1 to 600).map(i => (i % 3, s"g${i % 3}_t${i % 5}")).toDF("g", "t")
    val rows = df.repartition(6).groupBy("g")
      .agg(FreqSketch.freq_sketch(col("t"), 16).as("m"))
      .selectExpr("g", "explode(m)").as[(Int, String, Long)].collect()
    assert(rows.length == 15) // 3 groups x 5 items
    rows.foreach { case (g, k, c) =>
      assert(k.startsWith(s"g${g}_"), s"group $g saw foreign key $k")
      assert(c == 40L, s"$k count $c != 40")
    }
  }

  test("serialization round-trip preserves counters (incl. >64KB items)") {
    val agg = FreqSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    val buf = agg.createAggregationBuffer()
    buf.put("a", 3L); buf.put("b", 1L); buf.put("c", 10L)
    buf.put("µ" * 70000, 2L) // would crash writeUTF's 64 KB cap
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
