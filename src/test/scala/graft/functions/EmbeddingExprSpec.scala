package graft.functions

import graft.SparkFixture
import graft.operators.EmbeddingLsh
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen expressions (QDot, SignBands) must produce the
  * exact integers of the interpreted HOF formulations they replaced —
  * the DuckDB oracle still evaluates the HOF-equivalent SQL, so any
  * divergence is a correctness break, not just a perf bug.
  */
class EmbeddingExprSpec extends AnyFunSuite with SparkFixture {

  test("QDot equals the aggregate(zip_with) formulation, incl. negatives") {
    import spark.implicits._
    val df = Seq(
      (1L, Array.tabulate(64)(i => (i * 7 - 200).toLong),
        Array.tabulate(64)(i => (i * 13 - 99).toLong)),
      (2L, Array.fill(64)(Long.MaxValue / (1L << 40)), Array.fill(64)(1L << 20)),
      (3L, Array.tabulate(64)(_.toLong), Array.fill(64)(0L))
    ).toDF("id", "a", "b")
    val both = df.select(
      QDot.qdot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L),
        (acc, x) => acc + x).as("hof"))
    assert(both.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("SignBands equals the per-bit HOF formulation on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val df = (1L to 50L).map(i =>
      (i, Array.fill(64)((rnd.nextInt(2001) - 1000).toLong))).toDF("vec_id", "q")
    val native = EmbeddingLsh.bands(df)
      .select("vec_id", "k", "bv").as[(Long, Int, Long)].collect().toSet
    // HOF reference: the formulation bands() used before SignBands
    val nh = EmbeddingLsh.NumBands * EmbeddingLsh.BandBits
    val withBits = (0 until nh).foldLeft(df.select(col("vec_id"), col("q"))) { (d, j) =>
      d.withColumn(s"bit$j", expr(
        s"CASE WHEN aggregate(sequence(0, 63), cast(0 AS bigint), " +
          s"(acc, i) -> acc + element_at(q, cast(i+1 AS int)) * ${EmbeddingLsh.hcomp(j)}) >= 0 " +
          s"THEN cast(1 AS bigint) ELSE cast(0 AS bigint) END"))
    }
    val bandCols = (0 until EmbeddingLsh.NumBands).map { k =>
      (0 until EmbeddingLsh.BandBits).map(r =>
        col(s"bit${EmbeddingLsh.BandBits * k + r}") * (1L << r)).reduce(_ + _)
    }
    val hof = withBits
      .select(col("vec_id"), posexplode(array(bandCols: _*)).as(Seq("k", "bv")))
      .as[(Long, Int, Long)].collect().toSet
    assert(native == hof)
  }

  test("short vectors produce all-zero bands (HOF null-poisoning parity)") {
    import spark.implicits._
    val df = Seq((1L, Array(3L, 4L))).toDF("vec_id", "q")
    val bv = EmbeddingLsh.bands(df).select("bv").as[Long].collect()
    assert(bv.length == EmbeddingLsh.NumBands && bv.forall(_ == 0L))
  }
}
