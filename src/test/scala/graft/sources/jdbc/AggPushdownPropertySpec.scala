package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized aggregate-pushdown equivalence: GROUP BY plans whose
  * aggregates push into the remote Derby SQL must produce the same
  * rows as the identical plan over an in-memory mirror — NULL-skipping
  * aggregate semantics, empty groups, filters below the aggregate, and
  * the distinct flavors included. (The single golden is q57; this
  * sweeps the combinations.)
  */
class AggPushdownPropertySpec extends AnyFunSuite with SparkFixture {

  private lazy val rows: Seq[(Int, java.lang.Long, java.lang.Double)] =
    (1 to 60).map { i =>
      val g = i % 5
      val v: java.lang.Long = if (i % 7 == 0) null else Long.box((i * 11 % 23).toLong)
      val d: java.lang.Double = if (i % 9 == 0) null else Double.box((i * 13 % 17) * 1.5)
      (g, v, d)
    }

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.ap")
    spark.sql("DROP TABLE IF EXISTS ext.ap.t")
    import spark.implicits._
    rows.toDF("g", "v", "d").writeTo("ext.ap.t").create()
  }

  private def aggs(rnd: Random): Seq[Column] = {
    val pool: Seq[() => Column] = Seq(
      () => count(lit(1)).as(s"a${rnd.nextInt()}"),
      () => count(col("v")).as(s"a${rnd.nextInt()}"),
      () => countDistinct(col("v")).as(s"a${rnd.nextInt()}"),
      () => sum(col("v")).as(s"a${rnd.nextInt()}"),
      () => min(col("d")).as(s"a${rnd.nextInt()}"),
      () => max(col("v")).as(s"a${rnd.nextInt()}"),
      () => avg(col("d")).as(s"a${rnd.nextInt()}"),
      () => sum_distinct(col("v")).as(s"a${rnd.nextInt()}"))
    (0 to rnd.nextInt(3)).map(_ => pool(rnd.nextInt(pool.length))())
  }

  private def build(df: DataFrame, seed: Int): DataFrame = {
    val rnd = new Random(seed)
    val filtered =
      if (rnd.nextBoolean()) df.filter(col("v") % 3 =!= 1 || col("v").isNull) else df
    val as = aggs(new Random(seed * 31))
    if (rnd.nextBoolean()) filtered.groupBy("g").agg(as.head, as.tail: _*)
    else filtered.agg(as.head, as.tail: _*) // global aggregate
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("random GROUP BY aggregates: pushed Derby scan == in-memory mirror") {
    setup()
    import spark.implicits._
    val local = rows.toDF("g", "v", "d")
    for (seed <- 1 to 25) {
      val got = sortedRows(build(spark.table("ext.ap.t"), seed))
      val want = sortedRows(build(local, seed))
      assert(got == want, s"seed=$seed diverged:\n got=$got\nwant=$want")
    }
  }
}
