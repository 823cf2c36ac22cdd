package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized TopN/OFFSET pushdown equivalence: ORDER BY over nullable
  * columns in every direction × null-ordering combination, followed by
  * random OFFSET/LIMIT, must return the IDENTICAL ordered row list
  * through the pushed remote scan and over an in-memory mirror. A
  * trailing non-null unique tiebreaker makes every sort total, so the
  * comparison is order-sensitive and the selected window is
  * deterministic — exactly the surface where a dialect's NULLS
  * FIRST/LAST spelling or OFFSET/FETCH splicing can silently pick
  * different rows. Runs on both live wires (Derby and DuckDB).
  */
class TopNPropertySpec extends AnyFunSuite with SparkFixture {

  // r is the non-null unique tiebreaker; k/d/s carry nulls and ties
  private lazy val rows: Seq[(Long, java.lang.Long, java.lang.Double, String)] =
    (1 to 40).map { i =>
      val k: java.lang.Long = if (i % 6 == 0) null else Long.box((i % 7).toLong)
      val d: java.lang.Double = if (i % 8 == 0) null else Double.box((i % 5) * 2.5)
      val s: String = if (i % 9 == 0) null else s"s${i % 4}"
      (i.toLong, k, d, s)
    }

  private def setup(catalog: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $catalog.tn")
    spark.sql(s"DROP TABLE IF EXISTS $catalog.tn.t")
    import spark.implicits._
    rows.toDF("r", "k", "d", "s").writeTo(s"$catalog.tn.t").create()
    s"$catalog.tn.t"
  }

  /** One random sort key in one of the four direction/null-order forms. */
  private def key(rnd: Random): Column = {
    val c = col(Seq("k", "d", "s")(rnd.nextInt(3)))
    rnd.nextInt(4) match {
      case 0 => c.asc_nulls_first
      case 1 => c.asc_nulls_last
      case 2 => c.desc_nulls_first
      case 3 => c.desc_nulls_last
    }
  }

  private def build(df: DataFrame, seed: Int): DataFrame = {
    val rnd = new Random(seed)
    val keys = (0 to rnd.nextInt(2)).map(_ => key(rnd)) :+ col("r").asc
    val sorted = df.orderBy(keys: _*)
    val withOffset =
      if (rnd.nextBoolean()) sorted.offset(rnd.nextInt(10)) else sorted
    withOffset.limit(1 + rnd.nextInt(30))
  }

  private def ordered(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  private def sweep(name: String): Unit = {
    import spark.implicits._
    val local = rows.toDF("r", "k", "d", "s")
    for (seed <- 1 to 30) {
      val got = ordered(build(spark.table(name), seed))
      val want = ordered(build(local, seed))
      assert(got == want, s"seed=$seed diverged:\n got=$got\nwant=$want")
    }
    // Prove the sweep exercises the PUSHED path, not a silent local
    // fallback: a null-ordering multi-key TopN must reach the remote SQL
    val probe = spark.table(name)
      .orderBy(col("k").desc_nulls_last, col("r").asc).limit(5)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("ORDER BY") && plan.contains("NULLS LAST"),
      s"TopN with null ordering not pushed:\n$plan")
  }

  test("random ORDER BY/OFFSET/LIMIT: pushed Derby scan == in-memory mirror") {
    sweep(setup("ext"))
  }

  test("random ORDER BY/OFFSET/LIMIT: pushed live-DuckDB scan == in-memory mirror") {
    assume(DuckDbWireSpec.driverPresent, "duckdb_jdbc driver not on classpath")
    val dir = java.nio.file.Files.createTempDirectory("graft_tnduck").toString
    spark.conf.set("spark.sql.catalog.tnduck", "graft.sources.jdbc.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tnduck.url", s"jdbc:duckdb:$dir/sweep.duckdb")
    sweep(setup("tnduck"))
  }
}
