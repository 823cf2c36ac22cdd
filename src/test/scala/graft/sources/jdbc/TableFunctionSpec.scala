package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S3 (table-function source) + S5 (parameterized table args). */
class TableFunctionSpec extends AnyFunSuite with SparkFixture {

  test("a Derby table function reads as a pushdown-capable table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.tf")
    spark.sql("DROP TABLE IF EXISTS ext.tf.t1")
    import spark.implicits._
    (1L to 4L).map(i => (i, s"r$i")).toDF("k", "v").writeTo("ext.tf.t1").create()

    // SPACE_TABLE() is a Derby diagnostic TABLE FUNCTION: the "table"
    // is a function result, exactly the reference's read_csv-as-table
    val df = spark.read.format("graft.sources.jdbc.GraftJdbcSource")
      .option("url", SparkFixture.derbyUrl)
      .option("dbtable", "TABLE (SYSCS_DIAG.SPACE_TABLE()) AS T")
      .load()
    assert(df.schema.fieldNames.contains("CONGLOMERATENAME"))
    val rows = df.filter(col("ISINDEX") === 0)
      .select("CONGLOMERATENAME").collect().map(_.getString(0))
    // our catalog quotes identifiers, so the table name is stored lowercase
    assert(rows.contains("t1"), rows.mkString(","))
    // pushdown applies to the function scan like any table
    val plan = df.filter(col("ISINDEX") === 0).queryExecution.executedPlan.toString
    assert(plan.contains("SYSCS_DIAG.SPACE_TABLE()") && plan.contains("WHERE"), plan)
  }

  test("plain tables read through the catalog-free source with TopN pushdown") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.tf")
    spark.sql("DROP TABLE IF EXISTS ext.tf.t2")
    import spark.implicits._
    (1L to 30L).map(i => (i, i % 7)).toDF("k", "m").writeTo("ext.tf.t2").create()
    val df = spark.read.format("graft.sources.jdbc.GraftJdbcSource")
      .option("url", SparkFixture.derbyUrl)
      .option("dbtable", "\"tf\".\"t2\"")
      .load()
      .orderBy(col("m").desc, col("k")).limit(5)
    assert(df.queryExecution.executedPlan.toString.contains("FETCH FIRST 5 ROWS ONLY"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      (1L to 30L).map(i => (i, i % 7)).sortBy(t => (-t._2, t._1)).take(5).map(_._1))
  }

  test("parameterized table args render after the table name (golden)") {
    val o = JdbcOptions(Map(
      "url" -> "jdbc:clickhouse://example:8123/db",
      "dialect" -> "postgres", // any quoting dialect; golden only
      "dbtable" -> "\"param_view\"",
      "tableargs" -> "region = 'EU', lookback = 7"))
    val scan = JdbcScan(o, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))),
      where = Seq("(\"k\" > 5)"), orderBy = Nil, limit = None)
    assert(scan.sql ==
      """SELECT "k" FROM "param_view"(region = 'EU', lookback = 7) WHERE ("k" > 5)""")
  }
}
