package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered query definitions, from every operator module. */
  def all: Seq[Q] =
    operators.Relational.queries ++
      operators.AsOfJoin.queries ++
      operators.Sessions.queries ++
      operators.TextAnalysis.queries ++
      operators.Curation.queries ++
      operators.Cluster.queries ++
      operators.Dedup.queries ++
      operators.Connector.queries ++
      operators.DocumentOps.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Layout.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way star join + aggregation: the shape this engine exists for.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val n = Tables.load(spark, dir, "nation")
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    val l = Tables.load(spark, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 2))))).cast("double")
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
