package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables.
  *
  * Mirrors the reference's notion of a registered catalog of tables
  * (datafusion-table-providers `DatabaseCatalogProvider`,
  * reference `crates/common/src/common.rs:17-100`) for the local parquet
  * corpus: every query addresses tables by name; the scan is a plain
  * parquet DSv2 scan so Catalyst pushes projection + predicates into the
  * file reader (verified via `PushedFilters`/`ReadSchema` in explain).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views named by table name. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
