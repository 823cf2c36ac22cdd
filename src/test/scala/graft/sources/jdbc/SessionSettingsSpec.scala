package graft.sources.jdbc

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** [[SessionSettings]] — the reference's DuckDB settings-registry analog
  * (`crates/duckdb/src/settings.rs`): driver-side validation, SQL
  * rendering, custom registration, and a LIVE Derby round trip proving
  * the statements run on every physical connection the pool opens and
  * that differing settings never share a connection.
  */
class SessionSettingsSpec extends AnyFunSuite with SparkFixture {

  test("rendering: byte sizes quote, booleans raw, sessioninit splits") {
    val st = SessionSettings.statements(Map(
      "memory_limit" -> "2GB",
      "preserve_insertion_order" -> "false",
      "temp_directory" -> "/tmp/x",
      "sessioninit" -> "SET SCHEMA APP; VALUES 1"))
    assert(st == Seq(
      "SET memory_limit = '2GB'",
      "SET temp_directory = '/tmp/x'",
      "SET preserve_insertion_order = false",
      "SET SCHEMA APP",
      "VALUES 1"))
  }

  test("validation fails driver-side at option-parse time") {
    intercept[IllegalArgumentException](
      SessionSettings.statements(Map("memory_limit" -> "lots")))
    intercept[IllegalArgumentException](
      SessionSettings.statements(Map("preserve_insertion_order" -> "maybe")))
    // through JdbcOptions: eager — no connection is ever attempted
    intercept[IllegalArgumentException](JdbcOptions(Map(
      "url" -> "jdbc:derby:memory:never", "dbtable" -> "\"x\".\"y\"",
      "memory_limit" -> "a few")))
  }

  test("custom settings register like the reference trait") {
    object QueryTag extends SessionSettings.StringSetting("graft_query_tag")
    SessionSettings.register(QueryTag)
    val st = SessionSettings.statements(Map("graft_query_tag" -> "etl-1"))
    assert(st == Seq("SET graft_query_tag = 'etl-1'"))
  }

  test("live Derby: sessioninit applies per physical connection (SET SCHEMA)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.ss")
    spark.sql("DROP TABLE IF EXISTS ext.ss.t")
    spark.sql("CREATE TABLE ext.ss.t (k BIGINT, v STRING)")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo("ext.ss.t").append()

    // unqualified dbtable resolves ONLY if the session schema applied
    val df = spark.read.format("graft.sources.jdbc.GraftJdbcSource")
      .option("url", SparkFixture.derbyUrl)
      .option("dbtable", "\"t\"")
      .option("sessioninit", "SET SCHEMA \"ss\"")
      .load()
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // differing settings do NOT share pooled connections: the same
    // unqualified name under another schema reads that schema's table
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.ss2")
    spark.sql("DROP TABLE IF EXISTS ext.ss2.t")
    spark.sql("CREATE TABLE ext.ss2.t (k BIGINT, v STRING)")
    Seq((9L, "z")).toDF("k", "v").writeTo("ext.ss2.t").append()
    val df2 = spark.read.format("graft.sources.jdbc.GraftJdbcSource")
      .option("url", SparkFixture.derbyUrl)
      .option("dbtable", "\"t\"")
      .option("sessioninit", "SET SCHEMA \"ss2\"")
      .load()
    assert(df2.collect().map(_.getLong(0)).toSeq == Seq(9L))
    // and the first identity still reads its own schema afterwards
    assert(df.count() == 2)
  }
}
