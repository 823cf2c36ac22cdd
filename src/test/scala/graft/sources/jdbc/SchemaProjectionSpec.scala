package graft.sources.jdbc

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** `pincolumns` catch-all schema projection on LIVE engines (reference
  * `crates/common/src/schema_projection.rs:1-70`): pinned remote columns
  * stay typed with their full pushdown surface; every other remote
  * column folds into one sorted-key JSON string column.
  */
class SchemaProjectionSpec extends AnyFunSuite with SparkFixture {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def seedDerby(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.proj")
    spark.sql("DROP TABLE IF EXISTS ext.proj.wide")
    import spark.implicits._
    Seq(
      (1L, "alice", 34, 1200.5, "red", "us"),
      (2L, "bob", 27, 40.25, null.asInstanceOf[String], "de"),
      (3L, "carol", 41, 990.0, "blue", "fr"))
      .toDF("id", "name", "age", "bal", "color", "country")
      .writeTo("ext.proj.wide").create()
  }

  private def projected(extra: (String, String)*) = {
    val base = Seq(
      "url" -> SparkFixture.derbyUrl,
      "dbtable" -> "\"proj\".\"wide\"",
      "pincolumns" -> "id,name")
    spark.read.format("graft.sources.jdbc.GraftJdbcSource")
      .options((base ++ extra).toMap).load()
  }

  test("pinned columns stay typed; the rest folds to sorted-key JSON (live Derby)") {
    seedDerby()
    val df = projected()
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "data"))
    assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("data").dataType == org.apache.spark.sql.types.StringType)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alice")
    // alphabetical keys (reference BTreeMap ordering); null preserved
    assert(rows(0).getString(2) ==
      """{"age":34,"bal":1200.5,"color":"red","country":"us"}""",
      rows(0).getString(2))
    assert(rows(1).getString(2) ==
      """{"age":27,"bal":40.25,"color":null,"country":"de"}""",
      rows(1).getString(2))
  }

  test("filter on a pinned column pushes remotely; catch-all predicates stay local") {
    seedDerby()
    val df = projected()
    import org.apache.spark.sql.functions._

    val pinned = df.filter(col("id") > 1).select("id", "data")
    val p1 = planOf(pinned)
    assert(p1.contains("\"ID\" > 1") || p1.contains("\"id\" > 1"),
      s"pinned filter not pushed:\n$p1")
    assert(pinned.count() == 2)

    // a predicate on the folded column has no remote existence: it must
    // NOT appear in the scan SQL, yet still filter correctly in Spark
    val onData = df.filter(col("data").contains("\"color\":\"red\""))
    val p2 = planOf(onData)
    assert(!p2.contains("WHERE \"data\""), s"catch-all filter leaked remotely:\n$p2")
    assert(onData.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("pruning the catch-all away scans only the pinned columns") {
    seedDerby()
    val df = projected().select("id", "name")
    val p = planOf(df)
    // the generated SQL must not fetch the folded remote columns
    assert(!p.contains("AGE") && !p.contains("BAL"),
      s"folded columns still fetched after pruning:\n$p")
    assert(df.count() == 3)
  }

  test("aggregates on pinned columns push; ones touching the catch-all stay local but exact") {
    seedDerby()
    import org.apache.spark.sql.functions._
    val df = projected()
    val pinnedAgg = df.groupBy("name").agg(count(lit(1)).as("n"))
    assert(planOf(pinnedAgg).contains("GROUP BY"),
      s"pinned aggregate should push:\n${planOf(pinnedAgg)}")
    assert(pinnedAgg.count() == 3)

    val dataAgg = df.groupBy("name").agg(max("data").as("m"))
    assert(!planOf(dataAgg).contains("GROUP BY"),
      s"catch-all aggregate must stay local:\n${planOf(dataAgg)}")
    assert(dataAgg.orderBy("name").collect()
      .map(r => (r.getString(0), r.getString(1) != null)).toSeq ==
      Seq(("alice", true), ("bob", true), ("carol", true)))
  }

  test("projected tables are read-only; a missing pin reads as a null string column") {
    seedDerby()
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((9L, "x", "{}")).toDF("id", "name", "data")
        .write.format("graft.sources.jdbc.GraftJdbcSource")
        .option("url", SparkFixture.derbyUrl)
        .option("dbtable", "\"proj\".\"wide\"")
        .option("pincolumns", "id,name")
        .mode("append").save()
    }
    assert(e.getMessage.toLowerCase.contains("does not support append") ||
      e.getMessage.toLowerCase.contains("does not allow create table") ||
      e.getMessage.toLowerCase.contains("batch_write") ||
      e.getMessage.toLowerCase.contains("unsupported"), e.getMessage)

    // a pin the remote table lacks: Utf8 fallback (reference field_for),
    // and it must actually SCAN — the generated SQL renders the ghost as
    // a typed NULL, not as a quoted column the remote would reject
    val withGhost = spark.read.format("graft.sources.jdbc.GraftJdbcSource")
      .option("url", SparkFixture.derbyUrl)
      .option("dbtable", "\"proj\".\"wide\"")
      .option("pincolumns", "id,ghost")
      .load()
    assert(withGhost.schema("ghost").dataType ==
      org.apache.spark.sql.types.StringType)
    val ghostRows = withGhost.orderBy("id").collect()
    assert(ghostRows.length == 3)
    assert(ghostRows.forall(_.isNullAt(1)), "ghost pin must read as NULL")
    // the catch-all still folds the real remote columns alongside a ghost
    assert(ghostRows(0).getLong(0) == 1L &&
      ghostRows(0).getString(2).contains("\"name\":\"alice\""),
      ghostRows(0).toString)

    import org.apache.spark.sql.functions._
    // a filter on the ghost pin must stay LOCAL (no remote unknown-column
    // error) and evaluate over the null column
    assert(withGhost.filter(col("ghost").isNull).count() == 3)
    assert(withGhost.filter(col("ghost") === "x").count() == 0)
  }

  test("federation never collapses a pincolumns-projected table") {
    // The catch-all column has no remote existence: a federation
    // collapse (here a same-source UNION ALL / self-join) would render
    // `alias."data"` into the remote SQL — unknown-column error, or a
    // silent wrong read if the remote really had a column of that name.
    // leafOf refuses projected tables, so these plans stay local.
    seedDerby()
    val df = projected()
    val u = df.unionAll(df)
    assert(u.count() == 6)
    assert(u.filter(org.apache.spark.sql.functions.col("id") === 1)
      .collect().forall(_.getString(2).contains("\"color\":\"red\"")))

    val j = df.as("a").join(df.as("b"), "id")
    assert(j.count() == 3)
  }

  test("ghost-pin NULL rendering is dialect-routed (CAST grammar differences)") {
    // MySQL's CAST takes CHAR (not its LONGTEXT DDL type); ClickHouse
    // needs Nullable(String); standard-SQL engines cast via stringType
    assert(DerbyDialect.nullColumnSql("g") == """CAST(NULL AS VARCHAR(32672)) AS "g"""")
    assert(DuckDbDialect.nullColumnSql("g") == """CAST(NULL AS TEXT) AS "g"""")
    assert(PostgresDialect.nullColumnSql("g") == """CAST(NULL AS TEXT) AS "g"""")
    assert(MySqlDialect.nullColumnSql("g") == "CAST(NULL AS CHAR) AS `g`")
    assert(ClickHouseDialect.nullColumnSql("g") == "CAST(NULL AS Nullable(String)) AS `g`")
  }

  test("option validation: duplicate pins and a pin/catch-all collision fail eagerly") {
    intercept[IllegalArgumentException] {
      JdbcOptions(Map("url" -> "jdbc:derby:memory:x", "dbtable" -> "t",
        "pincolumns" -> "a,b,a")).pinColumns
    }
    intercept[IllegalArgumentException] {
      JdbcOptions(Map("url" -> "jdbc:derby:memory:x", "dbtable" -> "t",
        "pincolumns" -> "a,data")).catchAllColumn
    }
  }

  test("catch-all round-trips on live DuckDB through the catalog, custom name") {
    assume(DuckDbWireSpec.driverPresent)
    val dir = java.nio.file.Files.createTempDirectory("graft_proj_duck").toString
    val url = s"jdbc:duckdb:$dir/p.duckdb"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE wide AS SELECT r AS id, 'n' || r AS name, " +
        "r * 2 AS twice, r % 3 AS m3, 'tag' || r AS tag FROM range(5) t(r)")
      st.close()
    } finally c.close()

    spark.conf.set("spark.sql.catalog.pduck", "graft.sources.jdbc.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pduck.url", url)
    spark.conf.set("spark.sql.catalog.pduck.pincolumns", "id,name")
    spark.conf.set("spark.sql.catalog.pduck.catchallcolumn", "extra")
    val df = spark.table("pduck.main.wide").orderBy("id")
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "extra"))
    val r0 = df.collect()(0)
    assert(r0.getLong(0) == 0L && r0.getString(1) == "n0")
    assert(r0.getString(2) == """{"m3":0,"tag":"tag0","twice":0}""", r0.getString(2))

    // read-only at the CAPABILITY level: a catalog INSERT must refuse
    val e = intercept[Exception] {
      spark.sql("INSERT INTO pduck.main.wide VALUES (9, 'x', '{}')")
    }
    assert(e.getMessage.toLowerCase.contains("does not support append") ||
      e.getMessage.toLowerCase.contains("batch_write"), e.getMessage)
  }
}
