package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live end-to-end tests through the embedded-Derby `ext` catalog:
  * DDL, append, pushdown scan, TopN, delete, upsert — with plan-level
  * assertions that the generated remote SQL actually carries the pushed
  * clauses (the reference asserts generated SQL the same way,
  * `crates/common/src/sql/sql_provider_datafusion/mod.rs:788-808`).
  */
class JdbcRoundTripSpec extends AnyFunSuite with SparkFixture {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("create, append, scan with filter+projection pushdown") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t1")
    spark.sql("CREATE TABLE ext.rt.t1 (k BIGINT, name STRING, grp INT)")
    import spark.implicits._
    (1L to 20L).map(i => (i, s"name_$i", (i % 4).toInt)).toDF("k", "name", "grp")
      .writeTo("ext.rt.t1").append()

    val df = spark.table("ext.rt.t1").filter($"grp" === 2).select("k", "name")
    val plan = planOf(df)
    assert(plan.contains("GraftJdbcScan"))
    assert(plan.contains("WHERE"), s"filter not pushed:\n$plan")
    assert(plan.contains("\"grp\" = 2"), s"filter not pushed:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 6L, 10L, 14L, 18L))
  }

  test("EXTRACT pushdown: year()/month() predicates run remotely on Derby") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.tex")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, year, month}
    Seq(
      (1L, java.sql.Timestamp.valueOf("1995-03-15 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("1995-07-01 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("1996-03-02 23:59:59")))
      .toDF("k", "ts").writeTo("ext.rt.tex").create()

    val df = spark.table("ext.rt.tex")
      .filter(year(col("ts")) === 1995 && month(col("ts")) === 3).select("k")
    val plan = planOf(df)
    // Catalyst emits Extract over a CAST-to-DATE source; both render.
    assert(plan.contains("YEAR(") && plan.contains("= 1995"), s"year() not pushed:\n$plan")
    assert(plan.contains("MONTH(") && plan.contains("= 3"), s"month() not pushed:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))

    // engine-specific numbering (dayofweek) must NOT reach the remote SQL
    import org.apache.spark.sql.functions.dayofweek
    val dw = spark.table("ext.rt.tex").filter(dayofweek(col("ts")) === 4)
    assert(!planOf(dw).contains("DAY_OF_WEEK"), planOf(dw))
    assert(dw.collect().map(_.getLong(0)).toSeq == Seq(1L)) // 1995-03-15 is a Wednesday
  }

  test("OFFSET pushdown: sorted offset (and offset+limit) run remotely, rows exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.toff")
    import spark.implicits._
    (1L to 50L).map(i => (i, 100L - i)).toDF("k", "v").writeTo("ext.rt.toff").create()

    // offset + limit below a pushed TopN: skip 2, take 3 of the
    // v-descending order, entirely remote (OFFSET 2 + FETCH FIRST 3)
    val both = spark.table("ext.rt.toff").orderBy($"v".desc, $"k").offset(2).limit(3)
    val bothPlan = planOf(both)
    assert(bothPlan.contains("OFFSET 2 ROWS") &&
      bothPlan.contains("FETCH FIRST 3 ROWS ONLY"),
      s"offset+limit not pushed:\n$bothPlan")
    assert(both.collect().map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L),
      s"offset+limit rows wrong:\n$bothPlan")

    // a sort WITHOUT limit is never pushed (no TopN), so a pure offset
    // stays local — and stays correct
    val off = spark.table("ext.rt.toff").orderBy($"v", $"k").offset(47)
    assert(!planOf(off).contains("OFFSET"), planOf(off))
    assert(off.collect().map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))

    // unsorted offset must stay in Spark (plan keeps no remote OFFSET)
    val unsorted = spark.table("ext.rt.toff").offset(10)
    assert(!planOf(unsorted).contains("OFFSET"), planOf(unsorted))
    assert(unsorted.count() == 40)

    // range-partitioned scans must never push offset (per-partition skip)
    val parts = spark.read.format("graft.sources.jdbc.GraftJdbcSource")
      .option("url", SparkFixture.derbyUrl).option("dbtable", "\"rt\".\"toff\"")
      .option("partitioncolumn", "k").option("lowerbound", "1")
      .option("upperbound", "51").option("numpartitions", "4")
      .load().orderBy("k").offset(5)
    assert(!planOf(parts).contains("OFFSET"), planOf(parts))
    assert(parts.count() == 45)
  }

  test("TopN pushdown renders ORDER BY + FETCH FIRST, result exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t2")
    import spark.implicits._
    (1L to 50L).map(i => (i, (i * 7 % 13))).toDF("k", "v")
      .writeTo("ext.rt.t2").create()
    val df = spark.table("ext.rt.t2").orderBy($"v".desc, $"k").limit(3)
    val plan = planOf(df)
    assert(plan.contains("ORDER BY"), s"sort not pushed:\n$plan")
    assert(plan.contains("FETCH FIRST 3 ROWS ONLY"), s"limit not pushed:\n$plan")
    // single JDBC cursor => the remote TopN is exact and Spark drops
    // its local TakeOrderedAndProject (Spark JDBC v2's own contract)
    assert(!plan.contains("TakeOrderedAndProject"), s"TopN should be complete:\n$plan")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (1L to 50L).map(i => (i, i * 7 % 13)).sortBy(t => (-t._2, t._1)).take(3))
  }

  test("unique index DDL: ':unique' spec creates a UNIQUE index that enforces") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t9")
    spark.sql("CREATE TABLE ext.rt.t9 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('indexes'='v:unique;k')")
    // metadata: ix 0 unique, ix 1 plain
    val o = JdbcOptions(Map("url" -> graft.SparkFixture.derbyUrl))
    val c = o.connect()
    val uniq = try {
      val rs = c.getMetaData.getIndexInfo(null, "rt", "t9", false, false)
      val m = scala.collection.mutable.Map.empty[String, Boolean]
      while (rs.next())
        Option(rs.getString("INDEX_NAME")).foreach(n => m(n) = !rs.getBoolean("NON_UNIQUE"))
      rs.close()
      m
    } finally c.close()
    assert(uniq.getOrElse("ix_t9_0", false), s"ix_t9_0 not unique: $uniq")
    assert(uniq.contains("ix_t9_1") && !uniq("ix_t9_1"), s"ix_t9_1 wrong: $uniq")
    // and it enforces: duplicate v rejected
    import spark.implicits._
    Seq((1L, 10L)).toDF("k", "v").writeTo("ext.rt.t9").append()
    val e = intercept[Exception] {
      Seq((2L, 10L)).toDF("k", "v").writeTo("ext.rt.t9").append()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("duplicate") || m.contains("IX_T9_0") ||
      m.contains("ix_t9_0")), msgs(e).mkString(" | "))
  }

  test("deleteWhere pushes the predicate to remote DELETE") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t3")
    import spark.implicits._
    (1L to 10L).map(i => (i, i % 2 == 0)).toDF("k", "even")
      .writeTo("ext.rt.t3").create()
    spark.sql("DELETE FROM ext.rt.t3 WHERE even = true")
    assert(spark.table("ext.rt.t3").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("upsert updates existing keys and inserts new ones") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t4")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .writeTo("ext.rt.t4").create()
    Seq((2L, "B"), (4L, "D")).toDF("k", "v")
      .writeTo("ext.rt.t4").option("upsertkeys", "k").append()
    assert(spark.table("ext.rt.t4").collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
  }

  test("truncate-overwrite replaces all rows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t5")
    import spark.implicits._
    (1L to 9L).map(i => Tuple1(i)).toDF("k").writeTo("ext.rt.t5").create()
    Seq(Tuple1(100L)).toDF("k").writeTo("ext.rt.t5").overwrite(lit(true))
    assert(spark.table("ext.rt.t5").collect().toSeq == Seq(Row(100L)))
  }

  test("aggregate pushdown: GROUP BY runs remotely, no local hash aggregate of rows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t7")
    import spark.implicits._
    (1L to 40L).map(i => (i, (i % 5).toInt, i * 2)).toDF("k", "g", "v")
      .writeTo("ext.rt.t7").create()
    val df = spark.table("ext.rt.t7").groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"), max($"v").as("mx"))
    val plan = planOf(df)
    assert(plan.contains("GROUP BY"), s"aggregate not pushed:\n$plan")
    assert(plan.contains("COUNT(1)") || plan.contains("COUNT(*)"), s"count not pushed:\n$plan")
    assert(plan.contains("SUM("), s"sum not pushed:\n$plan")
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val exp = (1L to 40L).map(i => ((i % 5).toInt, i * 2)).groupBy(_._1)
      .map { case (g, xs) => (g, xs.size.toLong, xs.map(_._2).sum, xs.map(_._2).max) }
      .toSeq.sortBy(_._1)
    assert(got == exp)
  }

  test("expression aggregate pushdown: GROUP BY year(ts) / SUM(a*b) run remotely") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.tga")
    import spark.implicits._
    import org.apache.spark.sql.functions.year
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("1995-03-15 10:00:00"), 10L),
      (2L, java.sql.Timestamp.valueOf("1995-07-01 00:00:00"), 20L),
      (3L, java.sql.Timestamp.valueOf("1996-03-02 23:59:59"), 40L),
      (4L, java.sql.Timestamp.valueOf("1996-11-20 08:30:00"), 80L))
    rows.toDF("k", "ts", "v").writeTo("ext.rt.tga").create()

    // group key is an EXPRESSION: the remote statement carries
    // GROUP BY YEAR(...) and the result types come from Derby itself
    val byYear = spark.table("ext.rt.tga")
      .groupBy(year($"ts").as("y")).agg(sum($"v").as("sv"))
    val p1 = planOf(byYear)
    assert(p1.contains("YEAR(") && p1.contains("GROUP BY"), s"year-key not pushed:\n$p1")
    assert(byYear.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
      == Seq((1995, 30L), (1996, 120L)))

    // aggregate ARGUMENT is an expression: SUM(v * k) global aggregate
    val prod = spark.table("ext.rt.tga").agg(sum($"v" * $"k").as("s"))
    val p2 = planOf(prod)
    assert(p2.contains("SUM(") && (p2.contains("* ") || p2.contains("*\"")),
      s"product-sum not pushed:\n$p2")
    assert(prod.head().getLong(0) == rows.map(r => r._3 * r._1).sum)
  }

  test("CREATE TABLE with primary key and index DDL (W9/W10)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t8")
    spark.sql("CREATE TABLE ext.rt.t8 (k BIGINT NOT NULL, v STRING, grp INT) " +
      "TBLPROPERTIES ('primarykeys'='k', 'indexes'='grp;v,grp')")
    // verify through Derby metadata: PK + two indexes exist
    val conn = java.sql.DriverManager.getConnection(SparkFixture.derbyUrl)
    try {
      val md = conn.getMetaData
      val pks = {
        val rs = md.getPrimaryKeys(null, "rt", "t8")
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) b += rs.getString("COLUMN_NAME")
        rs.close(); b.toSeq
      }
      assert(pks == Seq("k"))
      val idx = {
        val rs = md.getIndexInfo(null, "rt", "t8", false, false)
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) Option(rs.getString("INDEX_NAME")).foreach(b += _)
        rs.close(); b.distinct
      }
      assert(idx.exists(_.startsWith("ix_t8_")), idx.mkString(","))
    } finally conn.close()
    // writes respect the PK: duplicate key insert fails the task
    import spark.implicits._
    Seq((1L, "a", 1)).toDF("k", "v", "grp").writeTo("ext.rt.t8").append()
    intercept[Exception] {
      Seq((1L, "dup", 2)).toDF("k", "v", "grp").writeTo("ext.rt.t8").append()
    }
  }

  test("remotestats=count reports row counts and lets small remote tables broadcast") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t9")
    spark.sql("CREATE TABLE ext.rt.t9 (k BIGINT, dim STRING)")
    (1L to 20L).map(i => (i, s"d$i")).toDF("k", "dim").writeTo("ext.rt.t9").append()

    // unit level: the scan reports the remote count (with pushed filters)
    val opts = JdbcOptions(Map("url" -> SparkFixture.derbyUrl,
      "dbtable" -> "\"rt\".\"t9\"", "remotestats" -> "count"))
    val schema = spark.table("ext.rt.t9").schema
    val s1 = JdbcScan(opts, schema, where = Nil, orderBy = Nil, limit = None)
      .estimateStatistics()
    assert(s1.numRows().getAsLong == 20, s1)
    assert(s1.sizeInBytes().getAsLong > 0)
    val s2 = JdbcScan(opts, schema, where = Seq("(\"k\" <= 5)"),
      orderBy = Nil, limit = None).estimateStatistics()
    assert(s2.numRows().getAsLong == 5, s2)
    // disabled → unknown, Spark plans conservatively
    val s0 = JdbcScan(opts.copy(map = opts.map - "remotestats"), schema,
      where = Nil, orderBy = Nil, limit = None).estimateStatistics()
    assert(!s0.numRows().isPresent && !s0.sizeInBytes().isPresent)

    // plan level: a big local fact joined to the small remote dim — with
    // stats the remote side broadcasts; without, Spark must assume huge
    // and fall back to a shuffle join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
      val fact = spark.range(0, 200000).select(col("id").as("k"))
      def remote(extra: Map[String, String]) = {
        val r = spark.read.format("graft.sources.jdbc.GraftJdbcSource")
          .option("url", SparkFixture.derbyUrl).option("dbtable", "\"rt\".\"t9\"")
        extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
      }
      val withStats = fact.join(remote(Map("remotestats" -> "count")), "k")
      assert(withStats.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        s"statted remote dim should broadcast:\n${withStats.queryExecution.executedPlan}")
      val noStats = fact.join(remote(Map.empty), "k")
      assert(!noStats.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        s"unknown-size remote side must not broadcast:\n${noStats.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime filters splice into the remote WHERE before partition planning") {
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.graftx.TestExprs
    val opts = JdbcOptions(Map("url" -> SparkFixture.derbyUrl, "dbtable" -> "\"rt\".\"t1\""))
    val scan = JdbcScan(opts, spark.table("ext.rt.t1").schema,
      where = Seq("(\"grp\" = 2)"), orderBy = Nil, limit = None)
    assert(scan.filterAttributes().map(_.fieldNames.head).toSeq.contains("k"))
    scan.filter(Array(new Predicate("IN", Array(
      TestExprs.field("k"),
      TestExprs.lit(2L, org.apache.spark.sql.types.LongType),
      TestExprs.lit(6L, org.apache.spark.sql.types.LongType)))))
    assert(scan.sql.contains("(\"grp\" = 2) AND (\"k\" IN (2, 6))"), scan.sql)
    // and the spliced statement actually executes remotely
    val rows = scan.planInputPartitions()
    assert(rows.length == 1)
  }

  test("runtime filters never compose with a pushed fetch (limit/offset)") {
    // SQL applies WHERE before ORDER BY/FETCH: a runtime predicate spliced
    // under a pushed LIMIT would return top-n OF THE FILTERED rows instead
    // of the filtered top-n, and with complete TopN pushdown no local
    // operator remains to repair it (r6 high advice).
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.graftx.TestExprs
    val opts = JdbcOptions(Map("url" -> SparkFixture.derbyUrl, "dbtable" -> "\"rt\".\"t1\""))
    for (off <- Seq(None, Some(2))) {
      val scan = JdbcScan(opts, spark.table("ext.rt.t1").schema,
        where = Nil, orderBy = Seq("\"k\" DESC"), limit = Some(5),
        pushedOffset = off)
      assert(scan.filterAttributes().isEmpty,
        s"fetch-pushed scan must not advertise runtime-filterable attrs (offset=$off)")
      val before = scan.sql
      scan.filter(Array(new Predicate("IN", Array(
        TestExprs.field("k"),
        TestExprs.lit(2L, org.apache.spark.sql.types.LongType)))))
      assert(scan.sql == before,
        s"runtime predicate spliced under a pushed fetch (offset=$off): ${scan.sql}")
    }
  }

  test("catalog lists namespaces and tables, introspects schema") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.rt")
    spark.sql("DROP TABLE IF EXISTS ext.rt.t6")
    spark.sql("CREATE TABLE ext.rt.t6 (k BIGINT, s STRING)")
    val tables = spark.sql("SHOW TABLES IN ext.rt").collect().map(_.getString(1))
    assert(tables.contains("t6"))
    val schema = spark.table("ext.rt.t6").schema
    assert(schema.fieldNames.toSeq == Seq("k", "s"))
  }
}
