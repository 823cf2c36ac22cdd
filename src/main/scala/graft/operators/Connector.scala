package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-gate coverage for the JDBC connector layer — the capability
  * this engine exists to provide (reference: the nine `TableProvider`
  * implementations, `core/src/lib.rs:74-90`).
  *
  * Strategy = the reference's own round-trip integration pattern
  * (`core/tests/duckdb/mod.rs:18-90`): copy a parquet table into the
  * live embedded backend (Derby) through the `gate` catalog, mutate it
  * through the DSv2 write/DML paths, read it back through
  * [[graft.sources.jdbc.GraftJdbcTable]] with pushdown — and the DuckDB
  * oracle is simply the equivalent query over the original parquet, so
  * a value-exact hash match proves the whole write+read pipeline is an
  * identity (or the declared mutation).
  *
  * Covered components (SURVEY §2): S1/S2 scan + SQL leaf, S7
  * range-partitioned scan, S10/W9/W14 catalog + DDL, P1/P2/P4 pushdown,
  * A2/A3 TopN/limit, W1/W2/W11 transactional batched insert, W4
  * truncate-overwrite, W6 upsert (Derby update-else-insert path), W7
  * DELETE FROM WHERE.
  *
  * Scale: Derby embedded stands in for any remote JDBC store; writes go
  * through N concurrent partition writers (the parallelism the
  * reference's single-transaction sinks lack) and reads stream through
  * `fetchSize` cursors, optionally range-split across executors (q56).
  */
object Connector {
  private val D = DecimalType(18, 2)

  /** Register the per-sf-dir embedded Derby database as catalog `gate`.
    * The database lives in memory (`jdbc:derby:memory:`): the gate
    * queries drop + CTAS their tables on every run, so durability buys
    * nothing and disk sync would only time Derby's fsync, not this
    * engine's write path. It persists for the JVM lifetime, which spans
    * all queries of a Verify/Bench run.
    */
  private def gate(s: SparkSession, dir: String): Unit = {
    val dbName = "graft_gate_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    s.conf.set("spark.sql.catalog.gate", "graft.sources.jdbc.GraftCatalog")
    s.conf.set("spark.sql.catalog.gate.url", s"jdbc:derby:memory:$dbName;create=true")
    s.sql("CREATE NAMESPACE IF NOT EXISTS gate.app")
  }

  /** Drop + CTAS-copy a parquet table into Derby; returns the qualified
    * name. Idempotent per run (the driver may execute a query twice).
    */
  private def freshCopy(s: SparkSession, dir: String, table: String, dst: String): String = {
    gate(s, dir)
    val full = s"gate.app.$dst"
    s.sql(s"DROP TABLE IF EXISTS $full")
    Tables.load(s, dir, table).writeTo(full).create()
    full
  }

  /** Register a FILE-backed DuckDB database as catalog `dgate` — the
    * second live wire-level engine (the reference's flagship connector,
    * `crates/duckdb/src/lib.rs`). The JDBC driver is discovered from the
    * machine-local artifact cache at build time; the file lives in
    * java.io.tmpdir per sf-dir and every gate query drop+CTASes its own
    * tables, so runs are idempotent.
    */
  private def duckGate(s: SparkSession, dir: String): String = {
    val f = s"${sys.props("java.io.tmpdir")}/graft_duck_gate_" +
      dir.replaceAll("[^A-Za-z0-9.]", "_") + ".duckdb"
    s.conf.set("spark.sql.catalog.dgate", "graft.sources.jdbc.GraftCatalog")
    s.conf.set("spark.sql.catalog.dgate.url", s"jdbc:duckdb:$f")
    // in-process engine: bigger insert batches cost no wire latency
    s.conf.set("spark.sql.catalog.dgate.batchsize", "10000")
    s.sql("CREATE NAMESPACE IF NOT EXISTS dgate.app")
    f
  }

  /** Idempotent READ-ONLY copy into the DuckDB gate: CTAS only when the
    * table is missing or stale (row-count probe — one in-process
    * COUNT(*) plus a parquet-metadata count), so bench reps time the
    * OPERATOR under test, not a repeated bulk copy (the q26/q103
    * persisted-aggregate precedent). Mutating gates (q125) keep their
    * own drop+CTAS.
    */
  private def ensureDuckCopy(s: SparkSession, dir: String, src: String,
      dst: String, cols: Seq[String]): String = {
    duckGate(s, dir)
    // the source parquet's mtime is part of the table NAME: regenerated
    // testdata (same row count, different values — it has happened to
    // events.ts twice) gets a fresh copy instead of a stale hash
    // mismatch that looks like an operator bug. Older generations of
    // the same dst are dropped.
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/$src.parquet")).toMillis
    val full = s"dgate.app.${dst}_${java.lang.Long.toHexString(mtime)}"
    val want = Tables.load(s, dir, src).select(cols.map(col): _*)
    val fresh =
      try s.table(full).count() == want.count()
      catch { case _: Exception => false }
    if (!fresh) {
      // sweep superseded generations AND the legacy un-suffixed copy
      // (from the pre-mtime scheme) — either would otherwise sit in the
      // persistent gate file forever, inflating every q125 swap's
      // other-tables copy
      s.sql(s"SHOW TABLES IN dgate.app").collect()
        .map(_.getString(1)).filter(t => (t == dst || t.startsWith(dst + "_")) &&
          t != s"${dst}_${java.lang.Long.toHexString(mtime)}")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS dgate.app.`$t`"))
      s.sql(s"DROP TABLE IF EXISTS $full")
      want.writeTo(full).create()
    }
    full
  }

  def queries: Seq[Q] = Seq(

    // DuckDB wire round-trip (S1/P1/P2 on the SECOND live engine): CTAS
    // into a file-backed DuckDB over JDBC, read back with filter +
    // projection pushdown; the oracle is the same query over the source
    // parquet, so a hash match proves the whole wire pipeline.
    Q("q124_duckdb_roundtrip",
      "SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_nationkey IN (3, 7) AND c_acctbal > 100 ORDER BY c_custkey") { (s, dir) =>
      val t = ensureDuckCopy(s, dir, "customer", "t124",
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
      s.table(t).filter(col("c_nationkey").isin(3, 7) && col("c_acctbal") > 100)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // W5 file-swap overwrite-by-filter: the refresh stages into a FRESH
    // database file, non-matching live rows ride over, and the file is
    // atomically renamed over the live path (reference file_swap.rs).
    // Same declared mutation as q66 but through the swap machinery — a
    // hash match proves the two overwrite strategies agree exactly.
    Q("q125_duckdb_fileswap",
      "SELECT s_suppkey, 'X_' || s_name AS s_name, s_nationkey, s_acctbal " +
        "FROM supplier WHERE s_nationkey < 5 " +
        "UNION ALL SELECT s_suppkey, s_name, s_nationkey, s_acctbal " +
        "FROM supplier WHERE s_nationkey >= 10 ORDER BY s_suppkey") { (s, dir) =>
      duckGate(s, dir)
      val t = "dgate.app.t125"
      s.sql(s"DROP TABLE IF EXISTS $t")
      Tables.load(s, dir, "supplier").writeTo(t).create()
      Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") < 5)
        .select(col("s_suppkey"), concat(lit("X_"), col("s_name")).as("s_name"),
          col("s_nationkey"), col("s_acctbal"))
        .writeTo(t).option("overwritemode", "fileswap")
        .overwrite(col("s_nationkey") < 10)
      s.table(t).orderBy("s_suppkey")
    },

    // WINDOW pushdown (federation rule, Window arm): top-3 customers by
    // balance per nation — ROW_NUMBER runs INSIDE DuckDB over the wire,
    // the rank filter pushes as a WHERE around the collapsed subquery,
    // and only 3 rows per nation ever reach Spark. At 100 TB this is a
    // remote TopK-per-group instead of a full-table shuffle-sort.
    Q("q127_duckdb_window_pushdown",
      "SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (" +
        "SELECT c_nationkey, c_custkey, c_acctbal, ROW_NUMBER() OVER (" +
        "PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn " +
        "FROM customer) WHERE rn <= 3 ORDER BY c_nationkey, rn") { (s, dir) =>
      // shares q124's 4-column copy; projection pushdown prunes c_name
      val t = ensureDuckCopy(s, dir, "customer", "t124",
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      s.table(t)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
        .orderBy("c_nationkey", "rn")
    },

    // Cross-SOURCE plan: the dimension join (nation ⋈ region) collapses
    // into ONE remote DuckDB statement, `remotestats=count` tells the
    // Spark planner the result is tiny, and the pre-joined dims
    // BROADCAST into the local parquet fact scan — no shuffle of the
    // fact side anywhere. At 100 TB this is the whole point of
    // federation: the remote engine pre-joins k rows, the cluster
    // streams the fact table once.
    Q("q129_cross_source_broadcast",
      "SELECT r_name, COUNT(*) AS n, " +
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name ORDER BY r_name") { (s, dir) =>
      // idempotent staleness-probed copies (q124/q127 precedent) — the
      // old per-rep drop+CTAS was 65% of this gate's measured cost
      val tn = ensureDuckCopy(s, dir, "nation", "t129n", Seq("n_nationkey", "n_regionkey"))
      val tr = ensureDuckCopy(s, dir, "region", "t129r", Seq("r_regionkey", "r_name"))
      val f = duckGate(s, dir)
      // read the SAME file back through a remotestats=count catalog so
      // the planner learns the dims are tiny and broadcasts them
      s.conf.set("spark.sql.catalog.dstat", "graft.sources.jdbc.GraftCatalog")
      s.conf.set("spark.sql.catalog.dstat.url", s"jdbc:duckdb:$f")
      s.conf.set("spark.sql.catalog.dstat.remotestats", "count")
      val dims = s.table(tn.replaceFirst("^dgate\\.", "dstat."))
        .join(s.table(tr.replaceFirst("^dgate\\.", "dstat.")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "r_name")
      Tables.load(s, dir, "customer")
        .join(dims, col("c_nationkey") === col("n_nationkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(D)).cast("double").as("total_bal"))
        .orderBy("r_name")
    },

    // FROM-expression table on the wire (S3, the reference's DuckDB
    // `read_csv(...)`-as-table pattern, `crates/duckdb/src/sql_table.rs:
    // 30-60`): the remote DuckDB reads the PARQUET FILE directly via
    // its read_parquet table function — zero copy, no CTAS — and the
    // whole filtered GROUP BY executes inside DuckDB (filter + agg
    // pushdown over a function scan). At scale this is federation to an
    // engine that owns the data files; Spark ships back k rows.
    Q("q130_duckdb_read_parquet",
      "SELECT l_returnflag, COUNT(*) AS n, MIN(l_orderkey) AS min_ok, " +
        "MAX(l_orderkey) AS max_ok FROM lineitem WHERE l_quantity > 25 " +
        "GROUP BY l_returnflag ORDER BY l_returnflag") { (s, dir) =>
      s.read.format("graft.sources.jdbc.GraftJdbcSource")
        .option("url", "jdbc:duckdb:")
        .option("dbtable", s"read_parquet('$dir/lineitem.parquet')")
        .load()
        .filter(col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), min("l_orderkey").as("min_ok"),
          max("l_orderkey").as("max_ok"))
        .orderBy("l_returnflag")
    },

    // Multi-file ATTACH federation on the wire (reference
    // `crates/duckdb/src/conn.rs:102-230`): nation lives in one DuckDB
    // FILE, region in a sibling file; one connection attaches both and
    // the join collapses into ONE remote statement across files.
    Q("q126_duckdb_attach_federation",
      "SELECT n_nationkey, n_name, r_name FROM nation JOIN region " +
        "ON n_regionkey = r_regionkey WHERE r_regionkey <> 3 " +
        "ORDER BY n_nationkey") { (s, dir) =>
      val mainFile = duckGate(s, dir)
      s.sql("DROP TABLE IF EXISTS dgate.app.t126n")
      Tables.load(s, dir, "nation").writeTo("dgate.app.t126n").create()
      val sibFile = s"${sys.props("java.io.tmpdir")}/graft_duck_sib_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_") + ".duckdb"
      s.conf.set("spark.sql.catalog.dsib", "graft.sources.jdbc.GraftCatalog")
      s.conf.set("spark.sql.catalog.dsib.url", s"jdbc:duckdb:$sibFile")
      s.sql("CREATE NAMESPACE IF NOT EXISTS dsib.app")
      s.sql("DROP TABLE IF EXISTS dsib.app.t126r")
      Tables.load(s, dir, "region").writeTo("dsib.app.t126r").create()
      def attached(table: String) = s.read
        .format("graft.sources.jdbc.GraftJdbcSource")
        .option("url", s"jdbc:duckdb:$mainFile")
        .option("attach", s"sib=$sibFile")
        .option("dbtable", table)
        .load()
      attached("\"app\".\"t126n\"")
        .join(attached("\"sib\".\"app\".\"t126r\""),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_regionkey") =!= 3)
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    },

    // SET-OP federation collapse (reference federation.rs:62-110 ships
    // any same-source subplan the unparser expresses): Catalyst rewrites
    // INTERSECT → Distinct(semi-join on null-safe equality) and EXCEPT →
    // Distinct(anti-join); the federation rule collapses the joins as
    // (NOT) EXISTS with IS NOT DISTINCT FROM conditions and wraps the
    // distinct as SELECT DISTINCT — the whole chained
    // (a INTERSECT b) EXCEPT c executes as ONE remote DuckDB statement.
    // At 100 TB: set-ops between remote tables never ship either input.
    Q("q132_duckdb_setop_pushdown",
      "SELECT c_nationkey FROM customer WHERE c_acctbal > 100 " +
        "INTERSECT SELECT c_nationkey FROM customer WHERE c_acctbal < 500 " +
        "EXCEPT SELECT c_nationkey FROM customer WHERE c_custkey < 50 " +
        "ORDER BY c_nationkey") { (s, dir) =>
      val t = ensureDuckCopy(s, dir, "customer", "t124",
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
      val a = s.table(t).filter(col("c_acctbal") > 100).select("c_nationkey")
      val b = s.table(t).filter(col("c_acctbal") < 500).select("c_nationkey")
      val c = s.table(t).filter(col("c_custkey") < 50).select("c_nationkey")
      a.intersect(b).except(c).orderBy("c_nationkey")
    },

    // Bag-semantics set-op federation (round-10): INTERSECT ALL /
    // EXCEPT ALL rewrite to local ReplicateRows counting plans inside
    // Catalyst, so SetOpAllRule intercepts them pre-rewrite and the
    // whole chained (a INTERSECT ALL b) EXCEPT ALL c runs as ONE live
    // DuckDB statement — duplicate counts survive end to end. The
    // oracle runs the identical ALL forms in DuckDB over the parquet.
    Q("q134_duckdb_setop_all_pushdown",
      "SELECT x FROM ((SELECT c_nationkey AS x FROM customer WHERE c_acctbal > 100 " +
        "INTERSECT ALL SELECT c_nationkey AS x FROM customer WHERE c_acctbal < 500) " +
        "EXCEPT ALL SELECT c_nationkey AS x FROM customer WHERE c_custkey < 50) t " +
        "ORDER BY x") { (s, dir) =>
      val t = ensureDuckCopy(s, dir, "customer", "t124",
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
      val a = s.table(t).filter(col("c_acctbal") > 100)
        .select(col("c_nationkey").as("x"))
      val b = s.table(t).filter(col("c_acctbal") < 500)
        .select(col("c_nationkey").as("x"))
      val c = s.table(t).filter(col("c_custkey") < 50)
        .select(col("c_nationkey").as("x"))
      a.intersectAll(b).exceptAll(c).orderBy("x")
    },

    // Ghost-pin semantics on the wire (round-10): a pin the remote
    // table LACKS reads as a typed NULL (the reference's
    // null-for-missing-field, schema_projection.rs `field_for`), while
    // real pins keep their values and the catch-all still folds the
    // rest — all value-exact vs the raw parquet oracle. The read also
    // runs with preflight=true, so the ns_lookup-analog validation path
    // is exercised inside the oracled gate suite, not just in specs.
    Q("q135_jdbc_ghost_pin",
      "SELECT c_custkey, CAST(NULL AS VARCHAR) AS ghost, c_name FROM customer " +
        "WHERE c_custkey <= 100 ORDER BY c_custkey") { (s, dir) =>
      val t = ensureDuckCopy(s, dir, "customer", "t124",
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
      val f = duckGate(s, dir)
      val bare = t.stripPrefix("dgate.app.")
      s.read.format("graft.sources.jdbc.GraftJdbcSource")
        .option("url", s"jdbc:duckdb:$f")
        .option("dbtable", s""""app"."$bare"""")
        .option("pincolumns", "c_custkey,ghost")
        .option("preflight", "true")
        .load()
        .filter(col("c_custkey") <= 100)
        .withColumn("c_name", expr("graft_json_get(data, 'c_name')"))
        .select("c_custkey", "ghost", "c_name")
        .orderBy("c_custkey")
    },

    // pincolumns catch-all projection on the wire (reference
    // schema_projection.rs:1-70): the 4-column remote table reads as
    // (c_custkey, c_name, data) where data is a sorted-key JSON object
    // of the unpinned columns; extracting c_acctbal back out of the
    // JSON and hash-matching the raw parquet oracle proves the fold is
    // value-exact, not just shaped right. The pinned filter still
    // pushes remotely.
    Q("q133_jdbc_catchall_projection",
      "SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_custkey <= 200 ORDER BY c_custkey") { (s, dir) =>
      val t = ensureDuckCopy(s, dir, "customer", "t124",
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
      // idempotent: returns the SAME gate-file path ensureDuckCopy used
      // (re-deriving it inline would silently split if the scheme moved)
      val f = duckGate(s, dir)
      val bare = t.stripPrefix("dgate.app.")
      s.read.format("graft.sources.jdbc.GraftJdbcSource")
        .option("url", s"jdbc:duckdb:$f")
        .option("dbtable", s""""app"."$bare"""")
        .option("pincolumns", "c_custkey,c_name")
        .load()
        .filter(col("c_custkey") <= 200)
        // graft_json_get: the blessed one-liner for catch-all
        // extract-back (bare key, no JSONPath) — gate-covered here
        .withColumn("c_acctbal",
          expr("graft_json_get(data, 'c_acctbal')").cast("double"))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // Scan with projection + IN-filter pushdown: WHERE reaches Derby SQL.
    Q("q50_jdbc_roundtrip_scan",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation " +
        "WHERE n_regionkey IN (1, 2) ORDER BY n_nationkey") { (s, dir) =>
      val t = freshCopy(s, dir, "nation", "t50")
      s.table(t).filter(col("n_regionkey").isin(1, 2))
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    },

    // TopN pushdown: ORDER BY ... FETCH FIRST reaches Derby; Spark keeps
    // the local TakeOrderedAndProject above (the Inexact contract, A2).
    Q("q51_jdbc_topn",
      "SELECT s_suppkey, s_name, s_acctbal FROM supplier " +
        "ORDER BY s_acctbal DESC, s_suppkey LIMIT 10") { (s, dir) =>
      val t = freshCopy(s, dir, "supplier", "t51")
      s.table(t).select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(col("s_acctbal").desc, col("s_suppkey")).limit(10)
    },

    // Transactional batched append: every key appears exactly twice.
    Q("q52_jdbc_append",
      "SELECT n_nationkey, 2::BIGINT AS n FROM nation ORDER BY n_nationkey") { (s, dir) =>
      val t = freshCopy(s, dir, "nation", "t52")
      Tables.load(s, dir, "nation").writeTo(t).append()
      s.table(t).groupBy("n_nationkey").agg(count(lit(1)).as("n"))
        .orderBy("n_nationkey")
    },

    // Truncate-overwrite: the second write replaces all rows.
    Q("q53_jdbc_overwrite",
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier " +
        "WHERE s_nationkey < 10 ORDER BY s_suppkey") { (s, dir) =>
      val t = freshCopy(s, dir, "supplier", "t53")
      Tables.load(s, dir, "supplier").filter(col("s_nationkey") < 10)
        .writeTo(t).overwrite(lit(true))
      s.table(t).orderBy("s_suppkey")
    },

    // Upsert keyed on n_nationkey: existing keys updated (region >= 2
    // renamed), new keys (+100) inserted — Derby's update-else-insert
    // fallback path (reference `on_conflict.rs:22-105` semantics).
    Q("q54_jdbc_upsert",
      "SELECT n_nationkey, CASE WHEN n_regionkey >= 2 THEN upper(n_name) || '_U' " +
        "ELSE n_name END AS n_name, n_regionkey FROM nation " +
        "UNION ALL SELECT n_nationkey + 100, 'NEW_' || n_name, n_regionkey " +
        "FROM nation WHERE n_regionkey = 0 ORDER BY n_nationkey") { (s, dir) =>
      val t = freshCopy(s, dir, "nation", "t54")
      val n = Tables.load(s, dir, "nation")
      val upd = n.filter(col("n_regionkey") >= 2)
        .select(col("n_nationkey"), concat(upper(col("n_name")), lit("_U")).as("n_name"),
          col("n_regionkey"))
      val ins = n.filter(col("n_regionkey") === 0)
        .select((col("n_nationkey") + 100).as("n_nationkey"),
          concat(lit("NEW_"), col("n_name")).as("n_name"), col("n_regionkey"))
      upd.union(ins).writeTo(t).option("upsertkeys", "n_nationkey").append()
      s.table(t).orderBy("n_nationkey")
    },

    // Do-nothing upsert mode (reference on_conflict.rs:14,73-106):
    // every existing key re-arrives with a DIFFERENT payload and must
    // keep its current row byte-identical; only the +100 keys insert.
    // If do_nothing silently behaved as update, n_name would read
    // 'CLOBBERED' and the hash compare would fail.
    Q("q67_jdbc_upsert_nothing",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation " +
        "UNION ALL SELECT n_nationkey + 100, 'NEW_' || n_name, n_regionkey " +
        "FROM nation WHERE n_regionkey = 1 ORDER BY n_nationkey") { (s, dir) =>
      val t = freshCopy(s, dir, "nation", "t67")
      val n = Tables.load(s, dir, "nation")
      val existing = n.select(col("n_nationkey"), lit("CLOBBERED").as("n_name"),
        col("n_regionkey"))
      val fresh = n.filter(col("n_regionkey") === 1)
        .select((col("n_nationkey") + 100).as("n_nationkey"),
          concat(lit("NEW_"), col("n_name")).as("n_name"), col("n_regionkey"))
      existing.union(fresh).writeTo(t)
        .option("upsertkeys", "n_nationkey").option("upsertmode", "do_nothing")
        .append()
      s.table(t).orderBy("n_nationkey")
    },

    // Reference OnConflict token syntax (`on_conflict.rs:113-140`):
    // `upsertmode=upsert:cols` — the colon list IS the conflict target,
    // no separate upsertkeys option. Region-1 names rewrite in place;
    // nothing inserts.
    Q("q95_jdbc_upsert_cols",
      "SELECT n_nationkey, CASE WHEN n_regionkey = 1 THEN 'R1_' || n_name " +
        "ELSE n_name END AS n_name, n_regionkey FROM nation ORDER BY n_nationkey") { (s, dir) =>
      val t = freshCopy(s, dir, "nation", "t95")
      val n = Tables.load(s, dir, "nation")
      n.filter(col("n_regionkey") === 1)
        .select(col("n_nationkey"), concat(lit("R1_"), col("n_name")).as("n_name"),
          col("n_regionkey"))
        .writeTo(t).option("upsertmode", "upsert:n_nationkey").append()
      s.table(t).orderBy("n_nationkey")
    },

    // Target-less conflict skip (`do_nothing_all`, on_conflict.rs:32):
    // the table's PRIMARY KEY is the constraint; every existing key
    // re-arrives with a clobbering payload and must survive untouched,
    // only the +100 keys insert.
    Q("q96_jdbc_conflict_skip",
      "SELECT n_nationkey, n_name FROM nation " +
        "UNION ALL SELECT n_nationkey + 100, 'NEW_' || n_name FROM nation " +
        "WHERE n_regionkey = 2 ORDER BY n_nationkey") { (s, dir) =>
      gate(s, dir)
      val t = "gate.app.t96"
      s.sql(s"DROP TABLE IF EXISTS $t")
      s.sql(s"CREATE TABLE $t (n_nationkey INT NOT NULL, n_name STRING) " +
        "TBLPROPERTIES ('primarykeys'='n_nationkey')")
      val n = Tables.load(s, dir, "nation")
      n.select(col("n_nationkey"), col("n_name")).writeTo(t).append()
      n.select(col("n_nationkey"), lit("CLOBBERED").as("n_name"))
        .union(n.filter(col("n_regionkey") === 2)
          .select((col("n_nationkey") + 100).as("n_nationkey"),
            concat(lit("NEW_"), col("n_name")).as("n_name")))
        .writeTo(t).option("upsertmode", "do_nothing_all").append()
      s.table(t).orderBy("n_nationkey")
    },

    // DELETE FROM ... WHERE through SupportsDeleteV2 (W7): the predicate
    // unparses to Derby SQL and runs remotely.
    Q("q55_jdbc_delete",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation " +
        "WHERE n_regionkey <> 2 ORDER BY n_nationkey") { (s, dir) =>
      val t = freshCopy(s, dir, "nation", "t55")
      s.sql(s"DELETE FROM $t WHERE n_regionkey = 2")
      s.table(t).orderBy("n_nationkey")
    },

    // Aggregate pushdown: the whole GROUP BY executes inside Derby (one
    // remote SQL statement), Spark only casts/orders the tiny result.
    // s_acctbal is stored as DECIMAL(18,2) so the remote SUM is exact in
    // any accumulation order (a double SUM would be engine-order-
    // dependent and break the cross-engine hash).
    Q("q57_jdbc_agg_pushdown",
      "SELECT s_nationkey, COUNT(*) AS n, " +
        "CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal, " +
        "CAST(MAX(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal " +
        "FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey") { (s, dir) =>
      gate(s, dir)
      val t = "gate.app.t57"
      s.sql(s"DROP TABLE IF EXISTS $t")
      Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal").cast(D).as("s_acctbal"))
        .writeTo(t).create()
      s.table(t)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum(col("s_acctbal")).as("sum_dec"),
          max(col("s_acctbal")).as("max_dec"))
        .select(col("s_nationkey"), col("n"),
          col("sum_dec").cast("double").as("total_bal"),
          col("max_dec").cast("double").as("max_bal"))
        .orderBy("s_nationkey")
    },

    // EXPRESSION aggregate pushdown: the group key is YEAR(date) — the
    // whole GROUP BY, expression included, executes inside Derby, with
    // the scan schema introspected from the remote statement itself
    // (remote engines disagree on expression result types; the remote's
    // prepared-statement metadata is the source of truth).
    Q("q123_jdbc_expr_agg",
      "SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y, COUNT(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM orders GROUP BY 1 ORDER BY y") { (s, dir) =>
      gate(s, dir)
      val t = "gate.app.t123"
      s.sql(s"DROP TABLE IF EXISTS $t")
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice").cast(D).as("o_totalprice"))
        .writeTo(t).create()
      s.table(t)
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("sd"))
        .select(col("y"), col("n"), col("sd").cast("double").as("total"))
        .orderBy("y")
    },

    // Overwrite-by-filter (SupportsOverwriteV2): only rows matching the
    // predicate are replaced, atomically via the staged swap — new rows
    // land, non-matching originals survive byte-identically.
    Q("q66_jdbc_overwrite_where",
      "SELECT s_suppkey, 'X_' || s_name AS s_name, s_nationkey, s_acctbal " +
        "FROM supplier WHERE s_nationkey < 5 " +
        "UNION ALL SELECT s_suppkey, s_name, s_nationkey, s_acctbal " +
        "FROM supplier WHERE s_nationkey >= 10 ORDER BY s_suppkey") { (s, dir) =>
      val t = freshCopy(s, dir, "supplier", "t66")
      Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") < 5)
        .select(col("s_suppkey"), concat(lit("X_"), col("s_name")).as("s_name"),
          col("s_nationkey"), col("s_acctbal"))
        .writeTo(t).overwrite(col("s_nationkey") < 10)
      s.table(t).orderBy("s_suppkey")
    },

    // Nested types (W11 breadth): an array column stores into Derby as
    // its deterministic JSON text (the reference's nested→JSON
    // compromise for text stores) and reads back byte-identical to
    // DuckDB's to_json over the same source data.
    Q("q65_jdbc_nested_json",
      "SELECT doc_id, to_json(string_split(text, ' '))::VARCHAR AS toks " +
        "FROM documents ORDER BY doc_id") { (s, dir) =>
      gate(s, dir)
      val t = "gate.app.t65"
      s.sql(s"DROP TABLE IF EXISTS $t")
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .writeTo(t).create()
      s.table(t).orderBy("doc_id")
    },

    // UPDATE ... SET ... WHERE pushed as one remote statement (W8): no
    // data moves through Spark; doubling is exact (doubles scale by 2).
    Q("q59_jdbc_update",
      "SELECT s_suppkey, s_name, s_nationkey, " +
        "CASE WHEN s_nationkey >= 10 THEN s_acctbal * 2 ELSE s_acctbal END AS s_acctbal " +
        "FROM supplier ORDER BY s_suppkey") { (s, dir) =>
      val t = freshCopy(s, dir, "supplier", "t59")
      graft.sources.jdbc.Dml.update(s, t,
        Seq("s_acctbal" -> (col("s_acctbal") * lit(2.0))),
        col("s_nationkey") >= lit(10))
      s.table(t).orderBy("s_suppkey")
    },

    // Federation (J1): nation ⋈ region between two Derby tables of the
    // SAME database collapses into ONE remote SQL join (the
    // FederationRule injected via GraftExtensions); Spark ships only the
    // joined, filtered result. FederationSpec asserts the single-scan
    // plan; this gate row proves value-exactness.
    Q("q58_jdbc_federated_join",
      "SELECT n_nationkey, n_name, r_name FROM nation JOIN region " +
        "ON n_regionkey = r_regionkey WHERE r_regionkey <> 3 " +
        "ORDER BY n_nationkey") { (s, dir) =>
      val tn = freshCopy(s, dir, "nation", "t58n")
      val tr = freshCopy(s, dir, "region", "t58r")
      s.table(tn)
        .join(s.table(tr), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_regionkey") =!= 3)
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    },

    // Same-server SEMI join: FederationRule renders it as ONE remote
    // EXISTS scan (FederationSpec asserts the single-scan plan; this
    // gate row proves value-exactness of the EXISTS collapse).
    Q("q69_jdbc_federated_semijoin",
      "SELECT n_nationkey, n_name FROM nation n WHERE EXISTS " +
        "(SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey " +
        "AND c.c_acctbal > 9890) ORDER BY n_nationkey") { (s, dir) =>
      val tn = freshCopy(s, dir, "nation", "t69n")
      val tc = freshCopy(s, dir, "customer", "t69c")
      s.table(tn)
        .join(s.table(tc),
          col("n_nationkey") === col("c_nationkey") && col("c_acctbal") > 9890,
          "left_semi")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    },

    // Range-partitioned parallel scan (S7; our scale improvement over
    // the reference's always-1-partition SQL scans, `mod.rs:313`): four
    // executors each read a c_custkey range predicate concurrently.
    Q("q56_jdbc_partitioned_scan",
      "SELECT c_nationkey, COUNT(*) AS n, " +
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal " +
        "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey") { (s, dir) =>
      val t = freshCopy(s, dir, "customer", "t56")
      val bounds = Tables.load(s, dir, "customer")
        .agg(min("c_custkey"), max("c_custkey")).head()
      s.read
        .option("partitioncolumn", "c_custkey")
        .option("lowerbound", bounds.getLong(0).toString)
        .option("upperbound", (bounds.getLong(1) + 1).toString)
        .option("numpartitions", "4")
        .table(t)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(D)).cast("double").as("total_bal"))
        .orderBy("c_nationkey")
    }
  )
}
