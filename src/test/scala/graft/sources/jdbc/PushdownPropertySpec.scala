package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized pushdown equivalence: filters drawn from the whole
  * V2-translatable grammar (comparisons, arithmetic incl. modulo,
  * LIKE-shaped string predicates with wildcard characters IN the data
  * and the literals, IN lists, CASE WHEN, temporal extraction, NULL
  * handling / three-valued logic, AND/OR/NOT composition) must return
  * identical rows through the pushed Derby scan and over an in-memory
  * mirror. Whether a predicate pushes fully, partially or not at all is
  * irrelevant to the caller — THE RESULT MUST NOT CHANGE. This is the
  * contract the per-construct goldens in UnparserSpec cannot sweep.
  * The sweep runs against BOTH live wire engines: Derby and (when the
  * cached driver jar exists) DuckDB, whose dialect spells LIKE escapes,
  * quoting and temporal extraction differently.
  */
class PushdownPropertySpec extends AnyFunSuite with SparkFixture {

  // nulls in every column; strings contain LIKE metacharacters
  private lazy val rows: Seq[(java.lang.Long, java.lang.Double, String, java.sql.Timestamp)] =
    (1 to 40).map { i =>
      val k: java.lang.Long = if (i % 11 == 0) null else Long.box(i.toLong)
      val d: java.lang.Double = if (i % 7 == 0) null else Double.box((i * 13 % 20) * 2.5)
      val s: String =
        if (i % 9 == 0) null
        else Seq("plain", "pre%mid", "under_score", "back\\slash", "mix%_", s"word$i")(i % 6)
      val ts: java.sql.Timestamp =
        if (i % 13 == 0) null
        else java.sql.Timestamp.valueOf(f"${1994 + i % 4}%d-${1 + i % 12}%02d-${1 + i % 27}%02d 0${i % 9}:1${i % 5}:00")
      (k, d, s, ts)
    }

  /** Create `<catalog>.pp.t` with the fixture rows and return its name. */
  private def setup(catalog: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $catalog.pp")
    spark.sql(s"DROP TABLE IF EXISTS $catalog.pp.t")
    import spark.implicits._
    rows.toDF("k", "d", "s", "ts").writeTo(s"$catalog.pp.t").create()
    s"$catalog.pp.t"
  }

  /** Random predicate over columns k/d/s/ts, identical for both sides. */
  private def pred(rnd: Random, depth: Int = 0): Column = {
    def leaf: Column = rnd.nextInt(15) match {
      case 0 => col("k") > lit(rnd.nextInt(40).toLong)
      case 1 => col("k") % lit(2 + rnd.nextInt(5)) === lit(rnd.nextInt(3))
      case 2 => col("d") <= lit(rnd.nextInt(50).toDouble)
      case 3 => col("s").startsWith(Seq("p", "pre%", "under_", "back\\")(rnd.nextInt(4)))
      case 4 => col("s").contains(Seq("%", "_", "\\", "id")(rnd.nextInt(4)))
      case 5 => col("s").isin("plain", "mix%_", s"word${rnd.nextInt(40)}")
      case 6 => col(Seq("k", "d", "s", "ts")(rnd.nextInt(4))).isNull
      case 7 => year(col("ts")) === lit(1994 + rnd.nextInt(4))
      case 8 => month(col("ts")) <= lit(1 + rnd.nextInt(12))
      case 9 => when(col("k") > 20, col("d")).otherwise(col("d") + 10) > lit(15.0)
      case 10 => coalesce(col("k"), lit(0L)) > lit(rnd.nextInt(40).toLong)
      case 11 => col("d").between(lit(rnd.nextInt(20).toDouble), lit(20 + rnd.nextInt(30).toDouble))
      case 12 => concat(col("s"), lit("#")).endsWith(Seq("id#", "%_#", s"${rnd.nextInt(40)}#")(rnd.nextInt(3)))
      case 13 => substring(col("s"), 2, 3) === Seq("lai", "re%", "nde", "ord")(rnd.nextInt(4))
      case 14 => abs(col("d") - lit(20.0)) < lit(rnd.nextInt(15).toDouble)
    }
    if (depth >= 2 || rnd.nextInt(3) == 0) leaf
    else rnd.nextInt(3) match {
      case 0 => pred(rnd, depth + 1) && pred(rnd, depth + 1)
      case 1 => pred(rnd, depth + 1) || pred(rnd, depth + 1)
      case 2 => !pred(rnd, depth + 1)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  /** Sweep `seeds` random predicates against table `name`, comparing each
    * result to the in-memory mirror filtered by the identical predicate.
    */
  private def sweep(name: String, seeds: Range): Unit = {
    import spark.implicits._
    val local = rows.toDF("k", "d", "s", "ts")
    val remote = spark.table(name)
    for (seed <- seeds) {
      val p1 = pred(new Random(seed))
      val p2 = pred(new Random(seed))
      val (got, want) = (sortedRows(remote.filter(p1)), sortedRows(local.filter(p2)))
      assert(got == want,
        s"seed=$seed predicate=${p1} diverged:\n got=$got\nwant=$want")
    }
  }

  test("random predicates: pushed Derby scan == in-memory mirror") {
    sweep(setup("ext"), 1 to 40)
  }

  // The same grammar against the flagship connector's LIVE wire: DuckDB's
  // dialect diverges from Derby's exactly where unparse bugs hide (LIKE
  // escape spelling, quoting, EXTRACT forms, modulo), and its evaluation
  // of the pushed SQL is the real engine's, not Derby's. Self-skips when
  // the locally cached driver jar is absent.
  test("random predicates: pushed live-DuckDB scan == in-memory mirror") {
    assume(DuckDbWireSpec.driverPresent, "duckdb_jdbc driver not on classpath")
    val dir = java.nio.file.Files.createTempDirectory("graft_ppduck").toString
    spark.conf.set("spark.sql.catalog.ppduck", "graft.sources.jdbc.GraftCatalog")
    // basename must differ from the "pp" schema: DuckDB names the file's
    // catalog after the basename and "pp.t" would become ambiguous
    spark.conf.set("spark.sql.catalog.ppduck.url", s"jdbc:duckdb:$dir/sweep.duckdb")
    sweep(setup("ppduck"), 1 to 40)
  }
}
