package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized pincolumns catch-all property, on BOTH live wires: for
  * random remote schemas, random pin subsets (sometimes including a
  * ghost pin the remote table lacks), and random null patterns, the
  * projected read must (a) keep pinned columns value-identical to the
  * plain read, (b) fold every unpinned column into the catch-all such
  * that `graft_json_get` + a cast extracts it back EXACTLY, (c) read
  * ghost pins as all-NULL, and (d) keep filters on pinned columns
  * correct. The directed goldens live in SchemaProjectionSpec; this
  * sweep hunts the type × pin × null combinations nobody wrote down
  * (reference `schema_projection.rs:1-70`).
  */
class SchemaProjectionPropertySpec extends AnyFunSuite with SparkFixture {

  // candidate payload columns: name -> (type, row-index generator).
  // Types chosen so JSON extract-back is exact: integers, doubles with
  // short binary-exact fractions, strings (incl. quotes/unicode),
  // booleans, DECIMAL(9,2), DATE (ISO text in the fold).
  private val colGens: Seq[(String, DataType, Int => Any)] = Seq(
    ("c_long", LongType, i => i.toLong * 1000003L),
    ("c_int", IntegerType, i => i * 7 - 3),
    ("c_dbl", DoubleType, i => i + 0.5),
    ("c_str", StringType, i => "v\"" + i + "é" + (if (i % 3 == 0) "," else "")),
    ("c_bool", BooleanType, i => i % 2 == 0),
    ("c_dec", DecimalType(9, 2), i => new java.math.BigDecimal(s"$i.25")),
    ("c_date", DateType, i => java.sql.Date.valueOf(f"2020-01-${1 + i % 27}%02d")))

  private def buildBase(rnd: Random, nRows: Int): (StructType, Seq[org.apache.spark.sql.Row]) = {
    val chosen = rnd.shuffle(colGens).take(2 + rnd.nextInt(colGens.length - 2))
    val schema = StructType(
      StructField("k", LongType, nullable = false) +:
        chosen.map { case (n, dt, _) => StructField(n, dt, nullable = true) })
    val rows = (1 to nRows).map { i =>
      org.apache.spark.sql.Row.fromSeq(
        i.toLong +: chosen.map { case (_, _, g) =>
          if (rnd.nextInt(4) == 0) null else g(i)
        })
    }
    (schema, rows)
  }

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.mkString("|")).groupBy(identity).map { case (k, v) => k -> v.length }

  private def sweep(catalog: String, seeds: Range): Unit = {
    for (seed <- seeds) {
      val rnd = new Random(seed)
      val (schema, rows) = buildBase(rnd, 12 + rnd.nextInt(20))
      val base = spark.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema)
      spark.sql(s"DROP TABLE IF EXISTS $catalog.spp.t$seed")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $catalog.spp")
      base.writeTo(s"$catalog.spp.t$seed").create()

      val payload = schema.fields.tail.map(_.name)
      val nPins = rnd.nextInt(payload.length) // 0..n-1 payload pins
      val withGhost = rnd.nextInt(3) == 0
      val pins = ("k" +: rnd.shuffle(payload.toSeq).take(nPins)) ++
        (if (withGhost) Seq("ghost_col") else Nil)
      val url = spark.conf.get(s"spark.sql.catalog.$catalog.url")
      val tbl = spark.read.format("graft.sources.jdbc.GraftJdbcSource")
        .option("url", url)
        .option("dbtable", s""""spp"."t$seed"""")
        .option("pincolumns", pins.mkString(","))
        .load()

      // (a) schema shape: pins in declared order + catch-all last
      assert(tbl.schema.fieldNames.toSeq == pins :+ "data", s"seed=$seed schema")

      // (b) every unpinned payload column extracts back exactly
      val unpinned = payload.filterNot(p => pins.exists(_.equalsIgnoreCase(p)))
      for (c <- unpinned) {
        val dt = schema(c).dataType
        val got = multiset(tbl.select(col("k"),
          expr(s"graft_json_get(data, '$c')").cast(dt).as(c)))
        val want = multiset(base.select(col("k"), col(c)))
        assert(got == want, s"seed=$seed extract-back of $c diverged:\n$got\n$want")
      }

      // pinned columns are value-identical to the plain read
      val realPins = pins.filterNot(_ == "ghost_col")
      assert(multiset(tbl.select(realPins.map(col): _*)) ==
        multiset(base.select(realPins.map(col): _*)), s"seed=$seed pinned values")

      // (c) a ghost pin reads as NULL on every row
      if (withGhost)
        assert(tbl.select("ghost_col").collect().forall(_.isNullAt(0)),
          s"seed=$seed ghost not null")

      // (d) a random filter on a pinned (non-key) column stays correct;
      // on the key it pushes remotely — either way counts must match
      val fcol = realPins(rnd.nextInt(realPins.length))
      val (fexpr, bexpr) = schema(fcol).dataType match {
        case LongType | IntegerType => (col(fcol) > 3, col(fcol) > 3)
        case DoubleType => (col(fcol) > 5.0, col(fcol) > 5.0)
        case BooleanType => (col(fcol) === true, col(fcol) === true)
        case _ => (col(fcol).isNotNull, col(fcol).isNotNull)
      }
      assert(tbl.filter(fexpr).count() == base.filter(bexpr).count(),
        s"seed=$seed filter on $fcol diverged")

      spark.sql(s"DROP TABLE IF EXISTS $catalog.spp.t$seed")
    }
  }

  test("random pins × types × nulls: projected read ≡ plain read + exact extract-back (live Derby)") {
    sweep("ext", 1 to 12)
  }

  test("random pins × types × nulls: projected read ≡ plain read + exact extract-back (live DuckDB)") {
    assume(DuckDbWireSpec.driverPresent, "duckdb_jdbc driver not on classpath")
    val dir = java.nio.file.Files.createTempDirectory("graft_sppduck").toString
    spark.conf.set("spark.sql.catalog.sppduck", "graft.sources.jdbc.GraftCatalog")
    // NOT spp.duckdb: DuckDB names the file catalog by basename, and a
    // catalog named like the "spp" schema makes every qualified name
    // ambiguous ("Ambiguous reference to catalog or schema")
    spark.conf.set("spark.sql.catalog.sppduck.url", s"jdbc:duckdb:$dir/sweep.duckdb")
    sweep("sppduck", 20 to 31)
  }
}
