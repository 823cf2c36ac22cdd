package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.sql.{Date, Timestamp}

/** Property-based write→read round-trips per type family — the Spark
  * analog of the reference's per-type fixture corpus
  * (`core/tests/arrow_record_batch_gen/mod.rs:15-849`): generated
  * values of every scalar family (with nulls) must survive the Derby
  * DSv2 write + pushdown-capable read bit-for-bit. Raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge isn't in the
  * offline cache), so failures reproduce exactly.
  */
class RoundTripPropertySpec extends AnyFunSuite with SparkFixture {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("b", BooleanType),
    StructField("s", ShortType),
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("f", FloatType),
    StructField("d", DoubleType),
    StructField("dec", DecimalType(10, 3)),
    StructField("str", StringType),
    StructField("bin", BinaryType),
    StructField("dt", DateType),
    StructField("ts", TimestampType)))

  private def opt[A](g: Gen[A]): Gen[Any] =
    Gen.frequency(4 -> g.map(_.asInstanceOf[Any]), 1 -> Gen.const(null))

  // Derby (and SQL generally) has no NaN/Infinity; strings avoid NUL.
  private val genRowValues: Gen[Seq[Any]] = for {
    b <- opt(Gen.oneOf(true, false))
    s <- opt(Gen.chooseNum(Short.MinValue, Short.MaxValue))
    i <- opt(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    l <- opt(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    f <- opt(Gen.chooseNum(-1e30f, 1e30f))
    d <- opt(Gen.chooseNum(-1e100, 1e100))
    dec <- opt(Gen.chooseNum(-9999999L, 9999999L)
      .map(v => new java.math.BigDecimal(java.math.BigInteger.valueOf(v), 3)))
    str <- opt(Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('é', '日', '\'', '"', '\\', ' '))).map(_.mkString))
    bin <- opt(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    dt <- opt(Gen.chooseNum(-50000L, 50000L).map(days => new Date(days * 86400000L)))
    ts <- opt(Gen.chooseNum(-2000000000000L, 4000000000000L).map { ms =>
      val t = new Timestamp(ms); t.setNanos((math.abs(ms) % 1000).toInt * 1000000); t
    })
  } yield Seq(b, s, i, l, f, d, dec, str, bin, dt, ts)

  test("all scalar families round-trip through Derby exactly (with nulls)") {
    roundTrip("ext", "ext.rtp.t")
  }

  test("all scalar families round-trip through wire-level DuckDB exactly (with nulls)") {
    assume(DuckDbWireSpec.driverPresent)
    spark.conf.set("spark.sql.catalog.rtduck", "graft.sources.jdbc.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rtduck.url",
      s"jdbc:duckdb:${java.nio.file.Files.createTempDirectory("graft_rtp").toString}/rt.duckdb")
    roundTrip("rtduck", "rtduck.rtp.t")
  }

  private def roundTrip(catalog: String, table: String): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $catalog.rtp")
    import scala.jdk.CollectionConverters._
    val samples = (1L to 4L).map { seed =>
      Gen.listOfN(25, genRowValues)
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
    }
    samples.foreach { rowVals =>
      val rows = rowVals.zipWithIndex.map { case (vs, i) => Row.fromSeq(i.toLong +: vs) }
      val df = spark.createDataFrame(rows.asJava, schema)
      spark.sql(s"DROP TABLE IF EXISTS $table")
      df.writeTo(table).create()
      val back = spark.table(table).collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(back.size == rows.size)
      rows.foreach { exp =>
        val got = back(exp.getLong(0))
        (1 until schema.length).foreach { c =>
          val (e, g) = (exp.get(c), got.get(c))
          val ok = (e, g) match {
            case (null, null) => true
            case (a: Array[Byte], b: Array[Byte]) => a.sameElements(b)
            case (a: java.math.BigDecimal, b: java.math.BigDecimal) => a.compareTo(b) == 0
            case (a, b: java.math.BigDecimal) =>
              new java.math.BigDecimal(a.toString).compareTo(b) == 0
            case (a, b) => a == b
          }
          assert(ok, s"column ${schema(c).name}: wrote $e read $g (id=${exp.getLong(0)})")
        }
      }
    }
  }
}
