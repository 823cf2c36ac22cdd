package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Nested-type JSON storage and the UnsupportedTypeAction knob
  * (reference type breadth: `statement.rs:233-1010` nested→JSON for
  * text stores; `crates/common/src/lib.rs:23-30` action enum).
  */
class TypeBreadthSpec extends AnyFunSuite with SparkFixture {

  test("toJson renders nested Catalyst values deterministically") {
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(Array[Any](1L, null, 3L))
    assert(TypeMapping.toJson(ArrayType(LongType), arr) == "[1,null,3]")
    val struct = new GenericInternalRow(Array[Any](UTF8String.fromString("a\"b"), 2.5))
    val st = StructType(Seq(StructField("s", StringType), StructField("d", DoubleType)))
    assert(TypeMapping.toJson(st, struct) == """{"s":"a\"b","d":2.5}""")
    val map = new ArrayBasedMapData(
      new GenericArrayData(Array[Any](UTF8String.fromString("k1"))),
      new GenericArrayData(Array[Any](7L)))
    assert(TypeMapping.toJson(MapType(StringType, LongType), map) == """{"k1":7}""")
  }

  test("nested columns round-trip to Derby as JSON text") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.tb")
    spark.sql("DROP TABLE IF EXISTS ext.tb.t1")
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b"), Map("x" -> 1L), ("inner", 2L)),
      (2L, Seq.empty[String], Map.empty[String, Long], ("w", 9L)))
      .toDF("k", "arr", "m", "st")
    df.writeTo("ext.tb.t1").create()
    val back = spark.table("ext.tb.t1").orderBy("k").collect()
    // read-back schema is text (introspection sees VARCHAR)
    assert(spark.table("ext.tb.t1").schema.fields.drop(1).forall(_.dataType == StringType))
    assert(back(0).getString(1) == """["a","b"]""")
    assert(back(0).getString(2) == """{"x":1}""")
    assert(back(0).getString(3) == """{"_1":"inner","_2":2}""")
    assert(back(1).getString(1) == "[]")
    assert(back(1).getString(2) == "{}")
  }

  test("TIME columns read as epoch-day timestamps (documented §1.2 choice)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.tb")
    val o = JdbcOptions(Map("url" -> graft.SparkFixture.derbyUrl))
    val c = o.connect()
    try {
      val st = c.createStatement()
      try {
        try st.executeUpdate("""DROP TABLE "tb"."t5"""") catch { case _: java.sql.SQLException => }
        st.executeUpdate("""CREATE TABLE "tb"."t5" ("k" BIGINT, "tm" TIME)""")
        st.executeUpdate("""INSERT INTO "tb"."t5" VALUES (1, TIME('13:45:30'))""")
      } finally st.close()
    } finally c.close()
    val df = spark.table("ext.tb.t5")
    assert(df.schema("tm").dataType == TimestampType)
    val ts = df.collect()(0).getTimestamp(1)
    assert(ts.toString == "1970-01-01 13:45:30.0", ts.toString)
  }

  test("day-time intervals store as BIGINT micros and round-trip by value") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.tb")
    spark.sql("DROP TABLE IF EXISTS ext.tb.t6")
    import spark.implicits._
    val df = Seq((1L, java.time.Duration.ofMinutes(90))).toDF("k", "d")
    assert(df.schema("d").dataType.isInstanceOf[DayTimeIntervalType])
    df.writeTo("ext.tb.t6").create()
    // introspection sees the documented BIGINT-micros representation
    val back = spark.table("ext.tb.t6")
    assert(back.schema("d").dataType == LongType)
    assert(back.collect()(0).getLong(1) == 90L * 60 * 1000000)
  }

  test("unsupportedtypeaction=error refuses, =string stores text, =ignore drops") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.tb")
    import spark.implicits._
    val df = Seq((1L, BigDecimal("12345678901234567890.123456")))
      .toDF("k", "big")
      .select(col("k"), col("big").cast(DecimalType(38, 6)).as("big"))

    // error (default): Derby caps DECIMAL precision at 31
    spark.sql("DROP TABLE IF EXISTS ext.tb.t2")
    val e = intercept[Exception] { df.writeTo("ext.tb.t2").create() }
    assert(e.getMessage.contains("unsupportedtypeaction"), e.getMessage)

    // string: stored as text via Spark's store-assignment cast
    spark.sql("DROP TABLE IF EXISTS ext.tb.t3")
    df.writeTo("ext.tb.t3").tableProperty("unsupportedtypeaction", "string").create()
    val r = spark.table("ext.tb.t3").collect()(0)
    assert(r.getString(1) == "12345678901234567890.123456")

    // ignore: column dropped from the table
    spark.sql("DROP TABLE IF EXISTS ext.tb.t4")
    spark.sql("CREATE TABLE ext.tb.t4 (k BIGINT, big DECIMAL(38,6)) " +
      "TBLPROPERTIES ('unsupportedtypeaction'='ignore')")
    assert(spark.table("ext.tb.t4").schema.fieldNames.toSeq == Seq("k"))
  }
}
