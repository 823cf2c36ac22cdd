package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stubbed decoder's exact values (q64 has no SQL oracle) and
  * the binary plumbing: schema, magic sniffing, batch shape.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("extractFeatures: deterministic stub values and typed schema") {
    import spark.implicits._
    // jpeg magic + payload "ab" (0x61 0x62)
    val blob = Array(0xFF, 0xD8, 0xFF, 0x61, 0x62).map(_.toByte)
    val df = Seq((7L, blob)).toDF("doc_id", "blob")
    val out = Multimodal.extractFeatures(df).collect()
    assert(out.length == 1)
    val f = out.head
    assert(f.doc_id == 7L)
    assert(f.kind == "jpeg")
    assert(f.n_bytes == 5)
    assert(f.width == 16 + (0x61 & 0x3f))  // 49 -> 16+33
    assert(f.height == 16 + (0x62 & 0x3f))
    assert(f.brightness == (0x61 + 0x62) / 2.0)
    assert(Multimodal.extractFeatures(df).schema.fieldNames.toSeq ==
      Seq("doc_id", "kind", "n_bytes", "width", "height", "brightness"))
  }

  test("unknown magic sniffs as bin; empty payload is safe") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](0x00, 0x01, 0x02))).toDF("doc_id", "blob")
    val f = Multimodal.extractFeatures(df).collect().head
    assert(f.kind == "bin")
    assert(f.width == 16 && f.height == 16 && f.brightness == 0.0)
  }

  test("mediaBlobs cycles magic headers by doc_id") {
    val sf = "/root/testdata/sf0.001"
    val rows = Multimodal.mediaBlobs(spark, sf)
      .withColumn("prefix", hex(substring(col("blob"), 1, 3)))
      .select("doc_id", "prefix")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, p) =>
      assert(p == Multimodal.Magics((id % 3).toInt)._1, s"doc $id prefix $p")
    }
  }
}
