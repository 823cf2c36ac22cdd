package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** dHash perceptual fingerprint (q167): the codegen expression must
  * match an independently-written reference, separate header-variant
  * twins from distinct content, and survive the expression/eval
  * boundary bit-for-bit.
  */
class DHashSpec extends AnyFunSuite with SparkFixture {

  /** Independent reference: same spec (66 chunk means, 60 gradient
    * bits), written functionally rather than as the expression's
    * imperative single pass.
    */
  private def ref(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val cells = (0 until 66).map { i =>
      val lo = (i.toLong * n / 66).toInt
      val hi = math.min(n, math.max(((i + 1).toLong * n / 66).toInt, lo + 1))
      val chunk = bytes.slice(lo, hi).map(b => (b & 0xff).toLong)
      chunk.sum / chunk.length
    }
    (for {
      r <- 0 until 6
      c <- 0 until 10
      if cells(r * 11 + c + 1) > cells(r * 11 + c)
    } yield 1L << (r * 10 + c)).foldLeft(0L)(_ | _)
  }

  test("signature matches the independent reference on random bytes (incl. short inputs)") {
    val gen = Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    for (seed <- 1L to 200L) {
      val bs = gen.apply(Gen.Parameters.default, Seed(seed)).get.toArray
      assert(DHash.signature(bs) == ref(bs), s"seed $seed, n=${bs.length}")
    }
  }

  test("expression path equals direct eval and is header-robust") {
    import spark.implicits._
    val payload = ("the quick brown fox jumps over the lazy dog " * 8).getBytes("UTF-8")
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ payload
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e) ++ payload
    val other = ("a completely different document body with other words " * 8)
      .getBytes("UTF-8")
    val out = Seq((1L, jpeg), (2L, png), (3L, other)).toDF("id", "b")
      .select(col("id"), DHash.dhash60(col("b")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == DHash.signature(jpeg))
    assert(out(2L) == DHash.signature(png))
    // same payload, different container header → a few bits at most
    assert(java.lang.Long.bitCount(out(1L) ^ out(2L)) <= 6)
    // distinct content → far apart
    assert(java.lang.Long.bitCount(out(1L) ^ out(3L)) > 6)
  }

  test("dhashPairs pairs the container variants through the banded machinery") {
    import spark.implicits._
    val payload = ("shared media payload for both containers " * 6).getBytes("UTF-8")
    val blobs = Seq(
      (10L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ payload),
      (11L, Array[Byte](0x89.toByte, 0x50, 0x4e) ++ payload),
      (12L, ("entirely unrelated content that should stay unpaired " * 6)
        .getBytes("UTF-8"))
    ).toDF("doc_id", "blob")
    val pairs = graft.operators.Multimodal.dhashPairs(blobs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((10L, 11L)))
  }
}
