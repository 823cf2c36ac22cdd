package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankHistSpec extends AnyFunSuite with SparkFixture {

  private def hist(values: Seq[Long], cap: Int, parts: Int): (Int, Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = values.toDF("v").repartition(parts)
      .agg(RankHist.rank_hist(col("v"), cap).as("h"))
      .select("h.shift", "h.bins").head()
    (r.getInt(0), r.getSeq[Row](1).map(b => (b.getLong(0), b.getLong(1))))
  }

  /** Reference: the minimal shift s with |{v >> s}| <= cap, and its
    * exact histogram — computed directly, no sketch.
    */
  private def reference(values: Seq[Long], cap: Int): (Int, Seq[(Long, Long)]) = {
    val s = (0 to 62).find(s => values.map(_ >> s).distinct.size <= cap).get
    (s, values.groupBy(v => (v >> s) << s).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1))
  }

  test("exact regime: distinct <= capacity gives shift 0 and exact counts") {
    val vs = Seq(5L, 5L, 9L, 1L, 9L, 9L)
    val (shift, bins) = hist(vs, cap = 8, parts = 3)
    assert(shift == 0)
    assert(bins == Seq((1L, 1L), (5L, 2L), (9L, 3L)))
  }

  test("coarse regime: result is the minimal-shift histogram, independent of partitioning") {
    val rnd = new scala.util.Random(42)
    val vs = Seq.fill(500)(math.abs(rnd.nextLong()) % 100000)
    val ref = reference(vs, 16)
    for (parts <- Seq(1, 3, 13)) {
      assert(hist(vs, 16, parts) == ref, s"parts=$parts diverged from canonical form")
    }
  }

  test("quantile read is within 2^shift of the true quantile") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(1000)(math.abs(rnd.nextLong()) % 1000000)
    val (shift, bins) = hist(vs, 32, parts = 5)
    val sorted = vs.sorted
    for (pm <- Seq(100, 250, 500, 750, 900, 999)) {
      val est = RankHist.quantile(shift, bins, pm)
      val target = math.max(1L, (sorted.size.toLong * pm + 999) / 1000).toInt
      val truth = sorted(target - 1)
      assert(math.abs(est - truth) < (1L << shift),
        s"p$pm: est=$est truth=$truth shift=$shift")
    }
  }

  test("negative values bin by arithmetic shift (floor), not truncation") {
    val vs = Seq(-7L, -1L, -1L, 3L)
    val (shift, bins) = hist(vs, 2, parts = 2)
    assert((shift, bins) == reference(vs, 2))
  }

  test("SQL surface graft_rank_hist matches the DataFrame form bit for bit") {
    import spark.implicits._
    Seq.tabulate(100)(i => (i.toLong * i) % 977).toDF("v")
      .createOrReplaceTempView("rh_in")
    val sql = spark.sql("SELECT graft_rank_hist(v, 8) AS h FROM rh_in").head()
    val df = spark.table("rh_in").agg(RankHist.rank_hist(col("v"), 8).as("h")).head()
    assert(sql == df)
  }

  test("rank_hist aggregates across streaming micro-batches (complete mode)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Long)](spark)
    val agg = input.toDF().toDF("grp", "v").groupBy("grp")
      .agg(RankHist.rank_hist(col("v"), 4).as("h"))
      .select(col("grp"), col("h.shift").as("shift"), col("h.bins").as("bins"))
    val q = agg.writeStream.format("memory").queryName("rh_stream")
      .outputMode("complete").start()
    try {
      input.addData(("a", 1L), ("a", 2L), ("a", 3L))
      q.processAllAvailable()
      input.addData(("a", 64L), ("a", 65L), ("b", 7L))
      q.processAllAvailable()
      val rows = spark.table("rh_stream").collect()
        .map(r => r.getString(0) -> ((r.getInt(1),
          r.getSeq[Row](2).map(b => (b.getLong(0), b.getLong(1)))))).toMap
      // the streamed state must equal the batch sketch over all values
      assert(rows("a") == reference(Seq(1L, 2L, 3L, 64L, 65L), 4))
      assert(rows("b") == (0, Seq((7L, 1L))))
    } finally q.stop()
  }

  test("capacity below 2 fails at construction") {
    intercept[IllegalArgumentException] {
      RankHist.rank_hist(col("v"), 1)
    }
  }

  test("quantile rejects an empty histogram and out-of-range permille loudly") {
    intercept[IllegalArgumentException] { RankHist.quantile(0, Nil, 500) }
    intercept[IllegalArgumentException] { RankHist.quantile(0, Seq((1L, 1L)), 1001) }
    assert(RankHist.quantile(0, Seq((1L, 1L)), 1000) == 1L)
  }
}
