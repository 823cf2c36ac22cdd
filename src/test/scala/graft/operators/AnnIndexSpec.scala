package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVFADC index (VERDICT r18 #1): the on-disk read path
  * must be bit-identical to the in-memory chain, and the mutation
  * surface (append / tombstone-delete / compact) must equal a batch
  * re-encode of the live set against the FROZEN model — the same
  * ≡-batch contract EventStreamSpec pins for the maintained BM25 index.
  */
class AnnIndexSpec extends AnyFunSuite with SparkFixture {

  private val M = 4
  private val Ksub = 4
  private val Iters = 2
  private val Dims = 8

  private def vecs(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map { id =>
      val q = (0 until Dims).map(i => (((id * 31 + i * 7919) % 13) - 6))
        .map(_.toLong)
      (id, q, q.map(x => x * x).sum)
    }.toDF("vec_id", "q", "nrm")
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"

  private def collectSearch(df: DataFrame): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    df.as[(Long, Long, Long)].collect().toSeq
  }

  private def collectEnc(df: DataFrame): Seq[(Long, Seq[Int], Long)] = {
    import spark.implicits._
    df.select("vec_id", "codes", "cell").as[(Long, Seq[Int], Long)]
      .collect().toSeq.sortBy(_._1)
  }

  /** The batch chain over the FROZEN persisted model — what every
    * mutated index state must equal bit-for-bit. */
  private def frozenExpect(path: String, live: DataFrame,
      queries: DataFrame, nprobe: Int, k: Int) = {
    val cents = AnnIndex.readCents(spark, path)
    val books = AnnIndex.readBooks(spark, path)
    val enc = Similarity.pqEncode(
      Similarity.ivfResiduals(live, cents), books, keep = Seq("cell"))
    val probes = Similarity.ivfProbes(queries, cents, lit(true), nprobe)
    (collectEnc(enc), collectSearch(Similarity.adcScan(enc, probes, books, k)))
  }

  test("persisted search is bit-identical to the in-memory ivfAdcWith chain") {
    val n = vecs(1L to 60L)
    val cents = Similarity.ivfTrainCents(n, c = 3).persist()
    val isQ = col("vec_id") % 20 === 0
    val path = tmp("graft_annidx_eq")
    AnnIndex.build(n, path, cents, M, Ksub, Iters)
    val mem = collectSearch(
      Similarity.ivfAdcWith(n, isQ, cents, nprobe = 2, m = M, ksub = Ksub,
        iters = Iters, k = 5))
    val disk = collectSearch(
      AnnIndex.search(spark, path, n.filter(isQ), nprobe = 2, k = 5))
    assert(disk == mem)
    val memR = collectSearch(
      Similarity.ivfAdcRerankWith(n, isQ, cents, nprobe = 2, m = M,
        ksub = Ksub, iters = Iters, k = 3, rFactor = 2))
    val diskR = collectSearch(
      AnnIndex.searchRerank(spark, path, n.filter(isQ), n, nprobe = 2,
        k = 3, rFactor = 2))
    assert(diskR == memR)
    cents.unpersist()
  }

  test("zero-centroid artifact degenerates to the plain-PQ full scan (pqAdc)") {
    val n = vecs(1L to 40L)
    val isQ = col("vec_id") % 10 === 0
    val path = tmp("graft_annidx_pq")
    AnnIndex.build(n, path, AnnIndex.zeroCent(spark, Dims), M, Ksub, Iters)
    val mem = collectSearch(
      Similarity.pqAdc(n, isQ, m = M, ksub = Ksub, iters = Iters, k = 4))
    val disk = collectSearch(
      AnnIndex.search(spark, path, n.filter(isQ), nprobe = 1, k = 4))
    assert(disk == mem)
  }

  test("append/delete/compact ≡ batch re-encode against the frozen model, bit-for-bit") {
    import spark.implicits._
    val base = vecs(1L to 40L)
    val cents = Similarity.ivfTrainCents(base, c = 3).persist()
    val path = tmp("graft_annidx_mut")
    AnnIndex.build(base, path, cents, M, Ksub, Iters)
    val queries = vecs(Seq(200L, 201L)) // external query vectors
    def check(live: DataFrame): Unit = {
      val (expEnc, expSearch) = frozenExpect(path, live, queries, 2, 4)
      assert(collectEnc(AnnIndex.encodedState(spark, path)) == expEnc)
      assert(collectSearch(
        AnnIndex.search(spark, path, queries, nprobe = 2, k = 4)) == expSearch)
    }
    check(base)
    // batch 1: appends encoded against the FROZEN quantizer
    AnnIndex.maintainBatch(vecs(41L to 50L), spark.emptyDataset[Long]
      .toDF("vec_id"), path, 1L)
    check(vecs(1L to 50L))
    // batch 2: deletes + an add, including a within-batch add+delete
    // of the same id (55) — the tombstone outranks the posting
    AnnIndex.maintainBatch(vecs(Seq(51L, 55L)),
      Seq(3L, 7L, 55L).toDF("vec_id"), path, 2L)
    val live2 = vecs((1L to 51L).filterNot(Set(3L, 7L)))
    check(live2)
    // compact folds postings ∖ tombstones into a new generation —
    // state and search results unchanged bit-for-bit across the fold
    val v = AnnIndex.compact(spark, path)
    assert(v == 2L)
    assert(new java.io.File(s"$path/encbase-v2").exists())
    check(live2)
    // post-compact appends land on the new generation
    AnnIndex.maintainBatch(vecs(Seq(60L)),
      spark.emptyDataset[Long].toDF("vec_id"), path, 3L)
    check(live2.unionByName(vecs(Seq(60L))))
    cents.unpersist()
  }

  test("published replay is skipped; rewound checkpoint and live-tombstone re-add refused") {
    import spark.implicits._
    val base = vecs(1L to 30L)
    val path = tmp("graft_annidx_rf")
    AnnIndex.build(base, path, Similarity.ivfTrainCents(base, c = 2),
      M, Ksub, Iters)
    AnnIndex.maintainBatch(vecs(Seq(31L)), Seq(5L).toDF("vec_id"), path, 1L)
    val before = collectEnc(AnnIndex.encodedState(spark, path))
    // at-least-once replay of the PUBLISHED batch: no-op
    AnnIndex.maintainBatch(vecs(Seq(31L)), Seq(5L).toDF("vec_id"), path, 1L)
    assert(collectEnc(AnnIndex.encodedState(spark, path)) == before)
    AnnIndex.maintainBatch(vecs(Seq(33L)),
      spark.emptyDataset[Long].toDF("vec_id"), path, 3L)
    // an UNPUBLISHED batch id below the newest version is a rewound
    // checkpoint (a published one is a replay and skips above)
    val e1 = intercept[IllegalArgumentException] {
      AnnIndex.maintainBatch(vecs(Seq(32L)),
        spark.emptyDataset[Long].toDF("vec_id"), path, 2L)
    }
    assert(e1.getMessage.contains("rewound"), e1.getMessage)
    // re-adding the live-tombstoned id 5 is refused...
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.maintainBatch(vecs(Seq(5L)),
        spark.emptyDataset[Long].toDF("vec_id"), path, 4L)
    }
    assert(e2.getMessage.contains("tombstone"), e2.getMessage)
    // ...until a compaction retires it — then the id is fresh again
    AnnIndex.compact(spark, path)
    AnnIndex.maintainBatch(vecs(Seq(5L)),
      spark.emptyDataset[Long].toDF("vec_id"), path, 4L)
    val live = vecs((1L to 31L).filterNot(_ == 5L))
      .unionByName(vecs(Seq(33L, 5L)))
    assert(collectEnc(AnnIndex.encodedState(spark, path)) ==
      collectEnc(Similarity.pqEncode(Similarity.ivfResiduals(
        live, AnnIndex.readCents(spark, path)),
        AnnIndex.readBooks(spark, path), keep = Seq("cell"))))
  }

  test("compactEvery bounds delta dirs; auto-compaction defers under a held lock") {
    import spark.implicits._
    val base = vecs(1L to 20L)
    val path = tmp("graft_annidx_ce")
    AnnIndex.build(base, path, Similarity.ivfTrainCents(base, c = 2),
      M, Ksub, Iters)
    def deltaDirsAboveBase: Int = {
      val bases = new java.io.File(path).listFiles().map(_.getName)
        .filter(n => n.startsWith("encbase-v") && n.drop(9).forall(_.isDigit))
        .map(_.drop(9).toLong)
      val b = bases.max
      val d = new java.io.File(s"$path/enc")
      if (!d.exists()) 0
      else d.listFiles().map(_.getName).filter(_.startsWith("batch="))
        .count(_.drop(6).toLong > b)
    }
    for (b <- 1L to 6L) {
      AnnIndex.maintainBatch(vecs(Seq(100L + b)),
        spark.emptyDataset[Long].toDF("vec_id"), path, b, compactEvery = 2)
      assert(deltaDirsAboveBase <= 2,
        s"delta dirs grew past compactEvery at batch $b")
    }
    // a held maintenance lock defers the auto-fold but the batch lands
    val lockFile = java.nio.file.Paths.get(path + ".compacting")
    java.nio.file.Files.createFile(lockFile)
    AnnIndex.maintainBatch(vecs(Seq(120L)),
      spark.emptyDataset[Long].toDF("vec_id"), path, 7L, compactEvery = 1)
    assert(new java.io.File(s"$path/enc/batch=7/_SUCCESS").exists(),
      "the batch must land despite the held lock")
    java.nio.file.Files.delete(lockFile)
    val live = vecs((1L to 20L) ++ (101L to 106L) :+ 120L)
    assert(collectEnc(AnnIndex.encodedState(spark, path)) ==
      collectEnc(Similarity.pqEncode(Similarity.ivfResiduals(
        live, AnnIndex.readCents(spark, path)),
        AnnIndex.readBooks(spark, path), keep = Seq("cell"))))
  }

  test("ensure is content-addressed: reuse on identical inputs, rebuild on partials, new path on changed corpus") {
    val n = vecs(1L to 25L)
    val cents = Similarity.ivfTrainCents(n, c = 2).persist()
    val p1 = AnnIndex.ensure("spec", n, cents, M, Ksub, Iters)
    val marker = new java.io.File(s"$p1/_GRAFT_INDEX_READY")
    assert(marker.exists())
    val mtime = new java.io.File(s"$p1/encbase-v0/_SUCCESS").lastModified()
    // identical inputs: same path, no rebuild
    assert(AnnIndex.ensure("spec", n, cents, M, Ksub, Iters) == p1)
    assert(new java.io.File(s"$p1/encbase-v0/_SUCCESS").lastModified() == mtime)
    // a changed corpus resolves a DIFFERENT path — stale reads impossible
    val p2 = AnnIndex.ensure("spec", vecs(1L to 26L), cents, M, Ksub, Iters)
    assert(p2 != p1)
    // a partial build (no ready marker) is wiped and redone
    assert(marker.delete())
    Thread.sleep(1100) // mtime granularity
    assert(AnnIndex.ensure("spec", n, cents, M, Ksub, Iters) == p1)
    assert(new java.io.File(s"$p1/_GRAFT_INDEX_READY").exists())
    assert(new java.io.File(s"$p1/encbase-v0/_SUCCESS").lastModified() > mtime)
    cents.unpersist()
  }
}
