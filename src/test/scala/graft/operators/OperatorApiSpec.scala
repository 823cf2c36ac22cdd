package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dedup/similarity/text operators are a LIBRARY, not demo queries:
  * each takes any DataFrame with caller-named columns. These tests run
  * them on synthetic frames whose columns are named nothing like the
  * gate tables'.
  */
class OperatorApiSpec extends AnyFunSuite with SparkFixture {

  private def docs = {
    import spark.implicits._
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (12L, "the quick brown fox leaps over the lazy dog"), // near dup
      (13L, "completely different content entirely here now")
    ).toDF("id", "body")
  }

  test("exactDedup collapses byte-identical texts under any column names") {
    val out = exactDedupSorted()
    assert(out.length == 3)
    val dup = out.find(_._1 == 10L).get
    assert(dup._2 == 2L, "both copies counted")
  }

  private def exactDedupSorted(): Array[(Long, Long)] = {
    import spark.implicits._
    Dedup.exactDedup(docs, idCol = "id", textCol = "body")
      .select(col("survivor"), col("n_copies"))
      .as[(Long, Long)].collect().sortBy(_._1)
  }

  test("jaccardPairs + minhashLshPairs + simhashPairs find the near-dup pair") {
    import spark.implicits._
    val jac = Dedup.jaccardPairs(docs, "id", "body")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(jac.contains((10L, 12L)), s"jaccard missed the near-dup: $jac")
    val mh = Dedup.minhashLshPairs(docs, "id", "body")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(mh.contains((10L, 12L)), s"minhash missed the near-dup: $mh")
    val sp = Dedup.simhashPairs(docs, "id", "body")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(sp.contains((10L, 12L)), s"simhash missed the near-dup: $sp")
    // the unrelated doc never pairs with anything
    assert(!(jac ++ mh ++ sp).exists(p => p._1 == 13L || p._2 == 13L))
  }

  test("ann operators run over quantize() of caller-named embedding frames") {
    import spark.implicits._
    val vecs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 7 + j) % 13 - 6) / 10.0f))
    }.toDF("key", "vec")
    val n = EmbeddingLsh.quantize(vecs, idCol = "key", vecCol = "vec")
    val bf = Similarity.annBruteForce(n, col("vec_id") % 4 === 0, k = 3)
    val rows = bf.collect()
    assert(rows.length == 9, s"3 queries x top-3: ${rows.length}") // 0,4,8
    val ivf = Similarity.annIvf(n, col("vec_id") % 4 === 0,
      col("vec_id") % 3 === 0, nprobe = 2, k = 3).collect()
    assert(ivf.nonEmpty)
    // every IVF hit is for a declared query, never self, at most k each
    assert(ivf.forall(r => r.getLong(0) % 4 == 0 && r.getLong(0) != r.getLong(1)))
    assert(ivf.groupBy(_.getLong(0)).values.forall(_.length <= 3))
  }

  test("text analysis operators accept caller-named columns") {
    val ts = TextAnalysis.tokenStats(docs, "id", "body").collect()
    assert(ts.length == 4 && ts.forall(_.getInt(1) > 0))
    val q = TextAnalysis.qualityScore(docs, "id", "body").collect()
    assert(q.forall(r => r.getDouble(4) <= 1.0))
    val fp = TextAnalysis.fingerprints(docs, "id", "body").collect()
    assert(fp.map(_.getLong(1)).distinct.length == 3) // dup texts share fp
  }

  test("curate dedups, gates on quality+language, budgets tokens") {
    import spark.implicits._
    val out = Curation.curate(docs, idCol = "id", textCol = "body")
      .select("doc_id", "n_tokens", "n_bpe_tokens")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    // doc 11 (exact dup of 10) is gone; the fox docs pass the 'en'
    // density gate ("the" twice in 9 tokens); doc 13 has zero stopwords
    // and fails the language gate
    assert(out.map(_._1).toSeq == Seq(10L, 12L), out.mkString(","))
    assert(out.forall(r => r._2 == 9 && r._3 == 9))
    // tightening the quality threshold to require ALL-distinct non-stop
    // tokens drops the fox docs too ("the" repeats: nd-sh=7 < 9)
    val strict = Curation.curate(docs, "id", "body", qualityNum = 1, qualityDen = 1)
    assert(strict.count() == 0)
  }
}
