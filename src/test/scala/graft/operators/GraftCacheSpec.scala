package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The operators persist intermediates through [[GraftCache]]; a
  * long-lived session must be able to release them all explicitly
  * instead of relying on a benchmark harness's clearCache().
  */
class GraftCacheSpec extends AnyFunSuite with SparkFixture {

  // Count persist()-style cached RDDs only: localCheckpoint RDDs (the
  // iterative operators' lineage cuts, e.g. Cluster.connectedComponents)
  // also appear in getPersistentRDDs but are lifecycle-managed by the
  // ContextCleaner once unreferenced, not by GraftCache.
  private def cachedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.values
      .count(!_.isCheckpointed)

  test("releaseAll unpersists every operator-persisted intermediate") {
    GraftCache.releaseAll() // isolate from other suites
    spark.catalog.clearCache()
    val docs = spark.range(0, 200).select(
      col("id").as("doc_id"),
      concat_ws(" ", lit("tok"), (col("id") % 7).cast("string"),
        lit("w"), (col("id") % 3).cast("string")).as("text"))
    // the single-aggregation LSH paths are persist-free by design
    val lsh = Dedup.minhashLshPairs(docs)
    assert(lsh.count() >= 0)
    assert(GraftCache.trackedCount === 0,
      "minhashLshPairs must not persist (bounded bucket collect, one pass)")
    val pairs = Dedup.jaccardPairs(docs)
    assert(pairs.count() >= 0) // materialize: persist() becomes live RDD blocks
    assert(GraftCache.trackedCount >= 1)
    assert(cachedRddCount >= 1)
    GraftCache.releaseAll()
    assert(GraftCache.trackedCount === 0)
    // unpersist(blocking=false) unregisters immediately even if block
    // deletion is async
    assert(cachedRddCount === 0)
  }

  test("iterative operators release their internal persists at exit") {
    GraftCache.releaseAll()
    spark.catalog.clearCache()
    import spark.implicits._
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("d1", "d2")
    // distributed tier: tracks the pair frame, contracts stars, checkpoints rounds
    val cc = Cluster.connectedComponents(chain, smallGraphThreshold = 0)
    assert(cc.count() == 51)
    assert(GraftCache.trackedCount === 0,
      "connectedComponents must release its edge frame at exit")
    assert(cachedRddCount === 0,
      "no persist()-style cache may outlive the operator (checkpoints excluded)")
  }

  test("opt-in auto-release frees intermediates after caller actions") {
    GraftCache.releaseAll()
    spark.catalog.clearCache()
    // separate session: the listener is per-session, so it dies with
    // this test instead of following the JVM-shared fixture session
    val s2 = spark.newSession()
    GraftCache.autoReleaseAfterActions(s2)
    def drain(): Unit = {
      var tries = 0
      while (GraftCache.trackedCount > 0 && tries < 100) { Thread.sleep(50); tries += 1 }
    }
    val pairs = Dedup.jaccardPairs(s2.range(0, 60).select(
      col("id").as("doc_id"),
      concat_ws(" ", lit("w"), (col("id") % 5).cast("string"),
        lit("z"), (col("id") % 4).cast("string")).as("text")))
    assert(pairs.count() >= 0) // caller-level action
    drain() // listener is async (ExecutionListenerBus)
    assert(GraftCache.trackedCount === 0,
      "auto-release must free tracked intermediates after the action")
    assert(cachedRddCount === 0)
    // iterative operators stay correct under auto-release: the scoped{}
    // guard defers the listener during internal supersteps/collects
    import s2.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("d1", "d2")
    val cc = Cluster.connectedComponents(chain, smallGraphThreshold = 0)
    assert(cc.select(countDistinct(col("cluster"))).collect()(0).getLong(0) == 1L)
    val km = Similarity.kmeansAssign(
      (0L until 30L).map(i => (i, Seq(i % 5, i % 3), (i % 5) * (i % 5) + (i % 3) * (i % 3)))
        .toDF("vec_id", "q", "nrm"), k = 3, iters = 3)
    assert(km.count() == 30)
    drain()
    assert(GraftCache.trackedCount === 0)
    assert(cachedRddCount === 0)
  }

  test("result stays correct after releaseAll (recompute, not dangle)") {
    val docs = spark.range(0, 50).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0, lit("a b c d e")).otherwise(lit("v w x y z")).as("text"))
    val pairs = Dedup.jaccardPairs(docs)
    val before = pairs.count()
    GraftCache.releaseAll()
    assert(pairs.count() === before) // plan recomputes the unpersisted input
  }
}
