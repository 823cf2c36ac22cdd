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
