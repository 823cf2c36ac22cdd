package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry of the intermediates the graft operators `persist()`.
  *
  * The LSH dedup / ANN operators cache intermediates that are read more
  * than once (shingle streams, band signatures, quantized vectors). The
  * cache is consumed lazily — the operator returns a DataFrame whose
  * plan reads the persisted data — so the operator itself can never
  * `unpersist()`: only the caller knows when the result has been
  * materialized. Without a hook, a long-lived session running these
  * operators accumulates storage memory until eviction thrash sets in.
  *
  * Every persist the operators issue therefore goes through [[track]],
  * and a session calls [[releaseAll]] once it has materialized the
  * results of a pipeline step (`Bench`/`Verify` do this between
  * queries). The registry holds the Dataset handles (a few dozen bytes
  * of plan wrapper each — the heavy part is the cached blocks, which
  * releaseAll frees); a caller that instead clears the whole cache
  * (`spark.catalog.clearCache()`) frees the same blocks, and the next
  * releaseAll drops the stale handles.
  */
object GraftCache {
  private val tracked = mutable.Buffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and register it for [[releaseAll]]. */
  private[graft] def track(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  /** Unpersist every intermediate the operators have persisted since
    * the last call. Non-blocking; safe to call at any point — at worst
    * a later consumer recomputes the intermediate.
    */
  def releaseAll(): Unit = synchronized {
    tracked.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    tracked.clear()
  }

  /** Number of tracked intermediates — test hook. */
  def trackedCount: Int = synchronized(tracked.size)
}
