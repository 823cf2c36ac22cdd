package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Registry of the intermediates the graft operators `persist()`.
  *
  * The LSH dedup / ANN operators cache intermediates that are read more
  * than once (shingle streams, quantized vectors). The cache is consumed
  * lazily — the operator returns a DataFrame whose plan reads the
  * persisted data — so the operator itself can never `unpersist()`
  * eagerly: only the caller knows when the result has been materialized.
  * And dropping the handle does NOT free anything: `Dataset.persist`
  * registers the plan with the SQL `CacheManager`, which holds it
  * strongly until an explicit uncache — a leaked handle is a permanent
  * storage-memory leak, which is why this registry exists.
  *
  * Leak discipline, in three tiers:
  *
  *  1. Operators whose persisted intermediate is provably no longer
  *     referenced by their RETURNED plan (e.g. the edge frame behind an
  *     iterative loop whose output is `localCheckpoint`ed) release it
  *     explicitly at exit via [[release]] — deterministic, no caller
  *     involvement.
  *  2. Long-lived library sessions opt into [[autoReleaseAfterActions]]:
  *     a `QueryExecutionListener` that releases every tracked
  *     intermediate once a caller-level action completes (at worst a
  *     later action recomputes). Operators that run INTERNAL actions
  *     over their persists (iterative loops, driver-model collects)
  *     wrap them in [[scoped]], which parks the auto-release until the
  *     operator exits — without it the listener would thrash the loop's
  *     cache every round.
  *  3. Harnesses call [[releaseAll]] at their own boundaries
  *     (`Bench`/`Verify` do, between queries).
  */
object GraftCache {
  private val tracked = mutable.ArrayBuffer.empty[DataFrame]
  private val activeScopes = new AtomicInteger(0)
  private val pendingSessions =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Persist `df` at MEMORY_AND_DISK and register it for [[releaseAll]]. */
  private[graft] def track(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  /** Eagerly unpersist one tracked intermediate — for operators that
    * KNOW their returned plan no longer reads it (checkpointed loops).
    */
  private[graft] def release(df: DataFrame): Unit = synchronized {
    try df.unpersist(blocking = false)
    catch { case _: Throwable => () }
    tracked.filterInPlace(_ ne df)
  }

  /** Marks a region that runs internal actions over tracked persists
    * (iterative supersteps, driver-model collects): the auto-release
    * listener defers while any scope is active, then runs once on exit
    * if an action completed meanwhile.
    */
  private[graft] def scoped[A](body: => A): A = {
    activeScopes.incrementAndGet()
    try body
    finally {
      if (activeScopes.decrementAndGet() == 0) {
        val it = pendingSessions.iterator()
        while (it.hasNext) {
          val sess = it.next(); it.remove(); releaseFor(sess)
        }
      }
    }
  }

  /** Unpersist only the intermediates belonging to `session` — the
    * auto-release unit: one enrolled session's actions must never evict
    * caches that concurrent work in ANOTHER session still reads.
    */
  def releaseFor(session: SparkSession): Unit = synchronized {
    tracked.filterInPlace { df =>
      if (df.sparkSession eq session) {
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
        false
      } else true
    }
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

  private class AutoRelease(sessionRef: java.lang.ref.WeakReference[SparkSession])
    extends QueryExecutionListener {
    private def fire(): Unit = {
      val sess = sessionRef.get()
      if (sess != null) {
        if (activeScopes.get() == 0) releaseFor(sess)
        else {
          pendingSessions.add(sess) // drained at scope exit
          // the last scope may have exited — and drained — between the
          // check above and the add, which would strand this session
          // pending forever (listener callbacks run on the async bus);
          // re-check and drain our own addition if we lost that race
          if (activeScopes.get() == 0 && pendingSessions.remove(sess))
            releaseFor(sess)
        }
      }
    }
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      fire()
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      fire()
  }

  /** Install the opt-in post-action auto-release on `spark` (idempotent
    * per session). After any caller-level action on THAT session
    * completes, every intermediate tracked for it is unpersisted — the
    * zero-ceremony mode for long-lived sessions that never call
    * [[releaseAll]] themselves. Holds the session weakly: enrollment
    * never pins a closed session's object graph.
    */
  def autoReleaseAfterActions(spark: SparkSession): Unit = synchronized {
    if (!autoSessions.contains(spark)) {
      autoSessions.add(spark)
      spark.listenerManager.register(
        new AutoRelease(new java.lang.ref.WeakReference(spark)))
    }
  }

  private val autoSessions: java.util.Set[SparkSession] =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
}
