package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming extension (SURVEY §2.7: the reference is
  * batch-only — every exec declares `Boundedness::Bounded` — so this is
  * the north-star extension, not parity): the same declarative
  * transforms the batch engine runs, over an unbounded `events` stream.
  *
  * The seams are exactly where SURVEY points:
  *   - source: any streaming DataFrame with (ts, event_type, value) —
  *     `readStream` on files/Kafka in production, `MemoryStream` in
  *     tests;
  *   - transform: event-time windowed aggregation with a watermark
  *     bounding state (at 100 TB/day the watermark IS the memory
  *     budget: state per key×window is dropped once the watermark
  *     passes);
  *   - sink: `writeStream` with append semantics — finalized windows
  *     only, so downstream JDBC/document sinks receive each window
  *     exactly once.
  */
object EventStream extends org.apache.spark.internal.Logging {

  /** Per-(hour window, event_type) count + exact DECIMAL sum of value,
    * with `lateness` watermark. Append-mode compatible: a window emits
    * only when the watermark guarantees it is complete.
    */
  def hourlyAggregate(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("hour_ts"),
        col("event_type"), col("n"), col("total_value"))

  /** Embedding-drift monitor: per event-time window, the augmented
    * Gramian of a quantized embedding stream — count (cell 0,0),
    * per-dimension sums (row 0) and the full second-moment matrix in
    * ONE mergeable O(d²) aggregate ([[graft.functions.GramAgg]] runs
    * inside the streaming state store like any built-in typed
    * aggregate; the watermark evicts closed windows, so state is
    * #open-windows × d²/2 longs regardless of stream rate). Downstream
    * monitors derive per-window mean/variance/covariance drift from
    * the exact integers with no second pass — the streaming
    * counterpart of the batch q138/q139 statistics.
    *
    * Input: (ts, q ARRAY<BIGINT>) — a quantized embedding stream.
    * Append-mode compatible.
    */
  def driftStats(vecs: DataFrame, windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    vecs
      .select(col("ts"), graft.functions.Gram.augmented(col("q")).as("q"))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.functions.Gram.gram(col("q")).as("gm"))
      .select(col("window.start").as("window_ts"), col("gm"))

  /** Streaming exact dedup for a document ingest pipeline: only the
    * FIRST arrival of each content fingerprint survives; re-arrivals
    * within the watermark are dropped, and fingerprint state older
    * than the watermark is evicted — so state is bounded by ingest
    * rate × lateness, not corpus size (the property that makes
    * streaming dedup viable at 100 TB/day; a duplicate arriving after
    * eviction is the documented at-least-once trade, and the batch
    * q40 pass downstream catches it).
    *
    * Input: (ts, doc_id, text); the fingerprint is the same md5-derived
    * 60-bit hash the batch dedup family uses ([[graft.functions.CrossHash]]).
    */
  def dedupStream(docs: DataFrame, lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", graft.functions.CrossHash.h60(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Gap-based sessionization with explicit custom state — the
    * `flatMapGroupsWithState` seam for semantics the declarative
    * operators can't express (here: emit each CLOSED session's span
    * and event count per key). State per key is one (start, last, n)
    * triple; an event-time timeout closes idle sessions when the
    * watermark passes last+gap, so state is bounded by live keys.
    * (For plain session windows prefer the built-in `session_window`;
    * this is deliberately the custom-state escape hatch, kept tiny.)
    */
  /** Open-session state: epoch-second bounds + event count. */
  case class Sess(start: Long, last: Long, n: Long)

  /** A closed session as emitted downstream. */
  case class Session(event_type: String, session_start: Long,
      session_end: Long, n_events: Long)

  /** Stream → remote-store sink: append each micro-batch to a catalog
    * table (`cat.ns.t` — e.g. a [[graft.sources.jdbc.GraftCatalog]]
    * JDBC table) through the engine's DSv2 write path, closing the
    * source → transform → sink loop SURVEY §2.7 sketches.
    *
    * Each micro-batch lands as one transactional append per partition
    * (the same staged, retry-classified path batch writes use), and the
    * checkpoint makes the stream resumable. Delivery is at-least-once
    * across batch RETRIES (a batch replayed after a sink-side commit
    * re-appends); for exactly-once effect on stores with a key, create
    * the table with `upsertmode` + `key` options so the replayed rows
    * overwrite themselves idempotently.
    */
  def sinkTo(df: DataFrame, table: String, checkpointDir: String,
      queryName: String = "graft_sink"): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.writeTo(table).append()
      }
      .start()

  /** Streaming LAKE ingest: each micro-batch is merged into a
    * date-partitioned parquet table through the batch
    * [[graft.operators.Layout.mergeInto]] — replace-by-key for
    * corrections and replays, insert for new rows, every untouched
    * date directory left byte-identical. The first micro-batch
    * bootstraps the table (mergeInto's partitioned initial write).
    *
    * Exactly-once EFFECT over streaming's at-least-once delivery, by
    * the same keyed-idempotence argument as [[maintainTo]]: a replayed
    * micro-batch re-merges the same keys into the same partitions and
    * the table is unchanged. Late data needs no special path — a
    * 3-day-late correction simply touches (and rewrites) 1 of N date
    * directories, which is the whole point of partition-scoped
    * maintenance at 100 TB/day. [[graft.operators.Layout.compactPartitioned]]
    * is the periodic companion pass when many small merges fragment a
    * hot partition.
    *
    * Lock contention (ADVICE r13): a micro-batch that fires while
    * [[graft.operators.Layout.compactAndSwap]] holds the shared
    * maintenance lock must NOT fail the streaming query permanently —
    * a swap is seconds long and the ingest would otherwise need a
    * restart-from-checkpoint for a routine maintenance overlap. The
    * merge retries on lock contention with linear backoff, bounded at
    * `lockWaitMs` total (default 60 s — generously past any swap; a
    * lock STILL held then is a crashed maintainer, which is exactly
    * when failing the query loudly is right).
    */
  def ingestTo(updates: DataFrame, path: String, partCol: String,
      key: String, checkpointDir: String,
      queryName: String = "graft_lake_ingest",
      lockWaitMs: Long = 60000L): StreamingQuery =
    updates.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deadline = System.nanoTime() + lockWaitMs * 1000000L
        var delay = 250L
        var done = false
        while (!done) {
          try {
            // surgical path PINNED (rewriteShare = ∞): ingest's contract
            // is partition-scoped — untouched date dirs byte-identical
            // across micro-batches (the restart/idempotence arguments
            // lean on it), and a young table's early batches routinely
            // exceed any share threshold (new-day partitions count as
            // touched). Full rewrites are the maintenance pass's job
            // (compactAndSwap), not the ingest seam's.
            graft.operators.Layout.mergeInto(
              batch.sparkSession, path, batch, partCol, key,
              rewriteShare = Double.PositiveInfinity)
            done = true
          } catch {
            case e: IllegalStateException
                if e.getMessage != null &&
                  e.getMessage.startsWith("maintenance lock") &&
                  System.nanoTime() < deadline =>
              Thread.sleep(math.min(delay, 2000L))
              delay += 250L
          }
        }
      }
      .start()

  /** Streaming CCNet LM quality gate: documents arrive as a stream,
    * each micro-batch is scored against a STATIC, offline-trained LM
    * table ([[graft.operators.TextAnalysis.lmTable]]'s (w1, w2, ppm)
    * shape) with [[graft.operators.TextAnalysis.lmScoreAgainst]], and
    * survivors (lm_ppm ≥ `thrPpm`, out-of-vocabulary bigrams penalized
    * at 0 ppm) are appended to `path` with their scores. This is the
    * deployment shape of the q154/q155 batch gate: train the LM once on
    * a reference corpus, gate data AS IT ARRIVES — the filter decision
    * for a document is identical whether it flows through this stream
    * or through the batch operator, because each micro-batch scores
    * through the same deterministic integer arithmetic against the same
    * static table (per-doc scores depend only on the doc and the LM,
    * never on batch boundaries — exactly why the parity spec can assert
    * set equality).
    *
    * Exactly-once EFFECT over at-least-once delivery: scoring is
    * deterministic and each micro-batch OVERWRITES its own
    * `batch=<id>` subdirectory — a replayed batch (crash between the
    * sink write and the checkpoint commit) rewrites the same directory
    * with the same rows instead of appending a duplicate copy (a plain
    * `mode("append")` here would silently double the kept corpus on
    * every replay; [[lmGateBatch]] is factored out so the spec can
    * assert the idempotence directly). Sub-2-token documents carry no
    * LM evidence and are dropped (they fail every downstream gate's
    * n≥2 precondition anyway).
    */
  def lmFilterTo(docs: DataFrame, lm: DataFrame, thrPpm: Long,
      path: String, checkpointDir: String,
      queryName: String = "graft_lm_gate"): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        lmGateBatch(batch, lm, thrPpm, path, batchId)
      }
      .start()

  /** One [[lmFilterTo]] micro-batch: score, gate, overwrite the
    * batch-scoped directory. Idempotent by construction — calling it
    * twice with the same `batchId` (streaming's at-least-once replay)
    * leaves exactly one copy of the batch's survivors. A batch with
    * ZERO survivors writes NOTHING (ADVICE r15): an all-empty parquet
    * directory has no readable footer, so `spark.read.parquet` on the
    * kept corpus would fail schema inference for early consumers that
    * arrive before the first survivor. An empty batch also DELETES any
    * pre-existing `batch=<id>` dir (ADVICE r16): a restart that raised
    * `thrPpm` or swapped the LM can replay a previously non-empty batch
    * as empty, and the stale survivors must not outlive the new gate.
    */
  private[graft] def lmGateBatch(batch: DataFrame, lm: DataFrame,
      thrPpm: Long, path: String, batchId: Long): Unit = {
    val kept = graft.operators.TextAnalysis.lmScoreAgainst(batch, lm)
      .filter(col("lm_ppm") >= thrPpm)
      .persist()
    try {
      if (!kept.isEmpty)
        kept.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      else {
        // a replayed batch can go empty when a restart RAISED thrPpm (or
        // swapped the LM): the prior attempt's batch dir would otherwise
        // survive as stale survivors the now-empty replay never clears
        // (ADVICE r16) — delete it, preserving both the no-empty-parquet
        // rule and idempotence under changed gate parameters
        val d = new org.apache.hadoop.fs.Path(s"$path/batch=$batchId")
        val fs = d.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
        if (fs.exists(d)) fs.delete(d, true)
      }
    } finally kept.unpersist()
  }

  /** Streaming BM25 index maintenance (the q157 + maintained-state
    * composition, VERDICT r15 #8): every micro-batch of an APPEND-ONLY
    * document stream lands its per-doc index rows ([[
    * graft.operators.TextAnalysis.bm25Tf]]: doc_id, dl, tf_i) in a
    * batch-scoped overwrite directory, then the 1-row corpus statistics
    * are recomputed FROM the durable tf table and overwritten — the
    * lmFilterTo discipline: ALL state lives in the durable target, not
    * the state store, so a replayed micro-batch (at-least-once
    * delivery) rewrites its own rows and re-derives the same stats
    * instead of double-counting. Re-ingesting a doc_id in a LATER batch
    * is the caller's dedup problem (q80's operator), exactly as for the
    * LM gate's kept corpus.
    *
    * Query side: [[bm25TopKFromIndex]] scores the maintained table with
    * the SAME shared scoring half as the batch gate
    * ([[graft.operators.TextAnalysis.bm25ScoreFrames]]), so the
    * streamed index and the batch q157 answer cannot diverge
    * arithmetically — EventStreamSpec pins top-k equality bit-for-bit
    * across micro-batch boundaries and under replay.
    */
  def bm25IndexTo(docs: DataFrame, terms: Seq[String], path: String,
      checkpointDir: String,
      queryName: String = "graft_bm25_index",
      reapDrainMs: Long = 0L, compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        bm25IndexBatch(batch, terms, path, batchId, reapDrainMs, compactEvery)
      }
      .start()

  /** One [[bm25IndexTo]] micro-batch: overwrite the batch's tf rows,
    * then publish the corpus stats INCREMENTALLY as a new versioned
    * directory `stats-v<batchId>` (VERDICT r16 #3 / ADVICE r16). Two
    * defects of the r16 shape are gone:
    *
    *  - ATOMICITY for readers: the old single `stats` dir was rewritten
    *    with `mode("overwrite")` (delete-then-write), so a concurrent
    *    [[bm25TopKFromIndex]] could catch a missing/footer-less dir.
    *    Versions are immutable once `_SUCCESS`-complete; readers resolve
    *    the newest COMPLETE version, so they see old-or-new, never
    *    neither. The previous version survives one more publish for
    *    readers that already resolved it (older ones are reaped).
    *  - COST: the old shape re-aggregated ALL prior tf batches every
    *    micro-batch (O(batches²) IO over stream life). Stats are all
    *    sums (n_docs, totlen, df_i), so the new version is the previous
    *    1-row version PLUS this batch's 1-row delta — O(1) per batch.
    *
    * Replay-idempotent: a `_SUCCESS`-complete `stats-v<batchId>` means
    * this batch's delta is already folded in (scoring is deterministic),
    * so the replay rewrites only its tf rows and SKIPS the stats — the
    * double-count an unconditional re-add would cause cannot happen.
    * Zero-doc batches write nothing (the lmGateBatch empty-footer rule)
    * and publish no version — version ids may have gaps. Single
    * maintainer per path assumed (micro-batches are sequential within
    * the query); a version NEWER than the current batch is refused
    * loudly rather than merged backwards.
    */
  private[graft] def bm25IndexBatch(batch: DataFrame, terms: Seq[String],
      path: String, batchId: Long,
      reapDrainMs: Long = 0L, compactEvery: Int = 0): Unit =
    bm25MaintainBatch(batch.withColumn("deleted", lit(false)),
      terms, path, batchId, reapDrainMs, compactEvery)

  /** Streaming BM25 index maintenance with DELETION (VERDICT r16 #8 —
    * the first mutation the append-only seam could not express): the
    * stream carries (doc_id, text, deleted); adds land tf rows exactly
    * as [[bm25IndexTo]], deletes land doc_id TOMBSTONES in batch-scoped
    * overwrite dirs (the same durable-state discipline — nothing lives
    * in the state store), and the stats version subtracts the
    * newly-tombstoned docs' own tf rows, so the published statistics
    * re-derive to exactly what a full recompute over (tf ∖ tombstones)
    * would say. [[bm25TopKFromIndex]] anti-joins the tombstone set, so
    * a deleted document vanishes from both the candidate stream and
    * the statistics atomically at the version flip.
    *
    * Tombstones are FINAL while live: re-adding a tombstoned doc_id is
    * refused loudly (the curation layers above never reuse ids; silently
    * re-adding would leave stats counting a doc the reader drops). A
    * [[bm25Compact]] fold RETIRES its tombstones — the docs are gone
    * from the compacted generation, so the ids become reusable as fresh
    * documents. A within-batch add+delete of the same id nets to zero
    * (the add's delta is folded, then its rows are subtracted as new
    * tombstones).
    *
    * IO shape per batch (VERDICT r17 #2 — the delete path must not
    * regrow the O(batches²) class the r17 stats fix removed): every
    * publish reads ONE prior stats version, ONE live tombstone snapshot
    * (`tomb-v<id>`, published beside every stats version), and — only
    * when the batch deletes — the current tf generation (compacted base
    * + deltas above it). With `compactEvery` > 0 the index folds itself
    * every that-many delta dirs, so per-batch dirs-read is O(compactEvery),
    * independent of stream life. `reapDrainMs` age-gates the version
    * reap for readers slower than the default two-publish drain window
    * (see [[bm25TopKFromIndex]]).
    */
  /** Streaming maintenance of the persisted IVFADC ANN index (the r19
    * [[graft.operators.AnnIndex]] artifact — completing VERDICT r18
    * #1's deployment story: train once offline, maintain from the
    * stream, query many): the stream carries (vec_id, q, nrm, deleted);
    * adds encode against the FROZEN quantizer, deletes tombstone — each
    * micro-batch is one [[graft.operators.AnnIndex.maintainBatch]]
    * keyed by the checkpointed batch id (+1: the build itself published
    * version 0), so at-least-once delivery is safe (published replays
    * skip) and the postings/tombstones flip together for concurrent
    * [[graft.operators.AnnIndex.search]] readers. The index must be
    * [[graft.operators.AnnIndex.build]]t first — the model is frozen by
    * contract; a streaming seam must never silently re-train under
    * readers (quantizer drift is reset by an explicit re-build).
    * `compactEvery`/`reapDrainMs` are the BM25 index's knobs verbatim.
    */
  def annIndexTo(muts: DataFrame, path: String, checkpointDir: String,
      queryName: String = "graft_ann_index",
      reapDrainMs: Long = 0L, compactEvery: Int = 0): StreamingQuery =
    muts.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.AnnIndex.maintainBatch(
          batch.filter(!col("deleted")).select("vec_id", "q", "nrm"),
          batch.filter(col("deleted")).select("vec_id"),
          path, batchId + 1, reapDrainMs, compactEvery)
      }
      .start()

  def bm25MaintainTo(muts: DataFrame, terms: Seq[String], path: String,
      checkpointDir: String,
      queryName: String = "graft_bm25_maintain",
      reapDrainMs: Long = 0L, compactEvery: Int = 0): StreamingQuery =
    muts.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        bm25MaintainBatch(batch, terms, path, batchId, reapDrainMs, compactEvery)
      }
      .start()

  private[graft] def bm25MaintainBatch(batch: DataFrame, terms: Seq[String],
      path: String, batchId: Long,
      reapDrainMs: Long = 0L, compactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    val adds = batch.filter(!col("deleted")).select(col("doc_id"), col("text"))
    val dels = batch.filter(col("deleted")).select(col("doc_id")).distinct()
      .persist()
    val tfd = graft.operators.TextAnalysis.bm25Tf(adds, terms).persist()
    try {
      val hasAdds = !tfd.isEmpty
      val hasDels = !dels.isEmpty
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val versions = statsVersions(fs, path)
      // publish iff there is anything to fold: adds always; deletes only
      // once an index exists (a tombstone against an empty index has
      // nothing to subtract — and a later add of that id is refused)
      val publish = !versions.contains(batchId) &&
        (hasAdds || (hasDels && versions.nonEmpty))
      // ALL refusals fire BEFORE any write (r18): the r17 order rewrote
      // tf/batch=<id> — transiently deleting its _SUCCESS — and only
      // then refused, leaving a mid-flight mutation behind the error.
      if (publish)
        // a replayed batch whose version survives skips publish below;
        // one whose version is GONE beside newer versions is a second
        // maintainer or rewound checkpoint — refuse, never merge
        // a delta backwards into stats that already contain it
        require(versions.forall(_ <= batchId),
          s"bm25MaintainBatch: stats version newer than batch $batchId " +
            s"exists (${versions.max}) — a second maintainer or a " +
            "rewound checkpoint is writing this path; refusing")
      val prev = versions.maxOption
      val baseId = tfBases(fs, path).maxOption.getOrElse(-1L)
      // prior LIVE tombstones: ONE compacted snapshot dir (tomb-v<prev>,
      // written beside every stats version — VERDICT r17 #2: the r17
      // shape re-read EVERY tombstone batch dir per publish), minus
      // entries a newer compaction has since folded into the base
      // generation (their docs are already absent from tfbase, so they
      // are retired from the live set — and from the re-add refusal:
      // compaction permanently retires an id, see [[bm25Compact]]).
      // Bootstrap (no version yet) folds the batch-scoped dirs once.
      val prior: Option[DataFrame] = prev match {
        case Some(p) => tombSnapshot(spark, fs, path, p)
          .map(_.filter(col("tb") > baseId))
        case None =>
          val dirs = completeBatchDirs(fs, s"$path/tombstones")
            .filter(_._1 != batchId)
          if (dirs.isEmpty) None
          else Some(dirs.map { case (id, d) =>
            spark.read.parquet(d).select(col("doc_id"), lit(id).as("tb"))
          }.reduce(_ unionByName _))
      }
      if (publish) prior.foreach { p =>
        require(tfd.join(p.select("doc_id"), Seq("doc_id"), "left_semi").isEmpty,
          "bm25MaintainBatch: batch re-adds a tombstoned doc_id — " +
            "tombstones are final (until a compaction retires the id); " +
            "ingest under a fresh id")
      }
      // bootstrap refusal HOISTED above the batch-dir writes (ADVICE
      // r18): it depends only on fs state computed above (tf batch dirs
      // and baseId), and the `_ != batchId` filter makes the pre- vs
      // post-write evaluation identical — firing it after the writes
      // would leave a complete tf/batch=<id> (and tombstone) orphan
      // behind the error that a FOREIGN maintainer's later batch ids
      // could silently fold into its stats
      if (publish && prev.isEmpty) {
        val foreign = completeBatchDirs(fs, s"$path/tf")
          .map(_._1).filter(_ != batchId)
        require(foreign.isEmpty && baseId < 0,
          s"bm25MaintainBatch: tf state (batches ${foreign.mkString(",")}" +
            s"${if (baseId >= 0) s", base $baseId" else ""}) " +
            "exists with no stats version — a pre-versioned-stats or " +
            "foreign-checkpoint index; refusing to bootstrap over it " +
            "(rebuild it into a fresh path)")
      }
      // batch-dir writes, SKIPPED on a published replay (ADVICE r17):
      // content is deterministic and the dir is _SUCCESS-complete with
      // its stats version live, so rewriting would only delete-then-
      // rewrite the dir under concurrent version-consistent readers
      def dirComplete(root: String) = fs.exists(new org.apache.hadoop.fs.Path(
        s"$path/$root/batch=$batchId/_SUCCESS"))
      val published = versions.contains(batchId)
      if (hasAdds && !(published && dirComplete("tf")))
        tfd.write.mode("overwrite").parquet(s"$path/tf/batch=$batchId")
      if (hasDels && !(published && dirComplete("tombstones")))
        dels.write.mode("overwrite").parquet(s"$path/tombstones/batch=$batchId")
      if (publish) {
        val merged = prev match {
          case None =>
            // BOOTSTRAP (r17 review): the first version must COVER
            // exactly what the reader will score at v — a delta-only
            // first version over a PRE-EXISTING tf tree (a
            // pre-versioned-stats index, or a foreign checkpoint whose
            // batch ids restart and would silently OVERWRITE legacy tf
            // dirs) would mis-normalize every later score; the foreign
            // tree was refused loudly ABOVE, before any write. On a
            // fresh path the bootstrap is this batch's rows minus its
            // own deletes (earlier dels-only batches tombstoned ids
            // that were never added — the re-add require above keeps
            // them disjoint from tfd). Deterministic, so replay-safe.
            graft.operators.TextAnalysis.bm25Stats(
              tfd.join(dels, Seq("doc_id"), "left_anti"), terms.size)
          case Some(p) =>
            val nCols = 2 + terms.size
            val deltas = Seq.newBuilder[DataFrame]
            deltas += spark.read.parquet(s"$path/stats-v$p")
            if (hasAdds)
              deltas += graft.operators.TextAnalysis.bm25Stats(tfd, terms.size)
            if (hasDels) {
              val newTomb = prior.fold(dels)(pr =>
                dels.join(pr.select("doc_id"), Seq("doc_id"), "left_anti"))
              // the newly-tombstoned docs' own rows, read from the
              // CURRENT GENERATION only — the compacted base plus the
              // delta dirs above it, id-bounded at this batch (ADVICE
              // r17: an unbounded read would also count a rewound
              // checkpoint's never-published tf batch). With periodic
              // compaction this is O(compactEvery) dirs, not O(stream
              // life) — the delete-path twin of the r17 stats fix.
            val tombTf = tfState(spark, fs, path, batchId)
                .getOrElse(tfd.limit(0))
                .join(broadcast(newTomb), Seq("doc_id"), "left_semi")
              val neg = graft.operators.TextAnalysis.bm25Stats(tombTf, terms.size)
              deltas += neg.select(neg.columns.map(c => (-col(c)).as(c)): _*)
            }
            val frames = deltas.result()
            val cols = frames.head.columns
            assert(cols.length == nCols)
            frames.reduce(_ unionByName _)
              .agg(sum(col(cols.head)).as(cols.head),
                cols.tail.map(c => sum(col(c)).as(c)): _*)
        }
        merged.write.mode("overwrite").parquet(s"$path/stats-v$batchId")
        // the live tombstone snapshot published WITH the version: prior
        // live entries plus this batch's genuinely-new tombstones, each
        // carrying its tombstoning batch id (the provenance a later
        // compaction's fold uses). repartition(1): the live set is
        // bounded by deletes-since-last-compaction, and an EMPTY
        // snapshot must still write one footer-carrying file
        val newTomb = prior.fold(dels)(pr =>
          dels.join(pr.select("doc_id"), Seq("doc_id"), "left_anti"))
          .select(col("doc_id"), lit(batchId).as("tb"))
        prior.fold(newTomb)(_ unionByName newTomb).repartition(1)
          .write.mode("overwrite").parquet(s"$path/tomb-v$batchId")
        // reap all but the just-published and the previous version
        // (the previous drains for readers that resolved it pre-publish;
        // older ones age-gate on reapDrainMs — see [[bm25TopKFromIndex]]'s
        // drain contract)
        val keep = Set(batchId) ++ prev
        def reapOld(prefix: String): Unit = {
          val vs = versionedDirs(fs, path, prefix)
          vs.filterNot(keep).foreach { v =>
            // v was superseded no later than the publish of the next
            // version above it — reap only once that publish has aged
            // past the drain window (the FileSwap retire+drain discipline)
            val sup = vs.filter(x => x > v && x != batchId).minOption
            val aged = reapDrainMs <= 0L || sup.exists { s =>
              val succ = new org.apache.hadoop.fs.Path(s"$path/$prefix$s/_SUCCESS")
              System.currentTimeMillis() -
                fs.getFileStatus(succ).getModificationTime >= reapDrainMs
            }
            if (aged)
              fs.delete(new org.apache.hadoop.fs.Path(s"$path/$prefix$v"), true)
          }
        }
        reapOld("stats-v")
        reapOld("tomb-v")
        // self-maintaining index: once the delta-dir count above the
        // base generation reaches compactEvery, fold them (the inline
        // trigger keeps the single-maintainer contract — no second
        // process races the micro-batch sequence)
        if (compactEvery > 0) {
          val b = tfBases(fs, path).maxOption.getOrElse(-1L)
          if (completeBatchDirs(fs, s"$path/tf").count(_._1 > b) >= compactEvery)
            // AUTO-triggered path: the batch's own publish already
            // succeeded, so lock contention (a held or crash-left
            // maintenance lock) must NOT fail-stop the streaming query —
            // log and defer; the threshold re-fires on the next
            // publishing batch. Explicit bm25Compact calls keep the
            // loud throw. (ADVICE r18)
            try bm25Compact(spark, path)
            catch { case e: IllegalStateException =>
              logWarning(
                s"bm25MaintainBatch: auto-compaction of $path deferred — " +
                  s"maintenance lock contended (${e.getMessage}); the " +
                  "fold re-triggers on the next publishing batch")
            }
        }
      }
    } finally { tfd.unpersist(); dels.unpersist() }
  }

  /** Fold the maintained BM25 index's delta dirs into ONE compacted
    * generation — the long-run reset the r17 Scaladoc promised
    * (VERDICT r17 #2), [[graft.operators.Layout.compactAndSwap]]'s
    * out-of-place + publish-by-generation + retire-for-drain discipline
    * composed over tf ∖ tombstones, under the SAME maintenance lock
    * ([[graft.operators.Layout.acquireMaintenanceLock]]'s atomic
    * `<path>.compacting` create). The lock is FAIL-STOP, not queueing:
    * an explicit call into a held (or crash-left) lock throws
    * `IllegalStateException` loudly; only the AUTO-trigger inside
    * [[bm25MaintainBatch]] catches that contention and defers the fold
    * to the next publishing batch (ADVICE r18) — the batch's own
    * publish has already succeeded and must not fail the stream.
    *
    * Mechanics, at the newest complete stats version v:
    *   - live rows = (base generation ∪ delta dirs (base, v]) anti-join
    *     the tomb-v<v> snapshot — written as the immutable generation
    *     `tfbase-v<v>` (`_SUCCESS`-gated like every other read of this
    *     tree; a crashed partial is invisible and rewritten on retry).
    *     The published STATS are untouched: stats-v<v> already equals
    *     the recompute over tf ∖ tombstones, which is exactly what the
    *     new generation holds — EventStreamSpec pins top-k bit-for-bit
    *     across the fold.
    *   - the folded delta/tombstone dirs are NOT deleted here: a
    *     version-consistent reader that resolved v pre-fold still holds
    *     them (its base resolution ignores the newer generation), so
    *     they drain for one full compaction cycle and the NEXT call
    *     reaps everything at or below the PREVIOUS base — the same
    *     previous-generation-drains rule as the stats reap.
    *   - tombstones folded into a generation are RETIRED: the next
    *     stats publish drops them from the live snapshot (`tb` ≤ base),
    *     so the read path's anti-join set is bounded by deletes since
    *     the last fold, not stream life — and a retired doc_id becomes
    *     re-usable (the tombstone-is-final refusal covers live
    *     tombstones; after the fold the id is simply absent, and
    *     re-ingesting it is a fresh document).
    *
    * Returns the version the new generation covers. No-op (returns the
    * existing base id) when the newest version is already compacted.
    */
  def bm25Compact(spark: SparkSession, path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lock = graft.operators.Layout.acquireMaintenanceLock(fs, path)
    try {
      val v = statsVersions(fs, path).lastOption.getOrElse(
        throw new IllegalStateException(
          s"bm25Compact: no complete stats version under $path — " +
            "nothing to compact"))
      val prevBase = tfBases(fs, path).filter(_ <= v).maxOption.getOrElse(-1L)
      if (prevBase == v) return prevBase
      // reap the PREVIOUS fold's inputs first — they have drained for a
      // full compaction cycle (see Scaladoc)
      def reapAtOrBelow(root: String, id: Long): Unit =
        completeBatchDirs(fs, s"$path/$root").collect {
          case (b, d) if b <= id => d
        }.foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
      if (prevBase >= 0) {
        reapAtOrBelow("tf", prevBase)
        reapAtOrBelow("tombstones", prevBase)
        tfBases(fs, path).filter(_ < prevBase).foreach(b =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/tfbase-v$b"), true))
      }
      val tf = tfState(spark, fs, path, v).getOrElse(
        throw new IllegalStateException(
          s"bm25Compact: stats-v$v exists but no complete tf state ≤ $v"))
      val live = tombSnapshot(spark, fs, path, v).fold(tf)(t =>
        tf.join(t.select("doc_id"), Seq("doc_id"), "left_anti"))
      val out = new org.apache.hadoop.fs.Path(s"$path/tfbase-v$v")
      if (fs.exists(out)) fs.delete(out, true) // crashed partial
      live.write.parquet(out.toString)
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$out/_SUCCESS")),
        s"bm25Compact: $out has no _SUCCESS marker after the fold")
      v
    } finally graft.operators.Layout.releaseMaintenanceLock(fs, lock)
  }

  /** `_SUCCESS`-complete `batch=<id>` dirs under `root` with id ≤
    * `maxId`, as (id, path) ascending by id — the completeness gate
    * every read of the maintained index's batch-scoped state goes
    * through: a dir mid-write (no `_SUCCESS`) is invisible, so no
    * reader ever touches a footer-less parquet file.
    */
  private[graft] def completeBatchDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: String, maxId: Long = Long.MaxValue): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath).toSeq
      .collect { case d if d.getName.startsWith("batch=") &&
          d.getName.drop(6).nonEmpty && d.getName.drop(6).forall(_.isDigit) =>
        (d.getName.drop(6).toLong, d)
      }
      .collect { case (id, d) if id <= maxId &&
          fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")) =>
        (id, d.toString)
      }
      .sortBy(_._1)
  }

  /** `_SUCCESS`-complete `<prefix><id>` version dirs under `path`,
    * ascending — the shared resolution for the index's three versioned
    * families (`stats-v`, `tomb-v`, `tfbase-v`).
    */
  private[graft] def versionedDirs(fs: org.apache.hadoop.fs.FileSystem,
      path: String, prefix: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith(prefix) &&
        n.length > prefix.length &&
        n.drop(prefix.length).forall(_.isDigit) => n.drop(prefix.length).toLong }
      .filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(s"$path/$prefix$v/_SUCCESS")))
      .sorted
  }

  /** `_SUCCESS`-complete stats versions under `path`, ascending. */
  private def statsVersions(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[Long] = versionedDirs(fs, path, "stats-v")

  /** `_SUCCESS`-complete compacted tf generations, ascending. */
  private def tfBases(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[Long] = versionedDirs(fs, path, "tfbase-v")

  /** The live tombstone snapshot (doc_id, tb) at version `v`: ONE
    * `tomb-v<v>` dir when the version published one (every r18+ publish
    * does), else the legacy fold of the batch-scoped dirs ≤ v (an
    * r17-created index; its next publish writes a snapshot). None ⇒ no
    * tombstone exists at v.
    */
  private def tombSnapshot(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      v: Long): Option[DataFrame] =
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/tomb-v$v/_SUCCESS")))
      Some(spark.read.parquet(s"$path/tomb-v$v"))
    else {
      val dirs = completeBatchDirs(fs, s"$path/tombstones", v)
      if (dirs.isEmpty) None
      else Some(dirs.map { case (id, d) =>
        spark.read.parquet(d).select(col("doc_id"), lit(id).as("tb"))
      }.reduce(_ unionByName _))
    }

  /** The tf state a reader at version `v` scores: the newest compacted
    * generation at or below v plus the delta dirs above it — O(deltas
    * since the last fold) dirs, never O(stream life). None ⇒ no tf rows
    * exist at v.
    */
  private def tfState(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      v: Long): Option[DataFrame] = {
    val base = tfBases(fs, path).filter(_ <= v).maxOption
    val c = base.getOrElse(-1L)
    val dirs = completeBatchDirs(fs, s"$path/tf", v)
      .collect { case (id, d) if id > c => d }
    val parts = base.map(b => s"$path/tfbase-v$b").toSeq ++ dirs
    if (parts.isEmpty) None
    else Some(spark.read.parquet(parts: _*))
  }

  /** Top-k over the maintained BM25 index — the batch-side read of
    * [[bm25IndexTo]]'s durable state, scoring with the shared
    * [[graft.operators.TextAnalysis.bm25ScoreFrames]]. The read is
    * VERSION-CONSISTENT (r17 review): it resolves the newest
    * `_SUCCESS`-complete stats version v and reads ONLY the complete
    * `tf`/`tombstones` batch dirs with id ≤ v — exactly the state
    * stats-v describes. A concurrent maintainer mid-batch is therefore
    * invisible end to end: its half-written dirs carry no `_SUCCESS`,
    * and its complete-but-not-yet-published dirs (id > v) are excluded,
    * so candidates, tombstones, and statistics always flip TOGETHER at
    * the version publish (the "old-or-new, never neither, never mixed"
    * contract the versioned stats introduced).
    */
  def bm25TopKFromIndex(spark: SparkSession, path: String, nTerms: Int,
      k: Int = graft.operators.TextAnalysis.Bm25K): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val v = statsVersions(fs, path).lastOption.getOrElse(
      throw new IllegalStateException(
        s"bm25TopKFromIndex: no complete stats version under $path — " +
          "has bm25IndexTo processed a non-empty batch yet?"))
    // tf state = compacted base + delta dirs above it (O(deltas since
    // the last bm25Compact) dirs); the tombstone anti-join set is the
    // ONE live snapshot published with v, bounded the same way. DRAIN
    // CONTRACT (VERDICT r17 #3): a resolved version's dirs survive at
    // least one further publish by default (the keep-current-+-previous
    // reap), so a read must plan AND execute within one publish
    // interval of resolving v; maintainers whose readers can be slower
    // pass reapDrainMs — superseded versions are then reaped only after
    // that many ms have passed since the superseding publish. A reader
    // that overstays either window fails LOUDLY (missing dir), never
    // with wrong data.
    val tf0 = tfState(spark, fs, path, v).getOrElse(
      throw new IllegalStateException(
        s"bm25TopKFromIndex: stats-v$v exists but no complete tf state ≤ $v"))
    // no broadcast hint on the tombstone anti-join: the live set is
    // bounded by deletions since the last compaction — Catalyst
    // broadcasts it while small and falls back when it isn't
    val tf = tombSnapshot(spark, fs, path, v).fold(tf0)(t =>
      tf0.join(t.select("doc_id"), Seq("doc_id"), "left_anti"))
    graft.operators.TextAnalysis.bm25ScoreFrames(
      tf, spark.read.parquet(s"$path/stats-v$v"), nTerms, k)
  }

  /** Incremental MATERIALIZED-VIEW maintenance into a remote keyed
    * table: feed an UPDATE-mode streaming aggregate here and each
    * trigger's changed rows are UPSERTED into `table` on `keys` — the
    * remote summary converges to what the batch aggregate over all
    * input would say, updated incrementally per micro-batch.
    *
    * Exactly-once EFFECT over an at-least-once channel: a replayed or
    * revised aggregate row overwrites itself by key (the engine's W6
    * conflict-aware writer), so retries and revisions are idempotent —
    * the classic keyed-upsert escape from streaming's delivery
    * semantics, and the reason this needs no sink-side transaction
    * log. Composed with the JDBC micro-batch SOURCE, the whole
    * incremental-view loop (remote fact table → stream → aggregate →
    * remote summary table) runs against external databases with Spark
    * as the incremental maintenance engine.
    */
  def maintainTo(updates: DataFrame, table: String, keys: Seq[String],
      checkpointDir: String,
      queryName: String = "graft_maintain_sink"): StreamingQuery =
    updates.writeStream
      .outputMode(OutputMode.Update)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.writeTo(table).option("upsertkeys", keys.mkString(",")).append()
      }
      .start()

  /** Streaming ingest curation: every micro-batch is decontaminated
    * against a STATIC benchmark frame with the SAME batch operator the
    * offline pipeline uses ([[graft.operators.Curation.decontaminate]]
    * — broadcast n-gram join, corpus side never shuffles), and the
    * surviving documents are appended to `table` through the DSv2
    * write path. No watermark state is involved: contamination is
    * decided per document against static reference data, so the
    * `foreachBatch` seam reuses the batch operator verbatim — one
    * curation library, both execution modes.
    */
  def curateTo(docs: DataFrame, bench: DataFrame, table: String,
      checkpointDir: String, n: Int = 4,
      queryName: String = "graft_curate_sink"): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val hits = graft.operators.Curation.decontaminate(batch, bench, n)
          .select(col("doc_id"))
        batch.join(broadcast(hits), Seq("doc_id"), "left_anti")
          .writeTo(table).append()
      }
      .start()

  /** Streaming NEAR-dup dedup for a document ingest pipeline: each
    * micro-batch is (1) exact-deduped within itself (min-id
    * representative per distinct text), (2) near-deduped within itself
    * (MinHash-LSH candidate pairs, greedy min-id keep — the same
    * [[graft.operators.Dedup.minhashLshPairs]] the batch gate q42
    * oracles), and (3) near-deduped AGAINST THE ACCUMULATED CORPUS via
    * the bipartite SimHash pigeonhole
    * ([[graft.operators.Dedup.incrementalDedup]], the q80 operator,
    * verbatim — one dedup library, both execution modes). Survivors
    * append to `table`; the table IS the dedup state.
    *
    * Scale shape: corpus-vs-batch work is proportional to the BATCH
    * (bipartite pigeonhole, never corpus×corpus), and the corpus-side
    * signatures are one aggregation pass over the store per trigger —
    * at high ingest rates, maintain them incrementally in a side table
    * keyed by the same (k, cv) chunks. Deduplication state deliberately
    * lives in the TABLE, not the streaming state store: near-dup state
    * must cover the whole corpus forever, which no watermark can bound
    * — the state store would grow unbounded AND vanish on checkpoint
    * loss, while the table is durable, exactly as large as the kept
    * corpus, and shared with the batch pipeline.
    */
  def nearDedupTo(docs: DataFrame, table: String, checkpointDir: String,
      maxHamming: Int = 8,
      queryName: String = "graft_neardedup_sink"): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        // (1) exact dedup within the batch — q40's min-id representative.
        // reps feeds three lineages (LSH pairs, the anti-join, the final
        // append) — persist once, released by the trailing releaseAll.
        val reps = graft.operators.GraftCache.track(
          batch0.select(col("doc_id"), col("text"))
            .groupBy(col("text"))
            .agg(min(col("doc_id")).as("doc_id"))
            .select(col("doc_id"), col("text")))
        // (2) near-dup within the batch: LSH candidates are
        // PROBABILISTIC — drop d2 only when the edit-distance metric
        // confirms the pair (the same verified criterion as q116; an
        // unverified band collision between distinct documents must
        // never discard one of them)
        val inBatch = reps.join(
          graft.operators.Dedup.verifiedNearDups(reps)
            .filter(col("verified"))
            .select(col("d2").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        // (3) near-dup vs history — bipartite, batch-proportional; on an
        // empty history this degenerates to a pass-through
        val survivors = graft.operators.Dedup
          .incrementalDedup(inBatch, spark.table(table), maxHamming = maxHamming)
          .select(col("doc_id"))
        inBatch.join(survivors, Seq("doc_id"))
          .writeTo(table).append()
        graft.operators.GraftCache.releaseAll()
      }
      .start()

  /** Streaming SEMANTIC dedup (VERDICT r18 #5): each micro-batch of
    * quantized vectors (vec_id, q, nrm) is assigned to the PERSISTED
    * trained cells of an [[graft.operators.AnnIndex]] artifact (the
    * frozen coarse quantizer — the same model the batch/search paths
    * share), and the keep/drop flags of exactly the TOUCHED cells are
    * recomputed over (accumulated state ∪ batch) through
    * [[graft.operators.Similarity.semDeDupFlags]] — the SAME per-cell
    * code as batch [[graft.operators.Similarity.semDeDupWith]], so the
    * streamed table equals the batch decision over the union at every
    * trigger, independent of micro-batch boundaries (EventStreamSpec
    * pins it). SemDeDup's decision is strictly per-cell, which is what
    * makes the cell-scoped incremental recompute EXACT: an arriving
    * vector can flip flags of earlier arrivals in its cell (it may
    * out-rank them), so flags are state to MAINTAIN, not an append
    * stream — the state lives in the cell-partitioned target table
    * (durable, batch-shared; the [[nearDedupTo]] store-not-state-store
    * rule), and each trigger rewrites only the touched cell directories
    * via dynamic partition overwrite (the
    * [[graft.operators.Layout.mergeInto]] partition-scoped discipline,
    * with its localCheckpoint lineage-severing — the plan both reads
    * and overwrites the table).
    *
    * Table schema: (vec_id, q, nrm, dist, kept) partitioned by cell.
    * vec_ids must be unique across the stream (the caller's key
    * contract, as everywhere in the dedup family). Single-maintainer:
    * this query owns its state table.
    *
    * Scale shape per trigger: one broadcast assignment over the BATCH,
    * a pair term bounded by the touched cells' membership (per-cell
    * (n/C)², the paper's own knob — C ≈ √N cells), and a rewrite of
    * O(touched cells) directories — never the corpus.
    */
  def semDeDupTo(vecs: DataFrame, idxPath: String, table: String,
      checkpointDir: String,
      thr: Double = graft.operators.Similarity.SemDedupThr,
      queryName: String = "graft_semdedup_sink"): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        import graft.operators.{AnnIndex, GraftCache, Similarity}
        val spark = batch0.sparkSession
        val batch = batch0.select("vec_id", "q", "nrm")
        if (!batch.isEmpty) {
          val cents = AnnIndex.readCents(spark, idxPath)
          val assigned = GraftCache.track(
            Similarity.ivfAssign(batch, cents).select("vec_id", "cell", "dist")
              .join(batch, "vec_id"))
          val touched = assigned.select("cell").distinct()
            .collect().map(_.getLong(0)).toSeq
          val fs = new org.apache.hadoop.fs.Path(table)
            .getFileSystem(spark.sessionState.newHadoopConf())
          val members =
            if (!fs.exists(new org.apache.hadoop.fs.Path(table))) assigned
            else spark.read.parquet(table)
              .filter(col("cell").isin(touched: _*))
              .select("vec_id", "cell", "dist", "q", "nrm")
              .unionByName(assigned
                .select("vec_id", "cell", "dist", "q", "nrm"))
          // flags carry (vec_id, cell, dist, kept); q/nrm ride back in
          // for future recomputes of these cells
          val out = Similarity.semDeDupFlags(members, thr)
            .join(members.select("vec_id", "q", "nrm"), "vec_id")
            .select("vec_id", "q", "nrm", "dist", "kept", "cell")
            .localCheckpoint()
          out.write.mode("overwrite")
            .partitionBy("cell")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(table)
          GraftCache.releaseAll()
        }
      }
      .start()

  /** Streaming ANN serving: every micro-batch of probe vectors is
    * scored against a STATIC corpus through the same IVF chain the
    * batch gate q70 oracles ([[graft.operators.Similarity.annIvf]] —
    * one ANN library, both execution modes), and the exact-cosine
    * top-k `(qid, vec_id, cos)` rows append to `table`. Probe ids must
    * be disjoint from corpus ids (the id is the pair identity).
    *
    * Scale shape: centroids broadcast; a probe ranks only the members
    * of its `nprobe` nearest cells, so per-trigger work is
    * probe-proportional — never corpus × corpus. The corpus side
    * re-evaluates per trigger (stream-static semantics, so a refreshed
    * corpus is picked up); at high trigger rates hand in an
    * already-persisted corpus frame.
    */
  def annSinkTo(probes: DataFrame, corpus: DataFrame, table: String,
      checkpointDir: String, nprobe: Int = 4, k: Int = 5,
      centroidStride: Int = 25,
      queryName: String = "graft_ann_sink"): StreamingQuery =
    probes.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import graft.operators.{EmbeddingLsh, GraftCache, Similarity}
        val all = EmbeddingLsh.quantize(corpus, "vec_id", "embedding")
          .withColumn("is_q", lit(false))
          .unionByName(EmbeddingLsh.quantize(batch, "vec_id", "embedding")
            .withColumn("is_q", lit(true)))
        Similarity.annIvf(all,
            isQuery = col("is_q"),
            isCentroid = !col("is_q") && col("vec_id") % centroidStride === 0,
            nprobe = nprobe, k = k)
          .writeTo(table).append()
        GraftCache.releaseAll()
      }
      .start()

  /** Stream-stream watermarked interval join: attribute each click to
    * every view by the same user within the preceding `withinMinutes`.
    * The equi-key (user) bounds the hash partitioning, the event-time
    * range plus both watermarks bound the JOIN STATE — a view's state
    * row is dropped once the click watermark passes v_ts + within, so
    * state is ingest-rate × window, not stream length (the property
    * that makes a stream-stream join viable at all; an unbounded-state
    * join is the classic streaming scale-killer). Append-mode output:
    * a pair emits exactly once, when both sides are final.
    */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
      withinMinutes: Int = 30, lateness: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", lateness)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    c.join(v, expr(
      s"""c_user = v_user AND v_ts <= c_ts
         |AND v_ts >= c_ts - INTERVAL $withinMinutes MINUTES""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
  }

  /** One group's current heavy-hitter estimates, re-emitted per trigger. */
  case class HeavyHitters(grp: String, items: Map[String, Long])

  /** Streaming heavy hitters: a RUNNING Misra–Gries sketch per group,
    * updated each micro-batch through the exact same
    * [[graft.functions.FreqSketch.offer]] step the batch aggregate and
    * its merge use — one sketch implementation, three execution seams
    * (batch partial, batch merge, streaming state). State per group is
    * O(capacity) FOREVER (no watermark needed: the sketch, not time,
    * bounds memory), so running top-k over an unbounded stream costs
    * the same as over an hour of it. Exactness inherits the batch
    * guarantee: counters are exact while a group's distinct items stay
    * ≤ capacity, and undercount by ≤ n/(capacity+1) beyond that.
    * Update-mode output: each trigger re-emits the refreshed sketch of
    * every group that saw data.
    */
  def heavyHittersStream(items: DataFrame, capacity: Int = 64,
      grpCol: String = "grp", itemCol: String = "item"): Dataset[HeavyHitters] = {
    import items.sparkSession.implicits._
    items.select(col(grpCol).cast("string"), col(itemCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, Long], HeavyHitters](
        GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, String)], state: GroupState[Map[String, Long]]) =>
          val buf = new java.util.HashMap[String, Long]()
          state.getOption.foreach(_.foreach { case (k, v) => buf.put(k, v) })
          it.foreach(x => graft.functions.FreqSketch.offer(buf, x._2, 1L, capacity))
          val m = {
            val b = Map.newBuilder[String, Long]
            buf.forEach((k, v) => b += (k -> v))
            b.result()
          }
          state.update(m)
          HeavyHitters(key, m)
      }
  }

  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      lateness: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def close(key: String, s: Sess): Session = Session(key, s.start, s.last, s.n)

    // the watermarked ts column must reach the stateful operator as an
    // event-time attribute (casting it away disables the timeout)
    events
      .withWatermark("ts", lateness)
      .select(col("event_type"), col("ts"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Sess, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, java.sql.Timestamp)], state: GroupState[Sess]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: the session is closed for good
            val s = state.get; state.remove()
            Iterator.single(close(key, s))
          } else {
            var closed = List.empty[Session]
            var cur = state.getOption
            it.map(_._2.getTime / 1000L).toSeq.sorted.foreach { sec =>
              cur match {
                case Some(s) if (sec - s.last) * 1000L <= gapMs =>
                  cur = Some(Sess(s.start, sec, s.n + 1))
                case Some(s) =>
                  closed ::= close(key, s)
                  cur = Some(Sess(sec, sec, 1))
                case None =>
                  cur = Some(Sess(sec, sec, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last * 1000L + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
