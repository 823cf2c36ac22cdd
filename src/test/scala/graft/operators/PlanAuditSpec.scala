package graft.operators

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that make these queries hold at
  * 100 TB are asserted, not hoped for. A regression that turns a
  * broadcast join into a shuffle, drops a pushed filter, or reintroduces
  * a cross join fails HERE, before any benchmark notices.
  */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
    // queries that GraftCache.track a reused frame register it with the
    // shared session's CacheManager at CONSTRUCTION time; left in place
    // it would substitute InMemoryRelations into later suites' plans —
    // the exact property this spec pins
    GraftCache.releaseAll()
    p
  }

  test("q127: window + rank filter collapse into ONE remote DuckDB scan") {
    assume(graft.sources.jdbc.DuckDbWireSpec.driverPresent)
    val p = plan("q127_duckdb_window_pushdown")
    assert(p.contains("ROW_NUMBER() OVER"), s"window not in remote SQL:\n$p")
    assert(!p.contains("Window"), s"a local Window exec survived:\n$p")
    // the rank predicate wraps the collapsed subquery as a remote WHERE
    assert(p.contains("WHERE") && p.contains("<= 3"), s"rank filter not remote:\n$p")
  }

  test("q126: cross-file ATTACH join is one remote statement — no local join") {
    assume(graft.sources.jdbc.DuckDbWireSpec.driverPresent)
    val p = plan("q126_duckdb_attach_federation")
    assert(p.contains("JOIN"), s"attach federation did not collapse:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"join ran locally:\n$p")
  }

  test("q129: remote-collapsed dims BROADCAST into the local fact join") {
    assume(graft.sources.jdbc.DuckDbWireSpec.driverPresent)
    val p = plan("q129_cross_source_broadcast")
    // dims pre-join remotely (one scan carrying a JOIN) …
    assert(p.contains("GraftJdbcScan") && p.contains("JOIN"), p)
    // … and the tiny result broadcasts; the fact side never shuffles
    assert(p.contains("BroadcastHashJoin"), s"dims did not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact shuffled for the join:\n$p")
  }

  test("q130: remote DuckDB reads the parquet file itself — filter AND GROUP BY inside the function scan") {
    assume(graft.sources.jdbc.DuckDbWireSpec.driverPresent)
    val p = plan("q130_duckdb_read_parquet")
    assert(p.contains("read_parquet("), s"function scan missing:\n$p")
    assert(p.contains("WHERE") && p.contains("GROUP BY"),
      s"filter/agg did not push into the function scan:\n$p")
  }

  test("q132: chained INTERSECT/EXCEPT is ONE remote statement — no local join, no local distinct") {
    assume(graft.sources.jdbc.DuckDbWireSpec.driverPresent)
    val p = plan("q132_duckdb_setop_pushdown")
    assert("GraftJdbcScan".r.findAllIn(p).length == 1,
      s"set-op chain did not collapse to one scan:\n$p")
    assert(p.contains("IS NOT DISTINCT FROM"),
      s"intersect's null-safe equality not in the remote SQL:\n$p")
    assert(p.contains("NOT EXISTS"), s"except's anti-join not remote:\n$p")
    assert(p.contains("SELECT DISTINCT"), s"distinct not remote:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("HashAggregate"), s"a local set-op stage survived:\n$p")
  }

  test("q134: chained INTERSECT ALL / EXCEPT ALL is ONE remote native set-op statement") {
    assume(graft.sources.jdbc.DuckDbWireSpec.driverPresent)
    val p = plan("q134_duckdb_setop_all_pushdown")
    assert("GraftJdbcScan".r.findAllIn(p).length == 1,
      s"ALL set-op chain did not collapse to one scan:\n$p")
    assert(p.contains("INTERSECT ALL") && p.contains("EXCEPT ALL"),
      s"native ALL set-ops not in the remote SQL:\n$p")
    // the local ReplicateRows counting plan must be fully displaced
    assert(!p.contains("Generate") && !p.contains("HashAggregate") &&
      !p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"a local counting stage survived:\n$p")
  }

  test("q02: predicate reaches the parquet scan as PushedFilters") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity"), p)
  }

  test("q01: scan reads only the three projected columns") {
    val p = plan("q01_pruned_scan")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_discount") && !p.contains("l_tax"),
      s"column pruning lost:\n$p")
  }

  test("q04: TopK plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q04_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q14: all four dimension joins broadcast; fact table never shuffles for them") {
    val p = plan("q14_multi_join")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
    // reduced-side-first (r10 verdict): orders is cut to a 2-column
    // survivor set by a LEFT SEMI against the dim chain BEFORE meeting
    // lineitem (a semi keeps Catalyst's size estimate = the orders
    // side, so the planner broadcasts the RIGHT side of the fact join
    // at every scale), and the fact join builds from that reduced side
    // — lineitem is never the build side
    assert(p.contains("LeftSemi"), s"orders not semi-reduced before the fact join:\n$p")
    val factJoin = p.linesIterator
      .find(l => l.contains("BroadcastHashJoin") && l.contains("l_orderkey")).getOrElse("")
    assert(factJoin.contains("BuildRight"),
      s"fact join does not build from the reduced orders side:\n$p")
  }

  test("q137: bloom runtime filter sits on the probe SCAN, under the exact semi join") {
    val p = plan("q137_bloom_runtime_filter")
    assert(p.contains("might_contain"), s"bloom filter not in the plan:\n$p")
    // the bloom must filter orders BELOW the semi join (scan-side), and
    // the exact join must survive to discard false positives
    assert(p.contains("LeftSemi"), s"exact semi join eliminated:\n$p")
    assert(!p.contains("SortMergeJoin"), s"semi join shuffled the probe side:\n$p")
  }

  test("q102: part-bounded stats frame broadcasts; the fact side is never a build side") {
    val p = plan("q102_tpch_q17")
    // both joins build from the small side (part dim, part-keyed stats);
    // a size-estimate regression that demotes either to a fact-sorting
    // SMJ — or flips a build side to the probe leg — fails here
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("SortMergeJoin"), s"stats join fell back to SMJ:\n$p")
  }

  test("q40: exact dedup is one hash aggregate with map-side partial") {
    val p = plan("q40_exact_dedup")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial + final
  }

  test("q118: normalized dedup is one hash aggregate over a projection") {
    val p = plan("q118_normalized_dedup")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial + final
    assert(!p.contains("Join"), s"normalization must not join:\n$p")
  }

  test("q117: recall evaluation — broadcast query set, no cartesian on data") {
    val p = plan("q117_ann_recall")
    assert(!p.contains("CartesianProduct"), p)
    // both ANN paths broadcast the tiny query/centroid sets; the only
    // nested-loop joins allowed are those broadcast cross joins
    assert(p.contains("BroadcastNestedLoopJoin Cross") || p.contains("BroadcastHashJoin"), p)
  }

  test("q119: calibration joins are keyed — no cartesian, int64 shingle keys") {
    val p = plan("q119_minhash_calibration")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic join in calibration:\n$p")
    assert(p.contains("[h#") || p.contains("(h#") || p.contains(", h#"),
      s"shingle-hash join key lost:\n$p")
  }

  test("q45: near-dup has NO cross/nested-loop join — LSH equi-joins only") {
    val p = plan("q45_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"quadratic join reintroduced:\n$p")
  }

  test("q41: shingle self-join keys are int64 hashes, not raw strings") {
    val p = plan("q41_ngram_jaccard_pairs")
    assert(!p.contains("CartesianProduct"), p)
    // join keys named h (the 60-bit hash), bigint typed
    assert(p.contains("[h#") || p.contains("(h#"), s"hash-key join lost:\n$p")
  }

  test("q97: dup-span counting joins on int64 hashes — no window over h, no cartesian") {
    val p = plan("q97_dup_spans")
    assert(!p.contains("CartesianProduct"), p)
    // the ndocs side must be an aggregate+join (AQE-skew-splittable),
    // never a WindowExec over the span-hash key (single-task buffering
    // of a boilerplate span's whole posting list)
    assert(!p.contains("Window"), s"window over span hash reintroduced:\n$p")
    assert(p.contains("[h#") || p.contains("(h#"), s"hash-key join lost:\n$p")
  }

  test("q156: span removal keeps q97's hash join; interval windows partition by doc_id only") {
    val p = plan("q156_dup_span_removal")
    assert(!p.contains("CartesianProduct"), p)
    // the dup probe stays the AQE-splittable int64 shuffled-hash join
    assert(p.contains("ShuffledHashJoin"), s"span probe lost the shuffle_hash plan:\n$p")
    // interval union + complement are per-DOCUMENT windows (bounded by
    // doc length) — a window keyed by the span hash would buffer a
    // boilerplate span's whole posting list in one task
    assert(p.toLowerCase.contains("windowspecdefinition(doc_id"),
      s"interval windows lost the doc_id partitioning:\n$p")
    assert(!p.toLowerCase.contains("windowspecdefinition(h#"),
      s"window over the span hash:\n$p")
  }

  test("q36: chunking is a shuffle-free projection — no hash exchange at all") {
    val p = plan("q36_chunk_windows")
    assert(!p.contains("hashpartitioning"),
      s"chunking gained a shuffle:\n$p") // only the gate's presentation sort (range) may exchange
  }

  test("q98: prototypicality thresholds broadcast back — no cartesian, no shuffled threshold join") {
    val p = plan("q98_semantic_outliers")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), s"k-row threshold table stopped broadcasting:\n$p")
  }

  test("q20-q24: every TPC-H analog plans equi-joins with broadcast dims — no cartesian") {
    for (q <- Seq("q20_tpch_q3", "q21_tpch_q5", "q22_tpch_q10",
        "q23_tpch_q18", "q24_tpch_q7")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: quadratic join:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q: dims stopped broadcasting:\n$p")
    }
  }

  test("q62: query set broadcasts; vectors scan once") {
    val p = plan("q62_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert("Scan parquet".r.findAllIn(p).length <= 2, s"extra vector scans:\n$p")
  }

  test("q42: minhash band self-join is an equi-join — no cartesian") {
    val p = plan("q42_minhash_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic join reintroduced:\n$p")
  }

  test("q115: PII scrub is a shuffle-free projection — no exchange before the sort") {
    val p = plan("q115_pii_redact")
    assert(!p.replaceAll("(?s)Sort .*", "").contains("Exchange"),
      s"PII redaction gained a shuffle before the presentation sort:\n$p")
  }

  test("q116: levenshtein runs only on LSH candidates — equi-joins, no cartesian") {
    val p = plan("q116_neardup_verify")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs edit distance reintroduced:\n$p")
    // the Myers bit-parallel expression must stay INSIDE codegen (a
    // fallback to interpreted eval would silently give back the 8×)
    assert(p.contains("edit_distance"), s"EditDistance expression missing:\n$p")
    assert(!p.contains("levenshtein"),
      s"built-in O(n·m) levenshtein crept back into the verify stage:\n$p")
  }

  test("q63: LSH ANN candidate generation is an equi-join — no cartesian") {
    val p = plan("q63_ann_lsh")
    assert(!p.contains("CartesianProduct"), s"non-broadcast cartesian:\n$p")
  }

  test("q18: as-of join is union + ONE keyed window — no join operator at all") {
    val p = plan("q18_asof_join")
    assert(!p.contains("Join"), s"pairwise join reintroduced:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q43: simhash is a shuffle-free codegen projection — no aggregate, no exchange") {
    val p = plan("q43_simhash")
    // r3 pinned a single aggregation, r14 the measured two-stage vote;
    // r16 moved the whole vote into the SimHash60 byte-scan expression
    // (A/B medians sf0.1: q43 1.11→0.47, q44 1.36→0.57, q80 1.49→0.82),
    // so the signature is now a pure row-local projection: the plan must
    // hold ZERO aggregates and ZERO exchanges on the fact path (the only
    // allowed exchange is the presentation sort's range partitioning).
    assert(!p.contains("HashAggregate"), s"simhash re-grew an aggregate:\n$p")
    assert(!p.contains("hashpartitioning"), s"simhash re-grew a shuffle:\n$p")
    assert(p.contains("simhash60") || p.contains("SimHash60"),
      s"native expression missing from plan:\n$p")
  }

  test("q70: IVF cell assignment folds map-side — no N×C shuffle, centroids broadcast") {
    val p = plan("q70_ann_ivf")
    // the only nested-loop joins are against the broadcast centroid set;
    // candidate ranking is hash/sort equi-joins
    assert(!p.contains("CartesianProduct"), s"non-broadcast cartesian:\n$p")
    // partial + final aggregate pair for the argmax assignment
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r.findAllIn(p).length >= 2,
      s"assignment argmax lost its partial phase:\n$p")
  }

  test("q158: PQ encode is a literal-codebook projection; ADC scan broadcasts the LUT side") {
    val p = plan("q158_pq_adc")
    // the encoded fact stream must meet the query LUTs through a
    // BROADCAST nested loop (queries are the small side by contract) —
    // never a shuffled cartesian; codebooks are driver literals, so no
    // join materializes the N×ksub assignment stream either
    assert(!p.contains("CartesianProduct"),
      s"non-broadcast cartesian on the ADC scan:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query/LUT side must broadcast:\n$p")
  }

  test("q159: IVFADC scan is cell-restricted — encoded stream meets the LUTs through a broadcast HASH join on cell") {
    val p = plan("q159_ivfadc")
    // the candidate-restriction term IS the equi-join on cell: a
    // cartesian (even broadcast-nested-loop) between the encoded stream
    // and the LUT side would mean every query scans every cell again —
    // q158's shape, exactly what IVFADC exists to avoid
    assert(!p.contains("CartesianProduct"),
      s"non-broadcast cartesian on the IVFADC scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"LUT side must broadcast and join ON CELL:\n$p")
  }

  test("q161: the exact re-rank touches only the ADC top-R — equi-joins, no cartesian beyond the broadcast scans") {
    val p = plan("q161_ivfadc_rerank")
    assert(!p.contains("CartesianProduct"),
      s"non-broadcast cartesian in the re-rank:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"cell-restricted scan lost its broadcast equi-join:\n$p")
  }

  test("entry: flagship star join broadcasts dimensions") {
    val p = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
  }

  test("q73: curation is one scan + one dedup shuffle + narrow gates") {
    val p = plan("q73_curate")
    // exactly the dedup groupBy's hash exchange and the presentation
    // sort's range exchange — a second hash shuffle means a gate or
    // projection started shuffling
    assert("hashpartitioning".r.findAllIn(p).length <= 1,
      s"curation gained a second hash shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"dedup aggregate lost its map-side partial:\n$p")
  }

  test("q75: benchmark n-gram set broadcasts; corpus side never shuffles to join") {
    val p = plan("q75_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"bench-set join must broadcast (corpus side is the 100-TB side):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q76: repetition metrics are a narrow projection — no join, no agg shuffle") {
    val p = plan("q76_repetition_filter")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"per-row metrics must not shuffle:\n$p")
  }

  test("q74: cluster resolution plans equi-joins only — no cartesian") {
    val p = plan("q74_dup_clusters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q78: k-means assignment is a shuffle-free projection over literal centroids") {
    val p = plan("q78_kmeans_train")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"assignment must not join the corpus against centroids:\n$p")
  }

  test("q80: incremental dedup joins are equi/anti only — no cartesian") {
    val p = plan("q80_incremental_dedup")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q81: the bucket-prefix join broadcasts (corpus side never reshuffles)") {
    val p = plan("q81_pack_sequences")
    assert(p.contains("BroadcastHashJoin"), s"prefix join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q82/q83: per-group windows shuffle once on the group key") {
    for (name <- Seq("q82_token_budget", "q83_length_quantiles")) {
      val p = plan(name)
      assert("hashpartitioning".r.findAllIn(p).length <= 1,
        s"$name gained a second hash shuffle:\n$p")
      assert(!p.contains("Join"), s"$name must not join:\n$p")
    }
  }

  test("q84/q86: redaction + vocab rewrite are narrow projections — no hash shuffle, no join") {
    for (name <- Seq("q84_blocklist_redact", "q86_vocab_prune")) {
      val p = plan(name)
      assert(!p.contains("hashpartitioning"),
        s"$name is a per-row rewrite; it must not shuffle:\n$p")
      assert(!p.contains("Join"),
        s"$name must carry its model state as literals, not a join:\n$p")
    }
  }

  test("q136: weighted sample is a TakeOrderedAndProject, never a global sort") {
    // priority sampling's top-k must plan as per-partition TopK + merge
    // (O(k) state per partition) — a global Sort would shuffle the
    // whole corpus to rank 500 rows
    val p = plan("q136_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("\n+- Sort") && !p.contains("rangepartitioning"),
      s"global sort leaked into the sample plan:\n$p")
  }

  test("q142: z-key query is a TopK; clustered write is range exchange + local sort") {
    val p = plan("q142_zorder_key")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("\n+- Sort"), s"global sort leaked into the key query:\n$p")

    // the write-side frame: ONE range exchange on the z-key, then a
    // WITHIN-partition sort — a global sort would add a second
    // boundary-exchange pass over the full corpus for an ordering
    // property no file layout needs
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val cp = Layout.clustered(li, Seq("l_partkey", "l_suppkey"), 8)
      .queryExecution.executedPlan.toString
    assert(cp.contains("rangepartitioning"), s"no range exchange:\n$cp")
    assert("(?s)Sort \\[[^\\]]*\\], true".r.findFirstIn(cp).isEmpty,
      s"global sort in the clustered-write plan:\n$cp")
    assert("(?s)Sort \\[[^\\]]*\\], false".r.findFirstIn(cp).isDefined,
      s"missing within-partition sort:\n$cp")
  }

  test("q148: cents-layout Q1 aggregates pure int64 — no decimal in any buffer") {
    // the layout's entire point: the per-row path (scan → filter →
    // partial agg) carries ONLY longs; decimal appears exactly once,
    // in the 6-row post-aggregation money division. A regression that
    // reintroduces a decimal cast under a sum() re-pays the decimal128
    // aggregation the layout removed (BASELINE r12: 3.0-4.3 → 0.75 s
    // at 100×).
    val p = plan("q148_cents_layout")
    assert("(?i)sum\\([^)]*decimal".r.findFirstIn(p).isEmpty,
      s"a decimal crept under an aggregation buffer:\n$p")
    assert(!p.contains("CheckOverflow"), s"decimal arithmetic in the row path:\n$p")
    // one shuffle: the partial→final agg exchange; nothing else
    assert("Exchange".r.findAllIn(p).length <= 2, s"extra exchanges:\n$p")
  }

  test("q138: Gramian is one object agg — no join, no vector shuffle") {
    // the corpus reduces map-side to O(d²) partial buffers; the only
    // exchange may carry those partials to the single final aggregate
    // — never vector rows, and the d²-row explode sits above the agg
    val p = plan("q138_gram_matrix")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("Join"), s"gramian must not join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"only the SinglePartition partial merge may shuffle:\n$p")
  }

  test("q140: correlation normalizes over broadcast diagonals — no shuffle join") {
    // the d²-row covariance frame (checkpointed — the corpus pass is
    // q138's pinned shape) joins its own d-row diagonal twice; both
    // must broadcast, never sort-merge or re-shuffle the matrix
    val p = plan("q140_correlation")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"diagonal join must broadcast:\n$p")
  }

  test("q141: z-score is a broadcast-stats projection — no fact-side shuffle join") {
    // the d-row stats frame broadcasts into the exploded value stream;
    // the only permissible exchanges are the (checkpoint-hidden) Gramian
    // partial merge and the presentation sort — never a value re-shuffle
    val p = plan("q141_standardize")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"stats join must broadcast:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"the value stream must not re-shuffle:\n$p")
  }

  test("q85: stratified sample windows shuffle once on the group key") {
    val p = plan("q85_stratified_sample")
    assert("hashpartitioning".r.findAllIn(p).length <= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q87: sessionize reuses the user_id exchange for the session agg") {
    val p = plan("q87_sessionize")
    assert("hashpartitioning".r.findAllIn(p).length <= 1,
      s"(user_id, sess) agg must reuse the user_id exchange:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q89: semantic clusters plans equi-joins only — no cartesian") {
    // The label join is deliberately NOT hinted broadcast: at corpus
    // scale the component-label frame can be arbitrarily large, so the
    // static plan is an int64-keyed shuffle join and AQE localizes it
    // to a broadcast at runtime when the labels turn out small.
    val p = plan("q89_semantic_clusters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic join reintroduced:\n$p")
  }

  test("q91: capstone curation plans equi-joins only — no cartesian anywhere; LM gate keeps the window form") {
    val p = plan("q91_semantic_curate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic join in the capstone:\n$p")
    // the r15 LM gate must keep q154's vocabulary-side build: head
    // totals as a Window over the collapsed bigram table (an
    // aggregate+self-join form would recompute the uncached explode
    // subtree twice), visible as ≥2 Windows (LM head totals + budget)
    assert("Window".r.findAllIn(p).length >= 2,
      s"LM head totals lost the window form:\n$p")
  }

  test("q155: LM-gated curation keeps q154's vocabulary-side LM + q73's single dedup shuffle — no cartesian") {
    val p = plan("q155_lm_gated_curate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // one Window (LM head totals over the collapsed c2 table) — the
    // budget-less pipeline has no other window
    assert(p.contains("Window"), s"LM head totals lost the window form:\n$p")
    // aggregates: dedup groupBy + c2 + per-doc score (each with its
    // map-side partial) — more means a gate started re-aggregating
    assert("HashAggregate".r.findAllIn(p).length <= 6,
      s"aggregate shape drifted:\n$p")
  }

  test("q92: funnel is ONE conditional-min aggregate pair — no join, no window") {
    val p = plan("q92_funnel")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"funnel must stay a single aggregation:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"map-side partial lost:\n$p")
  }

  test("q88: heavy hitters is one sketch aggregate pair + TopK — no raw-token sort") {
    val p = plan("q88_heavy_hitters")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"sketch must fold map-side (partial + final):\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$p")
  }

  test("mixSample is a shuffle-free per-row filter — zero exchanges") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val p = Curation.mixSample(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampler must never shuffle the corpus:\n$p")
  }

  test("sq8 code assignment is a shuffle-free projection with literal ranges") {
    val e = graft.Tables.load(spark, dir, "embeddings")
    // the range-model aggregation runs (and collects) at construction;
    // the RETURNED frame must then be scan + project only
    val p = Similarity.sq8(e).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"code projection must not shuffle:\n$p")
    assert(!p.contains("Join"), s"ranges must be literals, not a join:\n$p")
  }

  test("q49: inverted index builds postings only for band terms — no cartesian") {
    val p = plan("q49_inverted_index")
    assert(!p.contains("CartesianProduct"), s"cartesian in index build:\n$p")
  }

  test("q48: novelty joins occurrences to the df table on int64 hashes — no cartesian") {
    val p = plan("q48_novelty")
    assert(!p.contains("CartesianProduct"), s"cartesian in novelty scoring:\n$p")
  }

  test("centrality releases its cached edge frame before returning") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("d1", "d2")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Cluster.centrality(pairs, iters = 1).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // the eager localCheckpoint RDD of the RESULT may legitimately
    // remain (it IS the returned data); the tracked edge cache must not
    assert(leaked.size <= 1, s"centrality leaked cached RDDs: $leaked")
  }

  test("q25/q26: global-threshold gates broadcast their 1-row stats frame") {
    for (q <- Seq("q25_tpch_q22", "q26_tpch_q11")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian:\n$p")
      assert(p.contains("BroadcastExchange"), s"$q: stats frame must broadcast:\n$p")
    }
  }

  test("q104/q108: correlated EXISTS shapes stay keyed semi/anti joins — never nested-loop") {
    // the non-equi predicates (shipdate vs orderdate+interval, suppkey
    // inequality) must RIDE an equi-keyed join, not replace it: a
    // BroadcastNestedLoopJoin here is O(orders × lineitem) at 100 TB
    val p4 = plan("q104_tpch_q4")
    assert(p4.contains("LeftSemi"), s"q104: semi join lost:\n$p4")
    assert(!p4.contains("CartesianProduct") && !p4.contains("BroadcastNestedLoopJoin"),
      s"q104: EXISTS degenerated to a nested loop:\n$p4")
    val p21 = plan("q108_tpch_q21")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      s"q108: semi+anti pair lost:\n$p21")
    assert(!p21.contains("CartesianProduct") && !p21.contains("BroadcastNestedLoopJoin"),
      s"q108: correlation degenerated to a nested loop:\n$p21")
  }

  test("q106: the 3-branch disjunction rides a broadcast equi-join") {
    // brand/size/quantity ORs are a post-join filter; the p_partkey
    // equi-key must keep the broadcast hash join (TPC-H Q19's classic
    // failure mode is OR-expansion into a nested loop)
    val p = plan("q106_tpch_q19")
    assert(p.contains("BroadcastHashJoin"), s"q106: broadcast join lost:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q106: disjunction broke the equi-join:\n$p")
  }

  test("q109/q110: deep stars broadcast every dimension — fact table shuffles only to aggregate") {
    for (q <- Seq("q109_tpch_q8", "q110_tpch_q9")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian:\n$p")
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
        s"$q: dimensions stopped broadcasting:\n$p")
    }
  }

  test("q111/q112: correlated-MIN and nested-IN plan as keyed aggregates + equi joins") {
    for (q <- Seq("q111_tpch_q2", "q112_tpch_q20")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: quadratic join:\n$p")
      if (q == "q112_tpch_q20")
        assert(p.contains("LeftSemi"), s"q112: outer IN must stay a semi join:\n$p")
    }
  }

  test("q113: keep-best argmax is a partial+final aggregate — no cartesian, no window over clusters") {
    val p = plan("q113_keep_best")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic join in keep-best:\n$p")
    // the survivor choice must be the struct-max AGGREGATE (map-side
    // combinable), never a per-cluster window (single-task buffering of
    // a hot cluster's members, no AQE skew handling)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).nonEmpty, p)
  }

  test("q109: the 8-table star is all-broadcast — the fact never sort/shuffle-joins") {
    val p = plan("q109_tpch_q8")
    // r13: the EUROPE-customer gate semi-reduces ORDERS before the fact
    // join (no customer column is projected, c_custkey unique ⇒ the
    // inner joins were a semi filter), so every join on the lineitem
    // path broadcasts — measured 5.29 → 3.21 s at 100×
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q109 fact path shuffles:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 5, p)
  }

  test("q152: the cents Q17 keeps q102's shape — both builds broadcast, the cents fact is never a build side") {
    val p = plan("q152_cents_tpch_q17")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("SortMergeJoin"), s"cents stats join fell back to SMJ:\n$p")
    // no cache: the r14 starprof A/B dropped the persist — a cached
    // InMemoryRelation here would mean the rescan decision regressed
    assert(!p.contains("InMemoryTableScan"), s"q152 re-grew a columnar cache:\n$p")
  }

  test("q153: the cents Q8 star is all-broadcast like q109") {
    val p = plan("q153_cents_tpch_q8")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q153 fact path shuffles:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 5, p)
  }

  test("q154: LM score builds the LM vocabulary-side — no cartesian, stream joins the collapsed table once") {
    val p = plan("q154_lm_score")
    assert(!p.contains("CartesianProduct"), p)
    // head totals come from a vocabulary-bounded window over the
    // COLLAPSED c2 table (an aggregate+self-join form recomputed the
    // whole uncached c2 subtree twice — 8 HashAggregates); the token
    // stream joins the composite-keyed LM exactly once — two aggregate
    // pairs (c2, per-doc) + one Window, no more
    assert("HashAggregate".r.findAllIn(p).length <= 4, s"aggregate shape drifted:\n$p")
    assert(p.contains("Window"), s"head totals lost the window form:\n$p")
  }

  test("q157: BM25 never shuffles the fact path — 1-row stats broadcast, TakeOrdered top-k") {
    val p = plan("q157_bm25_topk")
    // the only aggregate is the corpus-stats row (partial + final);
    // scoring is a narrow per-row projection against the broadcast
    // 1-row frame, and top-k is a TakeOrdered, never a global sort
    assert(p.contains("TakeOrderedAndProject"), s"top-k lost TakeOrdered:\n$p")
    assert(!p.contains("SortMergeJoin"), s"BM25 gained a shuffle join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"BM25 fact path gained a hash exchange:\n$p")
    assert("HashAggregate".r.findAllIn(p).length <= 2,
      s"more than the one stats aggregate pair:\n$p")
  }

  test("q151: PCA projection is join-free — the basis rides as literals into codegen'd qdot") {
    val p = plan("q151_pca_project")
    // the projection pass must NOT join the corpus against the
    // component rows (that shape shuffles n×k rows); the k component
    // vectors are literal arrays inside per-row qdot calls, so the only
    // exchange in the plan is the gate's presentation ORDER BY
    assert(!p.contains("Join"), s"projection pass joins:\n$p")
    assert(!p.contains("HashAggregate"),
      s"projection pass aggregates (score must be per-row qdot):\n$p")
    assert(p.contains("qdot"), s"codegen qdot missing:\n$p")
  }
}
