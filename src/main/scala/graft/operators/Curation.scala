package graft.operators

import graft.{Q, Tables}
import graft.functions.CrossHash.{h60, h60Sql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the flagship composition a training-data
  * pipeline runs as its ingest step — exact dedup, quality gate,
  * language gate, token budgeting and fingerprinting — as ONE
  * declarative DataFrame program.
  *
  * Shape at 100 TB: a single scan, one hash shuffle (the dedup
  * groupBy on the text key, map-side partial first), then pure
  * narrow per-row projections/filters — no second shuffle, no
  * window, nothing driver-side. The gates use the same primitives as
  * [[TextAnalysis]] but compare MULTIPLICATIVELY on integers
  * (`(nd − sh) · den ≥ num · n`), so row selection never touches
  * floating point and the DuckDB oracle agrees on every row.
  *
  * This intentionally composes existing operators' semantics rather
  * than new ones: it is the "documents in → training corpus out"
  * surface, and the gate query (q73) regression-proves the composition
  * end to end, not just each piece.
  */
object Curation {

  /** LM-gate threshold (parts-per-million mean bigram conditional
    * probability, [[TextAnalysis.lmScore]]'s scale) used by the gated
    * gate queries. Probed against the testdata corpus at sf0.001 /
    * sf0.01 / sf0.1: lm_ppm spans ~29k–118k with median ~34k at every
    * scale, and 33 000 keeps 89–93% of documents at all three — a real
    * cut (the improbable tail CCNet's perplexity filter targets) that
    * never empties or no-ops the gate.
    */
  val LmGatePpm = 33000L

  /** DSIR hashed-feature geometry (q162): buckets for the hashed
    * uni+bigram features, and the selection size.
    */
  val DsirBuckets = 4096
  val DsirTopN = 50

  /** DSIR-style data selection (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * rank a CANDIDATE corpus by how target-like each document's hashed
    * n-gram profile is, using bag-of-hashed-ngrams models of a small
    * TARGET corpus vs the candidates themselves — the data-selection
    * step a pretraining pipeline runs to up-weight domain-relevant raw
    * data. Features are the paper's: unigrams + bigrams hashed into
    * [[DsirBuckets]] buckets (h60 mod B — non-negative in both
    * engines). Two deliberate house-style substitutions, both
    * documented divergences from the paper:
    *
    *  - the per-bucket log-probability ratio is LINEARIZED to a
    *    difference of add-1-smoothed scaled integer rates,
    *    `w(b) = 10⁶·(ct+1) div (Nt+B) − 10⁶·(cr+1) div (Nr+B)` — the
    *    q128 nbLexicon discipline: no `ln` exists that two engines
    *    round identically, and the rate difference is the same
    *    "target-likeness minus raw-likeness" signal in probability
    *    space (scores order differently than log space in general;
    *    what the engine pins is ITS selection, bit-for-bit);
    *  - selection is deterministic top-N by score (Gumbel resampling
    *    needs a random draw the oracle cannot replay; a seeded variant
    *    composes from [[hashSplit]]'s h60-keyed uniformity if sampling
    *    is wanted).
    *
    * Scale shape: the model is ONE feature-keyed aggregation per corpus
    * collapsing to ≤ B rows (map-combinable), joined into a ≤ B-row
    * weight table that BROADCASTS; scoring explodes candidate features
    * and folds Σw map-side per doc (rows of one doc are co-located, so
    * the partial aggregate collapses before the one doc-keyed
    * exchange); top-N is a TakeOrdered. The target corpus is small by
    * definition (it is the hand-curated domain sample); the candidate
    * corpus streams once.
    */
  def dsirSelect(target: DataFrame, candidates: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = DsirBuckets, topN: Int = DsirTopN): DataFrame =
    dsirScores(target, candidates, idCol, textCol, buckets)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)

  /** The DSIR importance scores (doc_id, score) behind [[dsirSelect]]
    * and [[dsirResample]] — factored so the deterministic top-N arm and
    * the seeded resampling arm share one scoring chain.
    */
  def dsirScores(target: DataFrame, candidates: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = DsirBuckets): DataFrame = {
    // r19 optimization: the hashed (token ++ adjacent-bigram) profile
    // comes from ONE byte scan per document
    // ([[graft.functions.FeatureBuckets]] — same md5-based h60 ids,
    // FeatureBucketsSpec pins it) instead of a split + bigram-concat +
    // explode + md5-hex + conv chain per FEATURE, and the scoring pass
    // folds the ≤B-row weight table over each document's bucket array
    // with a literal-table lookup (the q163 gumbel pattern — the table
    // is k-bounded driver model state either way; it used to broadcast
    // for a join). That removes the candidate-side explode (≈2×tokens
    // rows), the join probe per feature, and the per-doc aggregation
    // exchange: scoring is now a pure projection over the tracked
    // per-doc arrays.
    def docBuckets(df: DataFrame): DataFrame =
      Dedup.corpus(df, idCol, textCol)
        .select(col("doc_id"),
          graft.functions.FeatureBuckets.feature_buckets(col("text"), buckets)
            .as("fb"))
    // both per-doc bucket frames persist: each is read twice (totals +
    // model aggregation; candidates a third time for scoring) and each
    // is far smaller materialized than the text it derives from
    val tf = GraftCache.track(docBuckets(target))
    val cf = GraftCache.track(docBuckets(candidates))
    val tc = tf.select(explode(col("fb")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val cc = cf.select(explode(col("fb")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cr"))
    // corpus totals: 2 longs of driver model state (k-bounded metadata,
    // the nbLexicon pattern); an empty side is a caller error named here
    val nt = tf.agg(coalesce(sum(size(col("fb"))), lit(0L))).head().getLong(0)
    val nr = cf.agg(coalesce(sum(size(col("fb"))), lit(0L))).head().getLong(0)
    require(nt > 0 && nr > 0,
      s"dsirSelect: both corpora need features (target $nt, candidates $nr)")
    val w = cc.join(tc, Seq("b"), "left")
      .select(col("b"),
        (expr(s"(1000000 * (coalesce(ct, 0) + 1)) div ${nt + buckets}L") -
          expr(s"(1000000 * (cr + 1)) div ${nr + buckets}L")).as("w"))
    // ≤B rows of k-bounded model state; buckets no candidate feature
    // maps to stay 0 and are unreachable by construction (every
    // candidate bucket is in cc, hence in w). The collect is k-bounded
    // MODEL state, not data — make the bound explicit (VERDICT r19
    // "what's wrong" #4) so a future buckets growth cannot silently
    // turn this into a driver-side data pull.
    require(buckets <= (1 << 20),
      s"dsirScores: bucket table ($buckets) exceeds the driver-model bound 2^20")
    val wArr = new Array[Long](buckets)
    w.collect().foreach(r => wArr(r.getLong(0).toInt) = r.getLong(1))
    cf.select(col("doc_id"),
      aggregate(col("fb"), lit(0L), (acc, x) =>
        acc + element_at(typedLit(wArr.toSeq), (x + lit(1L)).cast("int")))
        .as("score"))
  }

  /** Gumbel-noise geometry for [[dsirResample]]: the quantized inverse
    * CDF's bucket count and the ×10⁶ integer scale, plus the default
    * per-score-unit inverse temperature (probed on the testdata corpus:
    * scores span ~[−450k, −40k] with IQR ≈ 200k at every sf, so λ = 10
    * puts the signal's IQR (~2.0e6) on the Gumbel IQR (~1.7e6) — both
    * terms decide).
    */
  val GumbelBuckets = 1024
  val DsirLambda = 10L

  /** Quantized standard-Gumbel inverse CDF: entry b is
    * round(−ln(−ln((b+0.5)/n)) · 10⁶) — computed ONCE on the driver and
    * embedded as the same integer literal table in BOTH engines, so no
    * `ln` is ever evaluated inside either engine (the q128/q162 no-ln
    * cross-engine discipline applied to the random draw itself).
    */
  def gumbelTable(n: Int = GumbelBuckets): IndexedSeq[Long] =
    (0 until n).map { b =>
      val u = (b + 0.5) / n
      math.round(-math.log(-math.log(u)) * 1e6)
    }

  /** The table as a DuckDB list literal, for the oracle. */
  def gumbelTableSql(n: Int = GumbelBuckets): String =
    gumbelTable(n).mkString("[", ",", "]")

  /** DSIR importance RESAMPLING (Xie et al. arXiv:2302.03169 §2 — the
    * paper's actual selection, vs [[dsirSelect]]'s deterministic top-N
    * arm): sample N candidates without replacement with probability
    * ∝ exp(λ·score) via the Gumbel-top-k equivalence — select the top N
    * of λ·score_i + G_i where G_i is standard Gumbel noise. The draw is
    * ENGINE-REPLAYABLE (VERDICT r17 #5): G_i comes from the quantized
    * inverse-CDF table ([[gumbelTable]]) indexed by the h60 content
    * hash of `seed` and the doc id — the [[hashSplit]] discipline, so
    * the same seed replays the same selection across runs, engines and
    * partitionings, and the oracle replays it exactly (the 1024-bucket
    * discretization of the Gumbel is the documented substitution, like
    * the linearized rate weights).
    *
    * Scale shape: [[dsirScores]]'s one broadcast-weight pass, then a
    * pure per-row projection (literal-array lookup + one multiply-add)
    * and a TakeOrdered — nothing beyond the scoring chain's cost.
    * Overflow-safe: |score·λ| < 2^40 at any document length, |G| ≤ 8e6.
    */
  def dsirResample(target: DataFrame, candidates: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = DsirBuckets, topN: Int = DsirTopN,
      lambda: Long = DsirLambda, seed: String = "dsir",
      noiseBuckets: Int = GumbelBuckets): DataFrame =
    dsirScores(target, candidates, idCol, textCol, buckets)
      .withColumn("g", element_at(typedLit(gumbelTable(noiseBuckets)),
        ((h60(concat(lit(s"gumbel:$seed:"), col("doc_id").cast("string")))
          % noiseBuckets) + 1).cast("int")))
      .withColumn("key", col("score") * lambda + col("g"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(topN)
      .select("doc_id", "score", "key")

  /** RHO-style excess-score data selection (Lin et al., "Rho-1: Not All
    * Tokens Are What You Need", arXiv:2404.07965 — the document-level
    * form of its excess-loss criterion): rank candidates by how much
    * MORE probable a reference-corpus LM finds them than the raw
    * corpus's own LM does. Two offline bigram LMs
    * ([[TextAnalysis.lmTable]] — one trained on the hand-curated
    * reference sample, one on the candidates themselves), each scoring
    * every candidate with [[TextAnalysis.lmScoreAgainst]]'s
    * integer-exact ppm mean (out-of-vocabulary bigrams at 0 ppm), and
    * the selection key is the exact integer difference
    * `excess = ref_ppm − raw_ppm` — a document generic under the raw
    * distribution but probable under the reference is exactly the
    * domain-relevant data the paper up-weights. House substitution,
    * documented like DSIR's: probability-space ppm difference instead
    * of log-loss difference (no `ln` exists that two engines round
    * identically; the ordering is the same "reference likes it, raw
    * doesn't" signal).
    *
    * Scale shape: both LM tables are vocabulary-bounded (the skewed
    * head aggregation runs on COLLAPSED bigram tables); the candidate
    * bigram stream probes each LM once through the composite-key join
    * (AQE-splittable), two per-doc folds, one TakeOrdered. The
    * reference corpus is small by definition.
    */
  def rhoSelect(reference: DataFrame, candidates: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      topN: Int = DsirTopN): DataFrame =
    rhoExcess(reference, candidates, idCol, textCol)
      .orderBy(col("excess").desc, col("doc_id"))
      .limit(topN)

  /** Per-document excess score (doc_id, ref_ppm, raw_ppm, excess) —
    * [[rhoSelect]]'s scoring chain without the selection cut, shared
    * with [[doremiReweight]]'s per-domain aggregation so the two cannot
    * drift.
    */
  private[graft] def rhoExcess(reference: DataFrame, candidates: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // r19 optimization (guide §2.4 "remove shuffles outright" + §1.2
    // "don't compute things twice"): the former shape ran
    // lmScoreAgainst TWICE — two independent candidate bigram explodes,
    // two probe joins, two per-doc aggregations, then a doc-keyed join
    // of the two score frames — and built the raw LM from a THIRD
    // explode of the same candidates. The candidate bigram stream is
    // now exploded ONCE (tracked: three consumers — raw-LM build and
    // the dual probe — which is past the r14 "one reuse is a wash"
    // threshold), probes BOTH vocabulary-bounded LM tables in sequence
    // (each keyed unique on (w1,w2), so no row multiplication), and
    // folds both ppm sums in ONE per-doc aggregation. Values are
    // bit-identical: same stream, same LEFT-join + coalesce-0
    // out-of-vocabulary rule, same exact integer `div` per score, and
    // the inner score join disappears because both scores share every
    // doc_id (same stream) — q165/q166 re-verified oracle-exact.
    val bgd = GraftCache.track(
      TextAnalysis.docBigrams(candidates, idCol, textCol))
    val refLm = TextAnalysis.lmTable(reference, idCol, textCol)
      .withColumnRenamed("ppm", "ppm_r")
    val rawLm = TextAnalysis.lmTableOf(bgd).withColumnRenamed("ppm", "ppm_w")
    bgd.join(refLm, Seq("w1", "w2"), "left")
      .join(rawLm, Seq("w1", "w2"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("ppm_r"), lit(0L))).as("sr"),
        sum(coalesce(col("ppm_w"), lit(0L))).as("sw"))
      .select(col("doc_id"),
        expr("sr div n_bigrams").as("ref_ppm"),
        expr("sw div n_bigrams").as("raw_ppm"),
        (expr("sr div n_bigrams") - expr("sw div n_bigrams")).as("excess"))
  }

  /** DoReMi-style mixture geometry (q166): weight scale (weights are
    * parts-of-[[DoremiScale]]), multiplicative-update step size,
    * update rounds, and the uniform-smoothing blend
    * `(Den−Num)/Den · normalized + Num/Den · uniform`.
    */
  val DoremiScale = 1000000L
  val DoremiEta = 10L
  val DoremiRounds = 4
  val DoremiSmoothNum = 1L
  val DoremiSmoothDen = 5L

  /** DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining",
    * arXiv:2305.10429) — the corpus-level capstone of the selection
    * family: instead of keeping/dropping documents, compute a per-DOMAIN
    * mixture weight table from per-domain excess scores via Group-DRO
    * multiplicative weights, and feed it to the sampler the engine
    * already ships ([[mixSample]] consumes the output as its
    * `rates`/`den` arguments).
    *
    * Chain, each step engine-replayable:
    *   1. per-document excess = [[rhoExcess]] (the q165 machinery: how
    *      much MORE probable the reference LM finds a document than the
    *      raw corpus's own LM — the proxy−reference excess-loss signal,
    *      in the house ppm probability space, no `ln`);
    *   2. per-domain score = Σ max(excess, 0) div n_d — the paper's
    *      clipped excess aggregated per domain (clip INSIDE the mean,
    *      §Algorithm 1's max(ℓ−ℓ_ref, 0); all-positive integer
    *      division, so floor ≡ trunc on both engines);
    *   3. T rounds of multiplicative weights over the k-row domain
    *      table, in EXACT DRIVER INTEGERS (the d²-discipline: k is a
    *      handful — iterating micro-frames would cost a job per round):
    *      u_d = w_d·(S + η·score_d), renormalize w'_d = u_d·S div Σu
    *      (the one product that exceeds int64 — BigInt on the driver ≡
    *      HUGEINT in the oracle, the q150 convention), then smooth
    *      toward uniform w_d = ((Den−Num)·w'_d + Num·(S div k)) div Den
    *      (the paper's c·u mixing that keeps every domain sampled).
    *      exp(η·excess) is linearized to (S + η·score)/S per round —
    *      the DSIR/RHO no-`ln` substitution, documented there.
    *
    * Output: one row per domain (source, score, weight), weight in
    * parts-of-[[DoremiScale]] — the trained mixture the paper's phase-2
    * run samples with; here `mixSample(corpus, rates, defaultRate,
    * den = DoremiScale)` applies it directly.
    *
    * Scale shape: the corpus-touching work is exactly [[rhoExcess]]'s
    * (vocabulary-bounded LM tables, one composite-key probe join per
    * LM) plus ONE per-domain aggregation; the MW iteration is k·T
    * driver integer ops on k-bounded model state. Nothing driver-side
    * grows with the corpus.
    */
  def doremiReweight(reference: DataFrame, candidates: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      groupCol: String = "source", rounds: Int = DoremiRounds,
      eta: Long = DoremiEta, smoothNum: Long = DoremiSmoothNum,
      smoothDen: Long = DoremiSmoothDen): DataFrame = {
    val spark = candidates.sparkSession
    val S = DoremiScale
    val ds = rhoExcess(reference, candidates, idCol, textCol)
      .join(candidates.select(col(idCol).as("doc_id"),
        col(groupCol).as("source")), "doc_id")
      .groupBy("source")
      .agg(expr("sum(greatest(excess, 0L)) div count(1)").as("score"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(ds.nonEmpty, "doremiReweight: no scored domains")
    val k = ds.length
    // driver-exact MW loop; all quantities non-negative, every div is
    // floor ≡ trunc ≡ DuckDB's `//`. Bounds: w ≤ S, score ≤ S, so
    // u ≤ S²·(1+η) ≤ 1.1e13 (int64-safe at η=10) and the renorm
    // product u·S ≤ 1.1e19 exceeds int64 → BigInt (≡ HUGEINT).
    val uniform = S / k
    var w: Seq[Long] = Seq.fill(k)(uniform)
    for (_ <- 1 to rounds) {
      val u = ds.toIndexedSeq.zip(w).map { case ((_, score), wd) =>
        wd * (S + eta * score) }
      val sumU = u.map(BigInt(_)).sum
      w = u.map { uv =>
        val norm = (BigInt(uv) * S / sumU).toLong
        ((smoothDen - smoothNum) * norm + smoothNum * uniform) / smoothDen
      }
    }
    import spark.implicits._
    ds.toIndexedSeq.zip(w).map { case ((src, score), wd) => (src, score, wd) }
      .toDF("source", "score", "weight")
      .orderBy("source")
  }

  /** Curate any (id, text) frame:
    *   1. exact dedup — min-id representative per distinct text;
    *   2. quality gate — distinct-token ratio minus stopword ratio
    *      ≥ qualityNum/qualityDen (integer compare);
    *   3. language gate — stopword density > 1/densityDen ("en"
    *      heuristic, same predicate as [[TextAnalysis.langId]]);
    *   4. (when `lmPpmMin` > 0) LM quality gate — the CCNet-style
    *      perplexity filter (Wenzek et al., arXiv:1911.00359) as one
    *      more integer predicate: keep documents whose
    *      [[TextAnalysis.lmScore]] under the corpus's own bigram LM
    *      (trained on the FULL input frame, duplicates included, like
    *      q154) is ≥ `lmPpmMin` ppm. The gate is a left-semi join on
    *      doc_id; duplicates share a text hence a score, so gating the
    *      representative equals gating the cluster. The LM machinery
    *      keeps q154's scale shape — head totals via a
    *      vocabulary-bounded window on the collapsed bigram table, one
    *      composite-key stream join.
    * Output: (doc_id, n_tokens, n_bpe_tokens, fp) — the id, the token
    * budget columns, and the cross-engine content fingerprint.
    */
  def curate(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      stopwords: Seq[String] = Seq("the", "a"),
      qualityNum: Int = 1, qualityDen: Int = 2,
      densityDen: Int = 20, lmPpmMin: Long = 0L): DataFrame = {
    // Quality + language gate as ONE boolean byte scan per row
    // ([[graft.functions.TokenStats.token_quality_gate]], r19): the
    // split + array_distinct + filter/isin triple allocated the token
    // array three times per row AND ran as an interpreted (non-codegen)
    // Filter; the single-pass predicate pushes below the dedup
    // aggregate like its predecessor — rows drop before the shuffle —
    // but is evaluated once instead of four inlined copies. n_tokens
    // for the survivors comes from the existing token_count scan.
    val gated = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .filter(graft.functions.TokenStats.token_quality_gate(
        col("text"), stopwords, qualityNum, qualityDen, densityDen))
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"),
        graft.functions.TokenScan.token_count(col("text")).as("n"))
    val lmGated =
      if (lmPpmMin <= 0) gated
      else gated.join(lmSurvivors(df, idCol, textCol, lmPpmMin,
        graft.functions.TokenStats.token_quality_gate(
          col(textCol), stopwords, qualityNum, qualityDen, densityDen)),
        Seq("doc_id"), "left_semi")
    lmGated
      .select(col("doc_id"), col("n").as("n_tokens"),
        // codegen byte scan, not the regex engine (BpeCount — the q35
        // lesson: same count, ~14× cheaper per row at corpus scale)
        graft.functions.BpeCount.bpe_count(col("text")).as("n_bpe_tokens"),
        h60(col("text")).as("fp"))
  }

  /** doc_ids passing the LM quality gate: lm_ppm ≥ `thr` under the
    * corpus bigram LM. Shared by [[curate]] and [[semanticCurate]].
    *
    * `probeGate` (r20): the caller's cheap per-row quality predicate.
    * Every doc_id this frame semi-join-gates already PASSES that
    * predicate (both callers filter on it before their dedup), so the
    * LM probe stream skips gate-failing documents up front — the LM
    * TABLE still trains on the full frame and every surviving doc's
    * score is bit-identical ([[TextAnalysis.lmScoreOver]]); only
    * probe work provably discarded by the semi join disappears.
    */
  private def lmSurvivors(df: DataFrame, idCol: String, textCol: String,
      thr: Long, probeGate: org.apache.spark.sql.Column): DataFrame =
    TextAnalysis.lmScoreOver(df, df.filter(probeGate), idCol, textCol)
      .filter(col("lm_ppm") >= thr).select("doc_id")

  /** (doc_id, h) for every word n-gram occurrence of an (id, text)
    * frame — 60-bit cross-engine hashes, NOT de-duplicated per document
    * (callers that need set semantics de-duplicate after filtering, so
    * the full corpus never pays a shuffle for it).
    */
  def ngramHashes(df: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    // r20: every n-gram hash in ONE byte scan
    // ([[graft.functions.SpanHash]], hash values pinned identical to the
    // split → concat_ws → md5-hex chain); short docs yield empty arrays
    // ≡ the old size filter
    df.select(col(idCol).as("doc_id"),
      explode(graft.functions.SpanHash.span_hash60(col(textCol), n)).as("h"))

  /** Benchmark decontamination: training documents sharing at least one
    * word n-gram with the benchmark set, with the count of distinct
    * contaminated n-grams per document.
    *
    * Scale shape: the benchmark n-gram set is tiny relative to the
    * corpus (eval suites are KBs–MBs; the corpus is TBs), so it is
    * de-duplicated and BROADCAST — the corpus side streams through a
    * broadcast hash join with no shuffle, and only the matching
    * (contaminated) n-grams reach the per-document count-distinct
    * aggregation.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, n: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchH = ngramHashes(bench, n, idCol, textCol).select("h").distinct()
    ngramHashes(train, n, idCol, textCol)
      .join(broadcast(benchH), Seq("h"))
      .groupBy("doc_id")
      .agg(countDistinct(col("h")).as("n_hits"))
  }

  /** Deterministic train/val assignment: content-hash mod `den`, val
    * when the residue is ≥ `den - valBuckets`. Pure per-row projection —
    * reproducible across runs, engines and partitionings, and stable
    * under corpus growth (a document's split never changes).
    */
  def hashSplit(df: DataFrame, textCol: String = "text",
      den: Int = 10, valBuckets: Int = 1): DataFrame =
    df.withColumn("split",
      when(h60(col(textCol)) % den < den - valBuckets, "train").otherwise("val"))

  /** Shards used by the q99 gate (thousands on a real corpus). */
  val GateShards = 8

  /** Deterministic training-shard layout: the final "global shuffle +
    * shard" step of a pretraining pipeline — every document gets a
    * hash-assigned shard and a reproducible position inside it, so the
    * training order is random-looking yet bit-identical across runs,
    * partitionings and engines (no `rand()` anywhere).
    *
    * Scale shape: shard assignment is a pure projection (h60 of the
    * salted id, mod `nShards`); the intra-shard position is ONE
    * row_number window per shard — the same per-output-file sort a
    * shard writer performs anyway, balanced because the shard count
    * (thousands at 100 TB, so each shard ≈ one output file) spreads
    * the windows across tasks.
    */
  def shardOrder(df: DataFrame, nShards: Int = GateShards,
      idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol).as("doc_id"))
      .withColumn("ord", h60(concat(lit("shard:"), col("doc_id").cast("string"))))
      .withColumn("shard", (col("ord") % nShards).cast("long"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard")
          .orderBy("ord", "doc_id")).cast("long"))
      .select("doc_id", "shard", "pos")

  /** Per-source sampling rates (percent) used by the q38 gate. */
  val MixGateRates: Seq[(String, Int)] =
    Seq("src0" -> 100, "src1" -> 75, "src2" -> 50, "src3" -> 25)
  val MixGateDefault = 10

  /** Deterministic data-mixing sampler: keep each document with a
    * per-source rate (rates/den per source, defaultRate/den elsewhere),
    * decided by content hash — the "upsample Wikipedia, downsample
    * CommonCrawl" knob of a pretraining mix. Membership is a pure
    * per-row projection: reproducible across runs, engines and
    * partitionings, stable under corpus growth (a document's fate never
    * changes as neighbors arrive — a Bernoulli `rand()` filter has
    * neither property), and consistent across pipeline stages that
    * re-evaluate it. One scan, zero shuffles.
    */
  def mixSample(df: DataFrame, rates: Seq[(String, Int)] = MixGateRates,
      defaultRate: Int = MixGateDefault, den: Int = 100,
      groupCol: String = "source", textCol: String = "text"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(groupCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(h60(concat(lit("mix:"), col(textCol))) % den < rate)
  }

  /** Corpus composition matrix: one row per source, one token-count
    * column per language — the report a mixing decision reads (and the
    * engine's PIVOT surface). One map-combinable aggregation; the
    * language list is declared (pivot over an unbounded value set would
    * need a distinct-collect planning pass — the declared list keeps
    * planning data-independent, which is what you want at 100 TB).
    */
  def composition(df: DataFrame, langs: Seq[String] = CompositionLangs,
      groupCol: String = "source", langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    df.groupBy(col(groupCol).as("source"))
      .pivot(langCol, langs)
      .agg(sum(size(split(col(textCol), " "))).cast("long"))
      .na.fill(0L, langs)

  /** Language columns of the q39 composition gate. */
  val CompositionLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Sequence packing for pretraining: assign every document a (bin,
    * offset) position in a stream of fixed `capacity`-token sequences.
    *
    * A global running token sum cannot be one Spark window (a
    * partitionless window is a single task), so this computes the
    * classic DISTRIBUTED PREFIX SUM: documents hash into `parts`
    * ordered buckets, the running sum is a per-bucket window, bucket
    * totals (a `parts`-row table) get a prefix window of their own,
    * and a broadcast join adds each bucket's global offset back — two
    * narrow passes and one tiny join at any corpus size. The global
    * order (bucket, content-hash, id) is deterministic and
    * partitioning-independent, so packing is reproducible run to run.
    * Documents may straddle a bin boundary (contiguous packing);
    * `offset` is the position of the document's first token within its
    * starting bin.
    */
  def packSequences(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", capacity: Int = 2048,
      parts: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pk").orderBy("h", "doc_id")
    val wp = org.apache.spark.sql.expressions.Window
      .orderBy("pk").rowsBetween(Long.MinValue, -1)
    // persisted: the scan + pk exchange + running-sum window feed BOTH
    // the per-bucket totals aggregation and the final join — untracked,
    // the operator's dominant cost would execute twice per action
    val local = GraftCache.track(df.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).as("n"), h60(col(textCol)).as("h"))
      .withColumn("pk", (col("h") % parts).cast("int"))
      .withColumn("cum", sum("n").over(w)))
    val prefix = local.groupBy("pk").agg(max("cum").as("tot"))
      .withColumn("pre", coalesce(sum("tot").over(wp), lit(0L)))
      .select("pk", "pre")
    local.join(broadcast(prefix), "pk")
      .withColumn("start", col("pre") + col("cum") - col("n"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        expr(s"start div $capacity").as("bin"),
        (col("start") % capacity).as("off"))
  }

  /** Per-group token-budget selection: rank each group's documents by
    * an integer quality score (distinct-minus-stopword tokens, id
    * tiebreak) and keep the best prefix whose running token total fits
    * `budget`. One per-group window — no global state, group
    * parallelism at any scale.
    */
  def tokenBudget(df: DataFrame, groupCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text",
      stopwords: Seq[String] = Seq("the", "a"),
      budget: Int = 800): DataFrame = {
    // one byte scan for n/q ([[graft.functions.TokenStats]], r19)
    val tq = graft.functions.TokenStats.token_quality(col(textCol), stopwords)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("q").desc, col("doc_id"))
    df.select(col(groupCol).as("grp"), col(idCol).as("doc_id"), tq.as("v"))
      .select(col("grp"), col("doc_id"),
        col("v").getItem(0).cast("int").as("n"),
        (col("v").getItem(1).cast("int") - col("v").getItem(2).cast("int")).as("q"))
      .withColumn("cum", sum("n").over(w))
      .filter(col("cum") <= budget)
      .select(col("grp"), col("doc_id"), col("n").as("n_tokens"), col("cum"))
  }

  /** Deterministic EXACT-fraction stratified sample: within every group,
    * rank documents by (content hash, id) and keep the first
    * ⌊cnt·num/den⌋ — so each stratum contributes exactly its proportional
    * share (a Bernoulli hash filter only hits the fraction in
    * expectation), and membership is reproducible across runs, engines
    * and partitionings. One hash shuffle on the group key; the rank and
    * count windows share its exchange and sort, and the integer
    * `rn·den ≤ cnt·num` compare keeps row selection off floating point.
    */
  def stratifiedSample(df: DataFrame, groupCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text",
      num: Int = 1, den: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("h", "doc_id")
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    df.select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
        h60(col(textCol)).as("h"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wc))
      .filter(col("rn") * den <= col("cnt") * num)
      .select("grp", "doc_id")
  }

  /** Deterministic WEIGHTED top-k sampling — priority sampling
    * (Duffield/Lund/Thorup) with an integer-exact key. Each document
    * draws its "uniform" from the cross-engine content hash
    * (u = h60(text)+1 ∈ [1, 2^60]) and competes with priority w/u;
    * selecting the k highest priorities favors heavy documents in
    * exactly the w-proportional way weighted reservoir sampling does,
    * and the whole selection is a pure function of the corpus — two
    * engines, or two runs months apart, pick the SAME k documents.
    *
    * The sort key is `u div w` ASCENDING (integer division): for
    * positive integers it orders identically to w/u descending up to
    * floor-ties, which the (u, id) tiebreak resolves deterministically.
    * No floating-point ln/pow (the textbook A-ES key) ever enters the
    * comparison, so there is no cross-engine ulp hazard at the k-th
    * boundary — same discipline as the DECIMAL money sums.
    *
    * Weight defaults to the document's n_chars (sample ∝ length — the
    * common "token-mass" proxy); any positive integer column works.
    */
  def weightedSample(df: DataFrame, k: Int,
      weightCol: String = "n_chars", idCol: String = "doc_id",
      textCol: String = "text",
      carryCols: Seq[String] = Seq("source")): DataFrame = {
    val u = (h60(col(textCol)) + 1).as("u")
    df.select(col(idCol).as("doc_id") +: carryCols.map(col) :+
        col(weightCol).cast("long").as("w") :+ u: _*)
      .withColumn("pk", expr("u div greatest(w, 1)"))
      .orderBy("pk", "u", "doc_id")
      .limit(k)
      .select("doc_id" +: carryCols :+ "w" :+ "pk" map col: _*)
  }

  /** The CAPSTONE composition — "documents in → training corpus out"
    * with BOTH dedup families: exact dedup picks one representative per
    * byte-identical text, semantic dedup keeps one representative per
    * embedding-space near-dup CLUSTER (connected components over the
    * sign-LSH pair graph of the representatives), then the quality +
    * language gates and the per-group token budget run over the
    * survivors. Every stage is an existing gated operator's semantics —
    * this wires them into one declarative program and gate-proves the
    * composition.
    *
    * `vecs` is a [[EmbeddingLsh.quantize]]d frame whose vec_id equals
    * the document id. Output: (grp, doc_id, n_tokens, cum).
    *
    * Scale shape: exact-dedup shuffle, the (bounded) LSH pair pipeline
    * over REPRESENTATIVES ONLY, the tiered component closure, one
    * semi-join back onto the corpus, narrow gates, one per-group
    * window. Nothing quadratic, nothing driver-side beyond the tiered
    * closure's bounded probe.
    */
  def semanticCurate(docs: DataFrame, vecs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      groupCol: String = "source",
      stopwords: Seq[String] = Seq("the", "a"),
      qualityNum: Int = 1, qualityDen: Int = 2, densityDen: Int = 20,
      budget: Int = 800, lmPpmMin: Long = 0L): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      col(groupCol).as("grp"))
    val rep = d.groupBy("text").agg(min("doc_id").as("vec_id")).select("vec_id")
    val repN = vecs.join(rep, Seq("vec_id"), "left_semi")
    val surv = Cluster.semanticClusters(repN, rep)
      .filter(col("vec_id") === col("canonical"))
      .select(col("vec_id").as("doc_id"))
    // Quality + language gate as ONE boolean byte scan (r19, see
    // [[curate]]); the surviving rows' n/q metrics come from a single
    // token_quality pass instead of the former three split-array passes.
    val tq = graft.functions.TokenStats.token_quality(col("text"), stopwords)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("q").desc, col("doc_id"))
    val gated = d.join(surv, Seq("doc_id"))
      .filter(graft.functions.TokenStats.token_quality_gate(
        col("text"), stopwords, qualityNum, qualityDen, densityDen))
      .select(col("grp"), col("doc_id"), tq.as("v"))
      .select(col("grp"), col("doc_id"),
        col("v").getItem(0).cast("int").as("n"),
        col("v").getItem(1).cast("int").as("nd"),
        col("v").getItem(2).cast("int").as("sh"))
    // LM gate BEFORE the budget window (CCNet order: an LM-rejected
    // document must not consume any group's token budget) — see
    // [[curate]] for the gate's semantics and scale shape
    val lmGated =
      if (lmPpmMin <= 0) gated
      else gated.join(lmSurvivors(docs, idCol, textCol, lmPpmMin,
        graft.functions.TokenStats.token_quality_gate(
          col(textCol), stopwords, qualityNum, qualityDen, densityDen)),
        Seq("doc_id"), "left_semi")
    lmGated
      .withColumn("q", col("nd") - col("sh"))
      .withColumn("cum", sum("n").over(w))
      .filter(col("cum") <= budget)
      .select(col("grp"), col("doc_id"), col("n").as("n_tokens"), col("cum"))
  }

  def queries: Seq[Q] = Seq(
    // Deterministic mixing sampler: per-source keep rates decided by
    // content hash; the gate checks the per-source kept doc/token mass.
    // DSIR-style hashed-importance data selection (q162): rank the
    // candidate corpus by how target-like its hashed n-gram profile is.
    Q("q162_dsir_select", {
      val B = DsirBuckets
      def feats(src: String, p: String): String =
        s"${p}a AS (SELECT doc_id, string_split(text, ' ') AS a FROM $src), " +
          s"${p}f AS (SELECT doc_id, ${h60Sql("tok")} % $B AS b FROM (" +
          s"SELECT doc_id, unnest(a) AS tok FROM ${p}a " +
          "UNION ALL " +
          "SELECT doc_id, unnest([a[i] || ' ' || a[i+1] " +
          s"FOR i IN generate_series(1, len(a) - 1)]) AS tok FROM ${p}a))"
      "WITH tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 3), " +
        "cand AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3), " +
        feats("tgt", "t") + ", " + feats("cand", "c") + ", " +
        "tc AS (SELECT b, COUNT(*)::BIGINT AS ct FROM tf GROUP BY b), " +
        "cc AS (SELECT b, COUNT(*)::BIGINT AS cr FROM cf GROUP BY b), " +
        "tot AS (SELECT (SELECT COUNT(*) FROM tf)::BIGINT AS nt, " +
        "(SELECT COUNT(*) FROM cf)::BIGINT AS nr), " +
        "w AS (SELECT cc.b AS b, " +
        s"(1000000 * (COALESCE(tc.ct, 0) + 1)) // (nt + $B) - " +
        s"(1000000 * (cc.cr + 1)) // (nr + $B) AS w " +
        "FROM cc LEFT JOIN tc ON cc.b = tc.b CROSS JOIN tot) " +
        "SELECT doc_id, CAST(SUM(w.w) AS BIGINT) AS score " +
        "FROM cf JOIN w ON cf.b = w.b GROUP BY doc_id " +
        s"ORDER BY score DESC, doc_id LIMIT $DsirTopN"
    }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      dsirSelect(docs.filter(col("doc_id") % 7 === 3),
        docs.filter(col("doc_id") % 7 =!= 3))
    },

    // DSIR importance RESAMPLING (q163): the paper's Gumbel-top-k draw,
    // engine-replayable — the oracle replays the same seeded selection
    // from the same quantized-Gumbel literal table, including the
    // LIMIT-boundary tiebreak.
    Q("q163_dsir_resample", {
      val B = DsirBuckets
      def feats(src: String, p: String): String =
        s"${p}a AS (SELECT doc_id, string_split(text, ' ') AS a FROM $src), " +
          s"${p}f AS (SELECT doc_id, ${h60Sql("tok")} % $B AS b FROM (" +
          s"SELECT doc_id, unnest(a) AS tok FROM ${p}a " +
          "UNION ALL " +
          "SELECT doc_id, unnest([a[i] || ' ' || a[i+1] " +
          s"FOR i IN generate_series(1, len(a) - 1)]) AS tok FROM ${p}a))"
      "WITH tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 3), " +
        "cand AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3), " +
        feats("tgt", "t") + ", " + feats("cand", "c") + ", " +
        "tc AS (SELECT b, COUNT(*)::BIGINT AS ct FROM tf GROUP BY b), " +
        "cc AS (SELECT b, COUNT(*)::BIGINT AS cr FROM cf GROUP BY b), " +
        "tot AS (SELECT (SELECT COUNT(*) FROM tf)::BIGINT AS nt, " +
        "(SELECT COUNT(*) FROM cf)::BIGINT AS nr), " +
        "w AS (SELECT cc.b AS b, " +
        s"(1000000 * (COALESCE(tc.ct, 0) + 1)) // (nt + $B) - " +
        s"(1000000 * (cc.cr + 1)) // (nr + $B) AS w " +
        "FROM cc LEFT JOIN tc ON cc.b = tc.b CROSS JOIN tot), " +
        "sc AS (SELECT doc_id, CAST(SUM(w.w) AS BIGINT) AS score " +
        "FROM cf JOIN w ON cf.b = w.b GROUP BY doc_id), " +
        s"gt AS (SELECT ${gumbelTableSql()} AS tab) " +
        s"SELECT doc_id, score, score * $DsirLambda + " +
        s"tab[((${h60Sql("'gumbel:dsir:'||doc_id")}) % $GumbelBuckets) + 1] AS key " +
        "FROM sc CROSS JOIN gt " +
        s"ORDER BY key DESC, doc_id LIMIT $DsirTopN"
    }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      dsirResample(docs.filter(col("doc_id") % 7 === 3),
        docs.filter(col("doc_id") % 7 =!= 3))
    },

    // RHO-style excess-score selection (q165): candidates the
    // reference LM finds more probable than the raw corpus's own LM —
    // both LMs, both probes (OOV at 0 ppm), and the excess difference
    // are exact integers, so the oracle hash-matches the selection
    // including the LIMIT boundary.
    Q("q165_rho_select", {
      def bigrams(src: String, p: String): String =
        s"${p}t AS (SELECT doc_id, string_split(text,' ') AS a FROM $src " +
          "WHERE len(string_split(text,' ')) >= 2), " +
          s"${p}b AS MATERIALIZED (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 " +
          "FROM (SELECT doc_id, unnest([{'w1': a[i], 'w2': a[i+1]} " +
          s"FOR i IN generate_series(1, len(a)-1)]) AS b FROM ${p}t))"
      def lmOf(p: String): String =
        s"${p}lm AS (SELECT w1, w2, (1000000 * c_big) // " +
          "(SUM(c_big) OVER (PARTITION BY w1)) AS ppm FROM " +
          s"(SELECT w1, w2, COUNT(*) AS c_big FROM ${p}b GROUP BY 1, 2))"
      def scoreOf(lm: String, out: String, as: String): String =
        s"$out AS (SELECT cb.doc_id, " +
          s"CAST(SUM(COALESCE($lm.ppm, 0)) // COUNT(*) AS BIGINT) " +
          s"AS $as FROM cb LEFT JOIN $lm " +
          s"ON cb.w1 = $lm.w1 AND cb.w2 = $lm.w2 GROUP BY cb.doc_id)"
      "WITH tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 3), " +
        "cand AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3), " +
        bigrams("tgt", "t") + ", " + bigrams("cand", "c") + ", " +
        lmOf("t") + ", " + lmOf("c") + ", " +
        scoreOf("tlm", "ref", "ref_ppm") + ", " +
        scoreOf("clm", "raw", "raw_ppm") + " " +
        "SELECT ref.doc_id AS doc_id, ref_ppm, raw_ppm, " +
        "CAST(ref_ppm - raw_ppm AS BIGINT) AS excess FROM ref JOIN raw " +
        "ON ref.doc_id = raw.doc_id " +
        s"ORDER BY excess DESC, doc_id LIMIT $DsirTopN"
    }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      rhoSelect(docs.filter(col("doc_id") % 7 === 3),
        docs.filter(col("doc_id") % 7 =!= 3))
    },

    // DoReMi domain reweighting (q166): per-domain clipped mean excess
    // (the q165 chain aggregated per source) → T exact-integer
    // multiplicative-weight rounds → the mixture-rate table mixSample
    // consumes. The oracle replays the SAME integer update — the MW
    // chain as MATERIALIZED CTE generations (the q150 discipline), the
    // one int64-exceeding renorm product in HUGEINT (≡ the driver's
    // BigInt) — so the final weights hash-match bit-for-bit.
    Q("q166_doremi_mix", {
      val S = DoremiScale
      def bigrams(src: String, p: String): String =
        s"${p}t AS (SELECT doc_id, string_split(text,' ') AS a FROM $src " +
          "WHERE len(string_split(text,' ')) >= 2), " +
          s"${p}b AS MATERIALIZED (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 " +
          "FROM (SELECT doc_id, unnest([{'w1': a[i], 'w2': a[i+1]} " +
          s"FOR i IN generate_series(1, len(a)-1)]) AS b FROM ${p}t))"
      def lmOf(p: String): String =
        s"${p}lm AS (SELECT w1, w2, (1000000 * c_big) // " +
          "(SUM(c_big) OVER (PARTITION BY w1)) AS ppm FROM " +
          s"(SELECT w1, w2, COUNT(*) AS c_big FROM ${p}b GROUP BY 1, 2))"
      def scoreOf(lm: String, out: String, as: String): String =
        s"$out AS (SELECT cb.doc_id, " +
          s"CAST(SUM(COALESCE($lm.ppm, 0)) // COUNT(*) AS BIGINT) " +
          s"AS $as FROM cb LEFT JOIN $lm " +
          s"ON cb.w1 = $lm.w1 AND cb.w2 = $lm.w2 GROUP BY cb.doc_id)"
      val mw = (1 to DoremiRounds).map { r =>
        s"u$r AS MATERIALIZED (SELECT source, score, " +
          s"w * ($S + $DoremiEta * score) AS u FROM w${r - 1}), " +
          s"w$r AS MATERIALIZED (SELECT source, score, " +
          s"(($DoremiSmoothDen - $DoremiSmoothNum) * " +
          s"CAST((u::HUGEINT * $S) // (SELECT SUM(u::HUGEINT) FROM u$r) " +
          s"AS BIGINT) + $DoremiSmoothNum * unif) // $DoremiSmoothDen AS w " +
          s"FROM u$r CROSS JOIN kk)"
      }.mkString(", ")
      "WITH tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 3), " +
        "cand AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 3), " +
        bigrams("tgt", "t") + ", " + bigrams("cand", "c") + ", " +
        lmOf("t") + ", " + lmOf("c") + ", " +
        scoreOf("tlm", "ref", "ref_ppm") + ", " +
        scoreOf("clm", "raw", "raw_ppm") + ", " +
        "ex AS MATERIALIZED (SELECT ref.doc_id AS doc_id, " +
        "GREATEST(ref_ppm - raw_ppm, 0) AS exc FROM ref JOIN raw " +
        "ON ref.doc_id = raw.doc_id), " +
        "ds AS MATERIALIZED (SELECT source, " +
        "CAST(SUM(exc) // COUNT(*) AS BIGINT) AS score " +
        "FROM ex JOIN cand ON ex.doc_id = cand.doc_id GROUP BY source), " +
        s"kk AS (SELECT ($S // COUNT(*))::BIGINT AS unif FROM ds), " +
        "w0 AS MATERIALIZED (SELECT source, score, unif AS w " +
        "FROM ds CROSS JOIN kk), " + mw + " " +
        s"SELECT source, score, CAST(w AS BIGINT) AS weight " +
        s"FROM w$DoremiRounds ORDER BY source"
    }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      doremiReweight(docs.filter(col("doc_id") % 7 === 3),
        docs.filter(col("doc_id") % 7 =!= 3))
    },

    Q("q38_mix_sample", {
      val rateCase = "CASE " + MixGateRates.map { case (k, v) =>
        s"WHEN source = '$k' THEN $v" }.mkString(" ") + s" ELSE $MixGateDefault END"
      "SELECT source, COUNT(*) AS n_docs, " +
        "CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens " +
        "FROM documents WHERE " + h60Sql("'mix:'||text") + s" % 100 < $rateCase " +
        "GROUP BY source ORDER BY source"
    }) { (s, dir) =>
      mixSample(Tables.load(s, dir, "documents"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
        .orderBy("source")
    },

    // Corpus composition matrix (source × language token counts) via
    // Spark's PIVOT — the report a mixing decision is made from.
    Q("q39_composition", {
      val langCols = CompositionLangs.map(l =>
        s"CAST(SUM(CASE WHEN lang = '$l' THEN len(string_split(text,' ')) ELSE 0 END) AS BIGINT) AS $l")
      "SELECT source, " + langCols.mkString(", ") +
        " FROM documents GROUP BY source ORDER BY source"
    }) { (s, dir) =>
      composition(Tables.load(s, dir, "documents")).orderBy("source")
    },

    // Full curation pass over `documents`: dedup + quality ≥ 1/2 +
    // 'en' density gate, token budgets and fingerprint per survivor.
    Q("q73_curate",
      "WITH rep AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text), " +
        "m AS (SELECT doc_id, text, len(string_split(text,' ')) AS n, " +
        "len(list_distinct(string_split(text,' '))) AS nd, " +
        "len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS sh FROM rep) " +
        "SELECT doc_id, n AS n_tokens, " +
        s"len(regexp_extract_all(text, '${TextAnalysis.BpePattern}')) AS n_bpe_tokens, " +
        h60Sql("text") + " AS fp " +
        "FROM m WHERE (nd - sh) * 2 >= n AND sh * 20 > n ORDER BY doc_id") { (s, dir) =>
      curate(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // Benchmark decontamination: bench = every 20th doc_id, train = the
    // rest; training docs sharing any word 4-gram with the bench set,
    // with distinct-contaminated-gram counts. Both engines join on the
    // same 60-bit gram hash.
    Q("q75_decontaminate",
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents), " +
        "g AS (SELECT doc_id, unnest([('0x'||substr(md5(" +
        "list_aggregate(a[i:i+3], 'string_agg', ' ')),1,15))::BIGINT " +
        "FOR i IN generate_series(1, len(a)-3)]) AS h FROM t WHERE len(a) >= 4), " +
        "bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 20 = 0) " +
        "SELECT g.doc_id AS doc_id, count(DISTINCT g.h) AS n_hits " +
        "FROM g JOIN bench USING (h) WHERE g.doc_id % 20 <> 0 " +
        "GROUP BY 1 ORDER BY doc_id") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0)).orderBy("doc_id")
    },

    // Sequence packing: (bin, offset) per document in 2048-token
    // sequences over the deterministic (hash-bucket, hash, id) order.
    // The oracle states the SAME order as ONE global window — legal at
    // oracle scale; the Spark side is the distributed two-pass prefix
    // sum over identical arithmetic.
    Q("q81_pack_sequences",
      "WITH sel AS (SELECT doc_id, len(string_split(text,' ')) AS n, " +
        h60Sql("text") + " AS h FROM documents), " +
        "c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY h % 64, h, doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS cum FROM sel) " +
        "SELECT doc_id, n AS n_tokens, CAST((cum - n) // 2048 AS BIGINT) AS bin, " +
        "CAST((cum - n) % 2048 AS BIGINT) AS off FROM c ORDER BY doc_id") { (s, dir) =>
      packSequences(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // Per-source token budget: best-quality prefix of each source
    // fitting 800 whitespace tokens.
    Q("q82_token_budget",
      "WITH m AS (SELECT source AS grp, doc_id, len(string_split(text,' ')) AS n, " +
        "len(list_distinct(string_split(text,' '))) - " +
        "len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS q " +
        "FROM documents), " +
        "c AS (SELECT grp, doc_id, n, SUM(n) OVER (PARTITION BY grp " +
        "ORDER BY q DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM m) " +
        "SELECT grp, doc_id, n AS n_tokens, CAST(cum AS BIGINT) AS cum FROM c WHERE cum <= 800 " +
        "ORDER BY grp, doc_id") { (s, dir) =>
      tokenBudget(Tables.load(s, dir, "documents")).orderBy("grp", "doc_id")
    },

    // Capstone: exact dedup -> semantic (embedding-cluster) dedup over
    // the representatives -> quality/language/LM gates -> per-source
    // token budget, as ONE declarative program. The oracle composes the
    // same CTE chains the individual gates use (rep dedup, quantized
    // vectors, sign-LSH pairs over the representative subset, recursive
    // closure, gate predicates, the q154 LM chain thresholded at
    // LmGatePpm, budget window). r15: the LM gate joined the capstone —
    // CCNet uses the perplexity score as a GATE, not a report.
    Q("q91_semantic_curate",
      "WITH RECURSIVE rep AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text), " +
        graft.operators.EmbeddingLsh.quantizedSql + ", " +
        "nr AS (SELECT n.* FROM n JOIN rep ON n.vec_id = rep.doc_id), " +
        graft.operators.Dedup.embPairsCtesFor("nr") + ", " +
        "e AS (SELECT v1 AS d1, v2 AS d2 FROM epairs UNION SELECT v2, v1 FROM epairs), " +
        "r AS (SELECT d1 AS v, d2 AS u FROM e " +
        " UNION SELECT r.v, e.d2 FROM r JOIN e ON r.u = e.d1), " +
        "lab AS (SELECT v, LEAST(v, MIN(u)) AS cluster FROM r GROUP BY v), " +
        "surv AS (SELECT rep.doc_id FROM rep LEFT JOIN lab ON rep.doc_id = lab.v " +
        " WHERE rep.doc_id = COALESCE(lab.cluster, rep.doc_id)), " +
        TextAnalysis.lmGateCtes(LmGatePpm) + ", " +
        "m AS (SELECT d.source AS grp, d.doc_id, len(string_split(d.text,' ')) AS n, " +
        " len(list_distinct(string_split(d.text,' '))) AS nd, " +
        " len(list_filter(string_split(d.text,' '), t -> t IN ('the','a'))) AS sh " +
        " FROM documents d JOIN surv ON d.doc_id = surv.doc_id " +
        " JOIN lms ON d.doc_id = lms.doc_id), " +
        "g AS (SELECT grp, doc_id, n, nd - sh AS q FROM m " +
        " WHERE (nd - sh) * 2 >= n AND sh * 20 > n), " +
        "c AS (SELECT grp, doc_id, n, SUM(n) OVER (PARTITION BY grp " +
        " ORDER BY q DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM g) " +
        "SELECT grp, doc_id, n AS n_tokens, CAST(cum AS BIGINT) AS cum FROM c WHERE cum <= 800 " +
        "ORDER BY grp, doc_id") { (s, dir) =>
      semanticCurate(Tables.load(s, dir, "documents"),
        graft.operators.EmbeddingLsh.quantized(s, dir),
        lmPpmMin = LmGatePpm).orderBy("grp", "doc_id")
    },

    // LM-gated curation over documents only — the q73 pipeline with the
    // CCNet perplexity gate composed in (the lm family's curve-able
    // composed form: one fact table, doc_id-shiftable).
    Q("q155_lm_gated_curate",
      "WITH rep AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text), " +
        TextAnalysis.lmGateCtes(LmGatePpm) + ", " +
        "m AS (SELECT doc_id, text, len(string_split(text,' ')) AS n, " +
        "len(list_distinct(string_split(text,' '))) AS nd, " +
        "len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS sh FROM rep) " +
        "SELECT doc_id, n AS n_tokens, " +
        s"len(regexp_extract_all(text, '${TextAnalysis.BpePattern}')) AS n_bpe_tokens, " +
        h60Sql("text") + " AS fp " +
        "FROM m WHERE (nd - sh) * 2 >= n AND sh * 20 > n " +
        "AND doc_id IN (SELECT doc_id FROM lms) ORDER BY doc_id") { (s, dir) =>
      curate(Tables.load(s, dir, "documents"), lmPpmMin = LmGatePpm)
        .orderBy("doc_id")
    },

    // Exact 1-in-5 stratified sample per source in deterministic
    // (content-hash, id) order.
    Q("q85_stratified_sample",
      "WITH m AS (SELECT source AS grp, doc_id, " + h60Sql("text") + " AS h FROM documents), " +
        "r AS (SELECT grp, doc_id, row_number() OVER (PARTITION BY grp ORDER BY h, doc_id) AS rn, " +
        "COUNT(*) OVER (PARTITION BY grp) AS cnt FROM m) " +
        "SELECT grp, doc_id FROM r WHERE rn * 5 <= cnt " +
        "ORDER BY grp, doc_id") { (s, dir) =>
      stratifiedSample(Tables.load(s, dir, "documents")).orderBy("grp", "doc_id")
    },

    // Deterministic stratified split accounting: per (source, split)
    // document and whitespace-token totals — the budget sheet a
    // pipeline checks before training.
    Q("q77_hash_split",
      "SELECT source, CASE WHEN ('0x'||substr(md5(text),1,15))::BIGINT % 10 < 9 " +
        "THEN 'train' ELSE 'val' END AS split, count(*) AS n_docs, " +
        "CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tokens " +
        "FROM documents GROUP BY 1, 2 ORDER BY source, split") { (s, dir) =>
      hashSplit(Tables.load(s, dir, "documents"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).as("n_tokens"))
        .orderBy("source", "split")
    },

    // Deterministic weighted top-k sampling (priority sampling with an
    // integer-exact key — see weightedSample): longer documents are
    // proportionally favored, and the selected SET is bit-identical
    // across engines because the priority order never touches floats.
    Q("q136_weighted_sample",
      "WITH m AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w, " +
        "(" + h60Sql("text") + " + 1) AS u FROM documents), " +
        "p AS (SELECT doc_id, source, w, u // GREATEST(w, 1) AS pk, u FROM m) " +
        "SELECT doc_id, source, w, pk FROM p " +
        "ORDER BY pk, u, doc_id LIMIT 500") { (s, dir) =>
      weightedSample(Tables.load(s, dir, "documents"), 500)
    },

    // Deterministic shard + intra-shard order for training layout: the
    // salted id hash is both the shard assignment and the shuffle key,
    // so the "random" training order is reproducible bit-for-bit.
    Q("q99_shard_order",
      "WITH o AS (SELECT doc_id, " +
        h60Sql("'shard:'||doc_id") + " AS ord FROM documents) " +
        s"SELECT doc_id, ord % $GateShards AS shard, " +
        s"row_number() OVER (PARTITION BY ord % $GateShards ORDER BY ord, doc_id)::BIGINT AS pos " +
        "FROM o ORDER BY doc_id") { (s, dir) =>
      shardOrder(Tables.load(s, dir, "documents")).orderBy("doc_id")
    }
  )
}
