package graft.operators

import graft.{Q, Tables}
import graft.functions.{CrossHash, RollingHash}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristics, and document fingerprinting.
  *
  * All arithmetic that decides row selection or output values is exact
  * (integer counts, multiplicative threshold compares, IEEE-identical
  * divisions of exact ints) so the DuckDB oracle reproduces every value
  * bit-for-bit.
  *
  * Scale notes (100 TB design): every query is a single narrow
  * projection over the scan — no shuffle except the final presentation
  * ORDER BY. Token/shingle work happens inside per-row higher-order
  * functions (`split`, `filter`, `transform`) which stay in
  * WholeStageCodegen; nothing explodes except where set semantics
  * require it.
  */
object TextAnalysis {
  import CrossHash.h60

  private def toks = split(col("text"), " ")

  /** q121 histogram-sketch capacity (small enough that the gate
    * exercises the COARSE regime on the test corpus). */
  val HistCap = 16

  // ---- public library surface -------------------------------------------
  // Each operator takes any (id, text) frame; the q30-q34 gate entries
  // below are these operators instantiated on the `documents` table.

  private def corpus(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String) =
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))

  /** Token/char counts + vowel-run density per document. Fully
    * split-free: every column is a byte scan or length — q30 carries
    * no per-row array allocation at all ([[graft.functions.TokenScan]]
    * pins `token_count` ≡ `size(split(text, " "))`).
    */
  def tokenStats(df: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val nTok = graft.functions.TokenScan.token_count(col("text"))
    corpus(df, idCol, textCol)
      .select(col("doc_id"),
        nTok.as("n_tokens"),
        length(col("text")).as("len_chars"),
        ((length(col("text")) - (nTok - lit(1))).cast("double") / nTok)
          .as("avg_tok_len"),
        // class-run byte scan, not the regex engine (the BpeCount
        // lesson; CharRunCountSpec pins equality with the regex)
        graft.functions.CharRunCount.char_run_count(col("text"), "aeiou")
          .as("n_vowel_runs"))
  }

  /** Distinct-ratio minus stopword-ratio quality score. */
  def qualityScore(df: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      stopwords: Seq[String] = Seq("the", "a")): org.apache.spark.sql.DataFrame =
    // ONE byte scan ([[graft.functions.TokenStats.token_quality]], r19)
    // replaces three split-array passes (size, array_distinct,
    // filter/isin); int casts keep the former schema, and the quality
    // division divides the same exactly-representable integer values.
    corpus(df, idCol, textCol)
      .select(col("doc_id"),
        graft.functions.TokenStats.token_quality(col("text"), stopwords).as("v"))
      .select(col("doc_id"),
        col("v").getItem(0).cast("int").as("n_tokens"),
        col("v").getItem(2).cast("int").as("stop_hits"),
        col("v").getItem(1).cast("int").as("n_distinct"),
        (col("v").getItem(1).cast("double") / col("v").getItem(0) -
          col("v").getItem(2).cast("double") / col("v").getItem(0)).as("quality"))

  /** The stopword-density language heuristic as a column expression
    * (shared by [[langId]], the q32 gate, and the q120 confusion
    * matrix): `en` when stopword density exceeds 1/`densityDen`,
    * multiplicative integer compare.
    */
  def langPred(text: org.apache.spark.sql.Column,
      stopwords: Seq[String] = Seq("the", "a"),
      densityDen: Int = 20): org.apache.spark.sql.Column = {
    // allocation-free token scans ([[graft.functions.TokenScan]]) —
    // byte-equal to size(split)/size(filter(split)), no per-row array.
    // An empty stopword list classifies everything 'unk', as the old
    // filter/isin form did (token_hits itself requires non-empty words)
    val stopHits =
      if (stopwords.isEmpty) lit(0)
      else graft.functions.TokenScan.token_hits(text, stopwords)
    when(stopHits * densityDen > graft.functions.TokenScan.token_count(text),
      "en").otherwise("unk")
  }

  /** Stopword-density language heuristic (integer threshold compare). */
  def langId(df: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      stopwords: Seq[String] = Seq("the", "a"),
      densityDen: Int = 20): org.apache.spark.sql.DataFrame =
    corpus(df, idCol, textCol)
      .select(col("doc_id"),
        langPred(col("text"), stopwords, densityDen).as("lang_pred"))

  /** Per-group adaptive histogram of an integral column, long form
    * (grp, shift, bin_lo, cnt) — [[graft.functions.RankHist]]'s
    * capacity-bounded power-of-two sketch. Complements the EXACT
    * [[lengthQuantiles]]: that operator shuffles every row to its
    * group; this one's aggregation state is O(capacity) longs per
    * group, map-side combinable, with a `2^shift` value-error bound on
    * any quantile read from it — and because greedy coarsening is
    * merge-order independent, the output is bit-identical across
    * partitionings, merge orders, and engines (the q121 gate
    * hash-matches DuckDB even in the approximate regime).
    */
  def valueHistogram(df: org.apache.spark.sql.DataFrame, groupCol: String,
      valueCol: String, capacity: Int): org.apache.spark.sql.DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(graft.functions.RankHist.rank_hist(col(valueCol), capacity).as("h"))
      .select(col("grp"), col("h.shift").as("shift"), explode(col("h.bins")).as("b"))
      .select(col("grp"), col("shift"), col("b.bin_lo").as("bin_lo"), col("b.cnt").as("cnt"))

  /** Classifier evaluation as a query: the confusion matrix of a
    * predicted label column against a ground-truth column — ONE
    * map-side-combinable aggregation whose output is |labels|² rows at
    * any corpus size. The same eval-as-query discipline as the ANN
    * recall gate ([[Similarity.recallAtK]]): a heuristic whose accuracy
    * is unmeasured at corpus scale is unshippable.
    */
  def confusionMatrix(df: org.apache.spark.sql.DataFrame, actualCol: String,
      predCol: String): org.apache.spark.sql.DataFrame =
    df.groupBy(col(actualCol).as("actual"), col(predCol).as("predicted"))
      .agg(count(lit(1)).as("n"))

  /** BPE-ish subword proxy pattern: letter runs, single digits, single
    * punctuation — the GPT-2 pre-tokenizer's shape without lookarounds,
    * so Java regex and RE2 (DuckDB) agree on every match.
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  /** Whitespace and BPE-ish token counts per document — the cost model
    * columns a training-data pipeline budgets by.
    */
  def tokenCounts(df: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    corpus(df, idCol, textCol)
      .select(col("doc_id"),
        graft.functions.TokenScan.token_count(col("text")).as("n_ws_tokens"),
        // count by char-class scan, not regex: the BPE pattern is a
        // deterministic partition of character classes, and the regex
        // engine's alternation loop was the text curve's dominant
        // per-row cost (A/B at the 500 k-doc point: regexp_extract_all
        // 7.4 s ≈ regexp_count 7.7 s vs byte scan 0.53 s — see BpeCount)
        graft.functions.BpeCount.bpe_count(col("text")).as("n_bpe_tokens"))

  /** Repetition metrics per document (Gopher-style quality signals):
    * duplicate-bigram count (n_bigrams − distinct bigrams) and the
    * occurrence count of the most frequent token, plus a flag when
    * either exceeds its threshold (duplicate-bigram fraction > 1/`repDen`
    * or top-token fraction > 2/`topDen` — multiplicative integer
    * compares). The top-token count is the longest equal-run of the
    * SORTED token array, computed by a single `aggregate` fold — all
    * metrics are per-row higher-order functions, so the operator is a
    * narrow projection with no shuffle at any corpus size.
    */
  def repetitionStats(df: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      repDen: Int = 10, topDen: Int = 10): org.apache.spark.sql.DataFrame =
    // ONE byte scan per row ([[graft.functions.TokenStats.rep_stats]],
    // r19): the former shape split the text into an array, built a
    // bigram STRING per position (transform + concat), hashed them
    // through array_distinct, and SORTED the token array for the
    // longest-equal-run fold — four per-row array passes with O(n)
    // string allocations each. rep_stats computes all three metrics in
    // one pass over the text bytes (bigram distinctness over zero-copy
    // spans, top-token count as max multiplicity — no sort exists);
    // TokenStatsSpec property-pins value equality with the split form.
    corpus(df, idCol, textCol)
      // pre-filter via the cheap token_count scan, NOT the derived
      // column: a filter on v's elements pushes below the Project and
      // re-evaluates the whole rep_stats per row (guide §4.4 shape)
      .filter(graft.functions.TokenScan.token_count(col("text")) >= 2)
      .select(col("doc_id"),
        graft.functions.TokenStats.rep_stats(col("text")).as("v"))
      .select(col("doc_id"),
        col("v").getItem(0).cast("int").as("n_tokens"),
        (col("v").getItem(0).cast("int") - 1).as("n_bigrams"),
        col("v").getItem(1).cast("int").as("n_dup_bigrams"),
        col("v").getItem(2).as("top_tok_count"))
      .withColumn("flagged",
        (col("n_dup_bigrams") * repDen > col("n_bigrams") ||
          col("top_tok_count") * topDen > col("n_tokens") * 2).cast("int"))

  /** Top distinctive terms per group by TF-IDF: term frequency within
    * the group × (number of groups ÷ group-document-frequency of the
    * term). The score is ONE division of exact int64 products (< 2^53),
    * which IEEE 754 rounds identically everywhere — the same
    * determinism trick as the cosine operators — so ranking and output
    * hash-match cross-engine (a log-damped IDF would not: `ln` is not
    * correctly rounded in either engine).
    *
    * Scale shape: one (group, term) count aggregation (map-side
    * combinable over the exploded token stream), a term-keyed DF
    * aggregation OVER THE ALREADY-AGGREGATED pairs (vocabulary-sized,
    * not corpus-sized), an equi-join on the term key, and a per-group
    * top-k window over vocabulary-sized data. The raw corpus shuffles
    * once.
    */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame,
      groupCol: String = "source", textCol: String = "text",
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    val tf = df.select(col(groupCol).as("grp"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy("grp", "tok").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val ns = df.select(countDistinct(col(groupCol)).as("ns"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("tok"))
    tf.join(dft, "tok").crossJoin(broadcast(ns))
      .select(col("grp"), col("tok"), col("tf"), col("df"),
        ((col("tf") * col("ns")).cast("double") / col("df")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("grp", "tok", "tf", "df", "score")
  }

  /** Per-group token-length distribution: exact DISCRETE quantiles
    * (the value at rank ⌈q·cnt⌉ — pure integer arithmetic, no
    * interpolation, so both engines agree bit-for-bit where
    * interpolated percentiles would not), plus min/max/count. One hash
    * shuffle on the group key; the rank and count windows share the
    * exchange and sort.
    */
  def lengthQuantiles(df: org.apache.spark.sql.DataFrame,
      groupCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("n", "doc_id")
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    df.select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).as("n"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wc))
      .groupBy("grp").agg(
        max(when(col("rn") === expr("(cnt + 3) div 4"), col("n"))).as("p25"),
        max(when(col("rn") === expr("(cnt + 1) div 2"), col("n"))).as("p50"),
        max(when(col("rn") === expr("(3 * cnt + 3) div 4"), col("n"))).as("p75"),
        max("n").as("mx"), min("n").as("mn"), count(lit(1)).as("n_docs"))
  }

  /** Blocklist redaction (the C4-style bad-words pass a training
    * pipeline runs before anything else): replace every word-boundary
    * occurrence of a blocklisted term with `mask`, and count the
    * replacements per document. Pure narrow projection — two regex
    * passes per row inside WholeStageCodegen, no shuffle at any corpus
    * size. The pattern sticks to the `\b`/alternation subset that Java
    * regex and RE2 (DuckDB) interpret identically.
    */
  def redactTerms(df: org.apache.spark.sql.DataFrame,
      terms: Seq[String] = Seq("customer", "spark"),
      mask: String = "<x>", idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    // escape per-character, NOT Pattern.quote: RE2 (the DuckDB oracle's
    // engine) has no \Q…\E, so a term like "c++" or "a.b" must become
    // literal via backslash escapes both engines read identically.
    // \b only exists at word-char/non-word-char transitions, so it is
    // asserted per term edge ONLY where the edge is a word character —
    // "\bc\+\+\b" can never match "c++ " (no boundary between + and
    // space), and RE2 has no lookaround to express the general case.
    def isWord(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
    val pat = terms.filter(_.nonEmpty).map { t =>
      (if (isWord(t.head)) "\\b" else "") + escapeRegex(t) +
        (if (isWord(t.last)) "\\b" else "")
    }.mkString("(", "|", ")")
    // one matcher pass for count + rewrite ([[graft.functions.RegexRedact]], r19)
    corpus(df, idCol, textCol)
      .select(col("doc_id"),
        graft.functions.RegexRedact.regex_redact(col("text"), pat, mask).as("r"))
      .select(col("doc_id"), col("r.n").as("n_redacted"),
        col("r.t").as("text_redacted"))
  }

  /** Escape a literal string for use inside a regex, in the shared
    * Java-regex ∩ RE2 dialect (backslash-escape each metacharacter —
    * `\Q…\E` is Java-only).
    */
  private[operators] def escapeRegex(s: String): String =
    s.flatMap { c =>
      if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) s"\\$c" else c.toString
    }

  /** PII patterns shared by the operator and its oracle. Restricted to
    * the regex subset Java regex and RE2 (DuckDB) interpret identically:
    * character classes, bounded repetition, `\b`, `\d` — no lookaround,
    * no backreferences.
    */
  val PiiEmail: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIp: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhone: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII detection + redaction — the privacy-scrub pass a training-data
    * pipeline runs over raw web text (emails, IPv4 addresses, NANP-style
    * phone numbers; reference's pipeline has no PII stage, this is part
    * of the training-data surface beyond it).
    *
    * Counting and masking run as a SEQUENTIAL pipeline (emails, then
    * IPs, then phones), each stage counting on the PREVIOUS stage's
    * redacted text — so `n_*` is exactly the number of replacements
    * performed and a span consumed by an earlier stage (digits inside
    * an email local part, say) is never double-counted by a later one.
    *
    * Scale shape: one narrow projection, three codegen'd
    * `regexp_count`/`regexp_replace` pairs per row, no shuffle at any
    * corpus size.
    */
  def piiRedact(df: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    // ONE matcher pass per pattern ([[graft.functions.RegexRedact]],
    // r19): count and replacement come out of the same find() loop, so
    // the chain runs 3 regex scans per row instead of 6 (each pattern
    // was scanned once to count and once to rewrite). Same engine, same
    // patterns — RegexRedactSpec pins (n, t) against the built-ins.
    val r1 = graft.functions.RegexRedact.regex_redact(
      col("text"), PiiEmail, "<EMAIL>")
    corpus(df, idCol, textCol)
      .select(col("doc_id"), r1.as("r1"))
      .select(col("doc_id"), col("r1.n").as("n_emails"),
        graft.functions.RegexRedact.regex_redact(col("r1.t"), PiiIp, "<IP>")
          .as("r2"))
      .select(col("doc_id"), col("n_emails"), col("r2.n").as("n_ips"),
        graft.functions.RegexRedact.regex_redact(col("r2.t"), PiiPhone, "<PHONE>")
          .as("r3"))
      .select(col("doc_id"), col("n_emails"), col("n_ips"),
        col("r3.n").as("n_phones"), col("r3.t").as("text_clean"))
  }

  /** Vocabulary pruning / OOV mapping (the tokenizer-prep step): build
    * the top-`k` token vocabulary by corpus frequency (count desc, token
    * tiebreak) and rewrite every out-of-vocabulary token to `unk`.
    *
    * Scale shape: the vocabulary is SMALL MODEL STATE (like the k-means
    * centroids of q78) — one map-side-combinable (token → count)
    * aggregation over the exploded stream, top-k collected to the
    * driver, then shipped back as a literal array so the rewrite is a
    * shuffle-free per-row `transform` with an O(k) membership probe
    * inside codegen. The corpus itself never shuffles and is scanned
    * exactly twice (once to count, once to rewrite).
    */
  def vocabPrune(df: org.apache.spark.sql.DataFrame, k: Int = 20,
      unk: String = "<unk>", idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = GraftCache.scoped {
    import df.sparkSession.implicits._
    val vocab: Array[String] = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(k)
      .select("tok").as[String].collect().sorted
    val vs = array(vocab.toSeq.map(lit): _*)
    corpus(df, idCol, textCol)
      .select(col("doc_id"),
        concat_ws(" ", transform(toks,
          t => when(array_contains(vs, t), t).otherwise(lit(unk)))).as("text_pruned"),
        size(filter(toks, t => !array_contains(vs, t))).as("n_oov"))
  }

  /** Corpus heavy hitters via the mergeable Misra–Gries sketch
    * ([[graft.functions.FreqSketch]]): top-`k` tokens by (counter desc,
    * token). With `capacity` ≥ the distinct-token count the counters are
    * exact (the oracle regime); below it they undercount by at most
    * n/(capacity+1) — the trade that keeps state O(capacity) per group
    * at any corpus size, where an exact GROUP BY's state is
    * vocabulary-sized.
    */
  def heavyHitters(df: org.apache.spark.sql.DataFrame, k: Int = 10,
      capacity: Int = 64,
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    df.select(explode(split(col(textCol), " ")).as("tok"))
      .agg(graft.functions.FreqSketch.freq_sketch(col("tok"), capacity).as("m"))
      .select(explode(col("m")).as(Seq("tok", "cnt")))
      .orderBy(col("cnt").desc, col("tok")).limit(k)

  /** Content fingerprints: the cross-engine 60-bit md5 hash plus the
    * native codegen rolling hash ([[graft.functions.RollingHash]]).
    */
  def fingerprints(df: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    corpus(df, idCol, textCol)
      .select(col("doc_id"), h60(col("text")).as("fp"),
        RollingHash.rolling_hash(col("text")).as("rfp"))

  /** Chunk window / stride for [[chunkWindows]]'s q36 gate (token
    * counts sized to the synthetic corpus; an embedding pipeline would
    * pass its model's context size).
    */
  val ChunkW = 32
  val ChunkS = 16

  /** Sliding-window chunking: split each document into overlapping
    * token windows of `w` tokens at stride `s` — the unit an embedding
    * / RAG indexing pipeline feeds its encoder. Emits (doc_id,
    * chunk_id, n_tok, fp) with the cross-engine fingerprint of each
    * chunk's text; the final short window is kept (n_tok < w), and a
    * document shorter than one window yields exactly one chunk.
    *
    * Scale shape: pure per-row compute — one projection + explode, no
    * shuffle, no state; parallelism is the scan's. Chunk text is
    * re-derivable from (doc_id, chunk_id), so only the fingerprint
    * travels.
    */
  def chunkWindows(df: org.apache.spark.sql.DataFrame, w: Int = ChunkW,
      s: Int = ChunkS, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    // s > w would both skip tokens and emit a phantom empty chunk past
    // the end (slice() returns [], concat_ws "" — review finding)
    require(w >= 1 && s >= 1 && s <= w,
      s"chunkWindows requires 1 <= stride <= window, got w=$w s=$s")
    corpus(df, idCol, textCol)
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, CASE WHEN size(a) <= $w THEN 0 " +
          s"ELSE (size(a) - $w + $s - 1) div $s END), " +
          s"j -> struct(j AS chunk_id, concat_ws(' ', slice(a, 1 + j*$s, $w)) AS c))"))
        .as("ch"))
      .select(col("doc_id"), col("ch.chunk_id").cast("long").as("chunk_id"),
        size(split(col("ch.c"), " ")).cast("long").as("n_tok"),
        h60(col("ch.c")).as("fp"))
  }

  /** Top bigrams kept by the q37 gate. */
  val LmTopK = 100

  /** Corpus bigram language-model statistics: per-bigram count, head
    * count, and the conditional probability P(w2 | w1) — the table a
    * KenLM-style perplexity quality filter trains on. The probability
    * is ONE IEEE division of two exact int64 counts, so both engines
    * produce the identical double.
    *
    * Scale shape: bigram counting is one map-side-combinable
    * aggregation over the exploded token stream (int64-sized rows);
    * head totals are a second aggregation over the already-collapsed
    * bigram table (vocabulary-sized), joined back on w1 — an
    * AQE-skew-splittable shuffle join (stopword heads are the hot
    * keys). Top-K is a TakeOrdered, never a global sort.
    */
  def bigramLm(df: org.apache.spark.sql.DataFrame, k: Int = LmTopK,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val bg = corpus(df, idCol, textCol)
      .select(split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(a)-1), " +
          "i -> struct(element_at(a,i) AS w1, element_at(a,i+1) AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_big"))
    val c1 = c2.groupBy("w1").agg(sum(col("c_big")).as("c_head"))
    c2.join(c1, "w1")
      .select(col("w1"), col("w2"), col("c_big"), col("c_head"),
        (col("c_big").cast("double") / col("c_head")).as("cond_p"))
      .orderBy(desc("c_big"), col("w1"), col("w2")).limit(k)
  }

  /** Per-document LM quality score — the CCNet-style perplexity filter
    * (Wenzek et al., arXiv:1911.00359) in integer-exact form: score
    * each document by the average conditional probability its corpus
    * bigram LM ([[bigramLm]]'s statistics) assigns to the document's
    * own bigrams. Low scores flag text the corpus LM finds improbable
    * (noise, boilerplate soup, wrong-language fragments); the classic
    * pipeline thresholds on it before training.
    *
    * Exactness: no ln/pow (the cross-engine ulp hazard q136's
    * integer-exact priorities avoid) — per-bigram probability is the
    * exact integer `(10⁶·c_big) div c_head` parts-per-million and the
    * document score its exact integer mean, so both engines produce
    * bit-identical scores. The ppm scale keeps resolution on stopword
    * heads (cond-p ≪ 1/1000) while Σppm ≤ 10⁶·n bounds int64 for any
    * document below 9×10¹² bigrams.
    *
    * Scale shape: the LM table is built vocabulary-side first — the
    * skewed head join (stopword `w1` is hot) runs on the COLLAPSED
    * (w1, w2) table, never the token stream — and the stream then
    * joins the LM once on the full composite bigram key (less skewed
    * than w1 alone; AQE-splittable). The exploded bigram stream feeds
    * both the LM build and the probe UNCACHED: the r14 A/B measured
    * the persist a wash (1.18 vs 1.13 s at sf0.1 — unlike q97's
    * 2-long span rows, the materialized stream here is two strings
    * per row, so the cache build costs what the re-explode saves;
    * the minhash-signatures negative, same mechanism). One final
    * per-doc aggregation.
    */
  def lmScore(df: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    lmScoreOver(df, df, idCol, textCol)

  /** [[lmScore]] with the probe stream RESTRICTED to `probe` — a
    * row-subset of `df` (r20, guide §1.2 "don't compute things you
    * throw away"): the LM table still trains on the FULL frame, so the
    * per-document score of every probed document is bit-identical to
    * [[lmScore]]'s; only documents the caller provably discards
    * downstream (e.g. quality-gate failures ahead of a doc_id
    * left-semi join) skip the probe explode + join + aggregation.
    * Every probe bigram exists in the self-trained table, so the inner
    * join semantics are unchanged.
    */
  private[operators] def lmScoreOver(df: org.apache.spark.sql.DataFrame,
      probe: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    docBigrams(probe, idCol, textCol)
      .join(lmTableOf(docBigrams(df, idCol, textCol)), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s div n_bigrams").as("lm_ppm"))

  /** (doc_id, w1, w2) bigram stream of an (id, text) frame — the shared
    * front half of the LM operators.
    */
  private[graft] def docBigrams(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    corpus(df, idCol, textCol)
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(a)-1), " +
          "i -> struct(element_at(a,i) AS w1, element_at(a,i+1) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** The trained LM table (w1, w2, ppm) over a bigram stream.
    * c_head via a window over the COLLAPSED c2 table, not a second
    * aggregate + self-join: c2 referenced twice in an uncached plan
    * re-computes its whole subtree (including the bigram explode), and
    * this window's partitions are VOCABULARY-bounded (distinct
    * successors of one head), never corpus-sized — the safe window
    * regime, unlike the span posting lists q97 deliberately avoids.
    *
    * Measured and REJECTED in r20 (VERDICT r19 #5 asked for the
    * two-level form): tracking c2 and folding c_head as a tiny
    * aggregate + broadcast join removes the window's sort but (a) does
    * NOT reduce the executed exchange count (the heads aggregate needs
    * its own exchange exactly where the window's was), (b) the
    * CBO-off join-stats MULTIPLICATION through the new heads join
    * inflates every downstream size estimate, flipping the q155
    * survivor semi-join and the q165/q166 probe joins from broadcast
    * to SortMergeJoin, and (c) the head-to-head isolated A/B (5-rep
    * medians, same host window) read q154 1.05→1.03, q155 1.24→1.14,
    * but q165 0.79→0.98 and q166 1.01→1.37 — a net loss, plus a
    * broadcast ceiling the window form does not have. The window
    * stays.
    */
  private[graft] def lmTableOf(bgd: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bgd.groupBy("w1", "w2").agg(count(lit(1)).as("c_big"))
      .withColumn("c_head", sum(col("c_big"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("w1")))
      .select(col("w1"), col("w2"),
        expr("(1000000 * c_big) div c_head").as("ppm"))

  /** Train the corpus bigram LM OFFLINE: the (w1, w2, ppm) table
    * [[lmScoreAgainst]] and the streaming ingest gate
    * ([[graft.streaming.EventStream.lmFilterTo]]) score against — the
    * CCNet deployment shape, where the LM is trained on a reference
    * corpus once and new data is gated as it arrives.
    */
  def lmTable(df: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    lmTableOf(docBigrams(df, idCol, textCol))

  /** Score documents against a STATIC LM table (w1, w2, ppm). Unlike
    * the self-trained [[lmScore]], a document here can contain bigrams
    * the LM never saw — they count toward the mean at 0 ppm (a LEFT
    * join + coalesce), so out-of-vocabulary text is penalized, which is
    * the point of gating INCOMING data with an offline-trained LM.
    * Documents with fewer than 2 tokens carry no LM evidence and are
    * absent from the output (callers decide their fate).
    *
    * Scale shape: the LM table is vocabulary-sized — broadcastable for
    * real vocabularies; past broadcast reach the composite-key join is
    * the same AQE-splittable shuffle as [[lmScore]]'s probe.
    */
  def lmScoreAgainst(df: org.apache.spark.sql.DataFrame,
      lm: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    docBigrams(df, idCol, textCol)
      .join(lm, Seq("w1", "w2"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("ppm"), lit(0L))).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s div n_bigrams").as("lm_ppm"))

  /** Top documents returned by the q157 gate. */
  val Bm25K = 20

  /** The q157 gate's fixed retrieval query. */
  val Bm25Query: Seq[String] = Seq("spark", "merge", "window")

  /** BM25 retrieval scoring (Robertson–Spärck Jones, k1=1.2 b=0.75) in
    * the engine's integer-exact house style: the classic formula's two
    * FP hazards — `ln` in the IDF and an order-dependent float sum over
    * query terms — are replaced by deterministic integer arithmetic
    * both engines compute bit-identically. Per term:
    *
    *   ratio_pm = (10⁶·dl) div adl_pm          (dl/avgdl, per-mille)
    *   A        = (22000·tf·10⁶) div (10⁴·tf + 3000 + 9·ratio_pm)
    *                                            (tf-part ×10⁶ — exactly
    *                                             2.2·tf/(tf+1.2·(0.25+
    *                                             0.75·dl/avgdl)) with
    *                                             per-mille length norm)
    *   score    = (（2N−2df+1)·A) div (2df+1)   (raw RSJ idf ratio, no ln)
    *
    * and the document score is the exact int64 SUM over terms (micro
    * units) — monotone in the real-valued BM25-without-ln at fixed
    * quantization, reproducible across engines/partitionings, and
    * overflow-safe to ~10¹⁰ documents ((2N)·A ≤ 2·10¹⁰·2.2·10⁶ < 2⁶³).
    *
    * Scale shape: ONE corpus aggregate produces the 1-row stats frame
    * (N, Σdl, per-term df — map-combinable), which broadcasts back; tf
    * per query term is a per-row `filter(a, _ = term)` count (query
    * terms are literals — no explode, no token shuffle); top-k is a
    * TakeOrdered. The only exchanges at any corpus size are the 1-row
    * stats aggregate and the k-row final — the fact path never
    * shuffles.
    */
  def bm25TopK(df: org.apache.spark.sql.DataFrame,
      terms: Seq[String] = Bm25Query, k: Int = Bm25K,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, "bm25: 1..16 literal terms")
    // ONE tokenizing byte scan ([[graft.functions.TokenTf]]): dl and
    // every per-term tf come out of a single pass with no split-array
    // materialization — r15's shape re-scanned the array once PER TERM
    // and measured 2.6× behind DuckDB at 100× (VERDICT r15 #3); the
    // terms are opaque bytes inside the expression, so no SQL-string
    // interpolation of caller input exists (ADVICE r15). The tiny
    // (2 + |Q|)-longs-per-doc frame stays persisted — both the stats
    // aggregate and the scoring pass read it, and recomputing it means
    // re-tokenizing the whole corpus (the persist rule's
    // expensive-recompute/tiny-rows side; r16 A/B at 100×: untracked
    // 0.84–0.89 vs tracked 0.90 — a wash here, but at 100 TB the
    // recompute re-reads the WIDE text column where the cache is 5
    // longs/doc, which is the shape the track pins).
    val tfd = GraftCache.track(bm25Tf(df, terms, idCol, textCol))
    bm25ScoreFrames(tfd, bm25Stats(tfd, terms.size), terms.size, k)
  }

  /** The BM25 per-document term-frequency frame (doc_id, dl, tf_i) —
    * the durable "index row" a maintained deployment upserts per
    * document ([[graft.streaming.EventStream.bm25IndexTo]]).
    */
  def bm25Tf(df: org.apache.spark.sql.DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame =
    corpus(df, idCol, textCol)
      .select(col("doc_id"),
        graft.functions.TokenScan.token_tf(col("text"), terms).as("v"))
      .select(Seq(col("doc_id"), col("v").getItem(0).as("dl")) ++
        terms.indices.map(i => col("v").getItem(i + 1).as(s"tf_$i")): _*)

  /** The 1-row BM25 corpus statistics (n_docs, totlen, df_i) over a
    * [[bm25Tf]] frame — one map-combinable aggregate, broadcast back by
    * [[bm25ScoreFrames]].
    */
  def bm25Stats(tfd: org.apache.spark.sql.DataFrame,
      nTerms: Int): org.apache.spark.sql.DataFrame = {
    val aggCols = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("totlen")) ++
      (0 until nTerms).map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    tfd.agg(aggCols.head, aggCols.tail: _*)
  }

  /** Score a [[bm25Tf]] frame against a 1-row [[bm25Stats]] frame and
    * return the ascending-doc_id top-k — the scoring half shared by the
    * batch gate and the maintained-index path, so the two can never
    * diverge arithmetically.
    */
  def bm25ScoreFrames(tfd: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame, nTerms: Int,
      k: Int): org.apache.spark.sql.DataFrame = {
    val scoreTerms = (0 until nTerms).map { i =>
      s"(((2*n_docs - 2*df_$i + 1) * ((22000 * tf_$i * 1000000) div " +
        s"(10000 * tf_$i + 3000 + 9 * ratio_pm))) div (2*df_$i + 1))"
    }
    tfd.crossJoin(broadcast(stats))
      .withColumn("ratio_pm",
        expr("(1000000 * dl) div ((1000 * totlen) div n_docs)"))
      .select(col("doc_id"), col("dl"),
        expr(scoreTerms.mkString(" + ")).cast("long").as("bm25_u"))
      .orderBy(col("bm25_u").desc, col("doc_id"))
      .limit(k)
  }

  /** The q157 BM25 oracle SQL over `documents` — ONE rendering, shared
    * with q160's curated-layout gate (which must produce the SAME
    * answer over the rewritten files, the q148 discipline).
    */
  private[operators] def bm25OracleSql: String = {
    val terms = Bm25Query
    val dfSel = terms.zipWithIndex.map { case (tm, i) =>
      s"SUM(list_contains(a, '$tm')::BIGINT) AS df_$i" }.mkString(", ")
    val score = terms.zipWithIndex.map { case (tm, i) =>
      val tf = s"len(list_filter(a, x -> x = '$tm'))::BIGINT"
      s"(((2*n_docs - 2*df_$i + 1) * ((22000 * $tf * 1000000) // " +
        s"(10000 * $tf + 3000 + 9 * ratio_pm))) // (2*df_$i + 1))"
    }.mkString(" + ")
    "WITH t AS (SELECT doc_id, string_split(text,' ') AS a, " +
      "len(string_split(text,' '))::BIGINT AS dl FROM documents), " +
      s"s AS (SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS totlen, $dfSel FROM t), " +
      "r AS (SELECT doc_id, dl, a, n_docs, totlen, " +
      "(1000000 * dl) // ((1000 * totlen) // n_docs) AS ratio_pm, " +
      "df_" + terms.indices.mkString(", df_") + " FROM t CROSS JOIN s) " +
      s"SELECT doc_id, dl, ($score)::BIGINT AS bm25_u FROM r " +
      s"ORDER BY bm25_u DESC, doc_id LIMIT $Bm25K"
  }

  /** DuckDB CTE chain computing the LM-gated survivor set `lms` — the
    * oracle-side mirror of [[lmScore]] thresholded at `thr` ppm, used by
    * the curation gates that thread an `lmPpmMin` arm (q91, q155). Same
    * exact-integer chain as the q154 oracle (ppm = exact `//` division,
    * per-doc mean exact `//`), with the stream CTE `AS MATERIALIZED`
    * per the DuckDB per-reference-inlining rule (it is referenced by
    * both the LM build and the probe join).
    */
  def lmGateCtes(thr: Long): String =
    "lt AS (SELECT doc_id, string_split(text,' ') AS a FROM documents " +
      "WHERE len(string_split(text,' ')) >= 2), " +
      "lbg AS (SELECT doc_id, unnest([{'w1': a[i], 'w2': a[i+1]} " +
      "FOR i IN generate_series(1, len(a)-1)]) AS b FROM lt), " +
      "lbgd AS MATERIALIZED (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM lbg), " +
      "lc2 AS (SELECT w1, w2, COUNT(*) AS c_big FROM lbgd GROUP BY 1, 2), " +
      "llm AS (SELECT w1, w2, (1000000 * c_big) // " +
      "(SUM(c_big) OVER (PARTITION BY w1)) AS ppm FROM lc2), " +
      "lms AS (SELECT doc_id FROM lbgd JOIN llm " +
      "ON lbgd.w1 = llm.w1 AND lbgd.w2 = llm.w2 " +
      s"GROUP BY doc_id HAVING SUM(ppm) // COUNT(*) >= $thr)"

  /** Inverted-index posting lists over bigram terms, vocabulary
    * band-selected by document frequency: terms kept when
    * lo‰ ≤ df/corpus ≤ hi‰ (multiplicative integer compare — no FP in
    * term selection). Too-frequent terms are stopwords (a posting list
    * that is "most of the corpus" indexes nothing); too-rare ones are
    * noise — the classic index-vocabulary cut.
    *
    * Scale shape: distinct (term, doc) pairs → one map-combinable df
    * aggregation; the band is applied BEFORE any posting list is
    * collected, so every `collect_list` buffer is bounded by the band's
    * upper df by construction (a real deployment additionally shards
    * hot terms across segment files; the band parameters are that
    * knob). The 1-row corpus count broadcasts; the band join is
    * vocabulary-sized (AQE broadcasts it when small).
    */
  def invertedIndex(df: org.apache.spark.sql.DataFrame,
      loPermille: Int = 30, hiPermille: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    // r20: bigram terms in ONE byte scan + one copy per span
    // ([[graft.functions.SpanHash.span_strings]], byte-equal to the
    // split → concat_ws chain by the span identity; short docs yield
    // empty arrays ≡ the old size filter). Terms stay STRINGS — the
    // postings output carries them, so the hash trick cannot apply.
    val bg = corpus(df, idCol, textCol)
      .select(col("doc_id"), explode(
        graft.functions.SpanHash.span_strings(col("text"), 2)).as("term"))
      .distinct()
    val nDocs = corpus(df, idCol, textCol).agg(count(lit(1)).as("n"))
    val band = bg.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 1000 >= col("n") * loPermille &&
        col("df") * 1000 <= col("n") * hiPermille)
      .select("term")
    bg.join(band, Seq("term"), "left_semi")
      .groupBy("term")
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
      .select(col("term"), size(col("postings")).cast("long").as("df"), col("postings"))
  }

  /** Rare-n-gram novelty score: per document, the share of bigram
    * occurrences whose term is corpus-rare (df ≤ lo‰ of the corpus) — a
    * content-novelty quality signal (boilerplate scores ~0, genuinely
    * novel text high) that needs no language model: the corpus's own df
    * table IS the model. Selection stays on integers (`df·1000 ≤ n·lo`);
    * the score is one IEEE division of two exact integers.
    *
    * Scale shape: occurrences join the vocabulary-sized df table on the
    * 60-bit term hash — an int64 shuffle join (the rare set is the LONG
    * TAIL of the vocabulary, so broadcasting it is exactly what you
    * cannot do at corpus scale; hot boilerplate terms are AQE-skew-
    * splittable); then one per-document count aggregation.
    */
  def noveltyScore(df: org.apache.spark.sql.DataFrame, loPermille: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    // persisted: both the df aggregation and the occurrence join read
    // this frame (tier-2 GraftCache discipline — harness/auto-release
    // frees it after the caller's action)
    // r20: bigram-occurrence hashes in ONE byte scan
    // ([[graft.functions.SpanHash]], hash values pinned identical)
    val occ = GraftCache.track(corpus(df, idCol, textCol)
      .select(col("doc_id"), explode(
        graft.functions.SpanHash.span_hash60(col("text"), 2)).as("h")))
    val nDocs = corpus(df, idCol, textCol).agg(count(lit(1)).as("n"))
    val dfreq = occ.distinct().groupBy("h").agg(count(lit(1)).as("df"))
    occ.join(dfreq.crossJoin(broadcast(nDocs)), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("df") * 1000 <= col("n") * loPermille, 1).otherwise(0))
          .cast("long").as("n_rare"))
      .withColumn("novelty", col("n_rare").cast("double") / col("n_bigrams"))
  }

  /** Trained linear text classifier — the fastText-recipe "quality
    * classifier" step of web-corpus curation (CCNet-style: learn a
    * lexicon from weakly-labeled seed data, score everything): token
    * weights are learned from a TRAIN split (`doc_id % 5 != 0`) as the
    * difference of class-conditional RATES, then each TEST document is
    * scored by the sum of its tokens' weights.
    *
    * Everything is integer-exact so both engines agree bit-for-bit:
    * `w(t) = cp·10⁶ div np − cn·10⁶ div nn` (scaled integer rates,
    * truncating division on positive operands — identical in Spark
    * `div` and DuckDB `//`), no logs, no FP division. Weights are
    * bounded by 10⁶, so a document score fits a long at ANY corpus
    * size; the lexicon is pruned to tokens with ≥ 5 training
    * occurrences (model size bounded, hapax noise dropped). Scale: one
    * tok-keyed shuffle for training stats, one tok-keyed join (AQE
    * skew-splittable; broadcastable when the pruned lexicon is small)
    * for scoring — no per-class cartesian anywhere.
    */
  def nbLexicon(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
    val stats = toks.filter(col("doc_id") % 5 =!= 0)
      .groupBy("tok")
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cp"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("cn"))
      .filter(col("cp") + col("cn") >= 5)
    // class totals: 2 longs of driver state (k-bounded model metadata).
    // Both classes must be represented — an empty lexicon NULLs the
    // sums, and a missing class makes the scaled-rate division
    // engine-divergent (Spark div-by-zero is NULL, DuckDB // errors);
    // fail HERE with the actual problem instead
    val tot = stats.agg(sum("cp"), sum("cn")).head()
    val (np, nn) =
      (if (tot.isNullAt(0)) 0L else tot.getLong(0),
        if (tot.isNullAt(1)) 0L else tot.getLong(1))
    if (np <= 0 || nn <= 0)
      throw new IllegalArgumentException(
        s"nbLexicon: the train split must contain BOTH classes with >=5-occurrence " +
          s"tokens (positive total $np, negative total $nn)")
    val weighted = stats.select(col("tok"),
      (expr(s"cp * 1000000L div ${np}L") - expr(s"cn * 1000000L div ${nn}L")).as("w"))
    toks.filter(col("doc_id") % 5 === 0)
      .join(weighted, "tok")
      .groupBy("doc_id", "lang").agg(sum("w").as("score"))
      .groupBy(col("lang"),
        when(col("score") > 0, "en").otherwise("other").as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** One BPE merge round — tokenizer induction as a query: count every
    * adjacent character pair inside every word occurrence across the
    * corpus and emit the top merge candidates. The hot loop of
    * byte-pair-encoding vocabulary training (iterate: merge the top
    * pair, recount) expressed as ONE aggregation; integer-exact, the
    * pair space is alphabet²-bounded so the shuffle is tiny at any
    * corpus size and the count is map-side combinable.
    */
  def bpeMergeCandidates(df: org.apache.spark.sql.DataFrame, k: Int = 20): org.apache.spark.sql.DataFrame =
    df.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(k)

  def queries: Seq[Q] = Seq(

    // Tokenizer induction (BPE): the top-20 adjacent-pair merge
    // candidates of the corpus, integer-exact.
    Q("q131_bpe_merge",
      "WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents), " +
        "p AS (SELECT substring(w, i, 2) AS pair FROM w " +
        "CROSS JOIN LATERAL (SELECT unnest(range(1, length(w))) AS i) u " +
        "WHERE length(w) >= 2) " +
        "SELECT pair, COUNT(*) AS n FROM p GROUP BY pair " +
        "ORDER BY n DESC, pair LIMIT 20") { (s, dir) =>
      bpeMergeCandidates(Tables.load(s, dir, "documents"))
    },

    // Trained lexicon classifier (fastText-recipe): integer-exact
    // confusion counts of the en-vs-other prediction on the test split.
    Q("q128_nb_classifier",
      "WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok " +
        "FROM documents), " +
        "stats AS (SELECT tok, " +
        "SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp, " +
        "SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS cn " +
        "FROM toks WHERE doc_id % 5 <> 0 GROUP BY tok " +
        "HAVING SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + " +
        "SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) >= 5), " +
        "tot AS (SELECT SUM(cp) AS np, SUM(cn) AS nn FROM stats), " +
        "scored AS (SELECT t.doc_id, t.lang, " +
        "SUM(s.cp * 1000000 // tot.np - s.cn * 1000000 // tot.nn) AS score " +
        "FROM toks t, stats s, tot WHERE t.tok = s.tok AND t.doc_id % 5 = 0 " +
        "GROUP BY t.doc_id, t.lang) " +
        "SELECT lang, CASE WHEN score > 0 THEN 'en' ELSE 'other' END AS pred, " +
        "COUNT(*) AS n FROM scored GROUP BY lang, pred ORDER BY lang, pred") { (s, dir) =>
      nbLexicon(Tables.load(s, dir, "documents")).orderBy("lang", "pred")
    },

    // Rare-bigram novelty: the corpus df table is the "language model";
    // rare-share per document as a quality/novelty signal.
    Q("q48_novelty",
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents " +
        "WHERE len(string_split(text,' ')) >= 2), " +
        "occ AS (SELECT doc_id, " + CrossHash.h60Sql("a[i] || ' ' || a[i+1]") + " AS h " +
        "FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(a))) AS i) u), " +
        "nd AS (SELECT COUNT(*) AS n FROM documents), " +
        "dfq AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY h) " +
        "SELECT occ.doc_id, COUNT(*) AS n_bigrams, " +
        "CAST(SUM(CASE WHEN df * 1000 <= n * 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare, " +
        "CAST(SUM(CASE WHEN df * 1000 <= n * 20 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty " +
        "FROM occ JOIN dfq USING (h) CROSS JOIN nd " +
        "GROUP BY occ.doc_id ORDER BY occ.doc_id") { (s, dir) =>
      noveltyScore(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // Inverted index, gated in LONG FORM (term, df, doc_id): every
    // posting of every band-selected term is value-checked while the
    // compared columns stay scalar-typed ([[invertedIndex]] returns the
    // posting-list arrays; explode here is presentation only).
    Q("q49_inverted_index",
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents " +
        "WHERE len(string_split(text,' ')) >= 2), " +
        "bg AS (SELECT DISTINCT doc_id, a[i] || ' ' || a[i+1] AS term " +
        "FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(a))) AS i) u), " +
        "nd AS (SELECT COUNT(*) AS n FROM documents), " +
        "dfq AS (SELECT term, COUNT(*) AS df FROM bg GROUP BY term), " +
        "band AS (SELECT term, df FROM dfq CROSS JOIN nd " +
        "WHERE df * 1000 >= n * 30 AND df * 1000 <= n * 50) " +
        "SELECT b.term, band.df, b.doc_id " +
        "FROM bg b JOIN band ON b.term = band.term " +
        "ORDER BY b.term, b.doc_id") { (s, dir) =>
      invertedIndex(Tables.load(s, dir, "documents"))
        .select(col("term"), col("df"), explode(col("postings")).as("doc_id"))
        .orderBy("term", "doc_id")
    },

    // Corpus bigram LM statistics: counts + exact-division conditional
    // probabilities, top-100 by frequency.
    Q("q37_bigram_lm",
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents " +
        "WHERE len(string_split(text,' ')) >= 2), " +
        "bg AS (SELECT unnest([{'w1': a[i], 'w2': a[i+1]} " +
        "FOR i IN generate_series(1, len(a)-1)]) AS b FROM t), " +
        "c2 AS (SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS c_big FROM bg GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, SUM(c_big)::BIGINT AS c_head FROM c2 GROUP BY w1) " +
        "SELECT c2.w1, c2.w2, c_big, c_head, c_big::DOUBLE / c_head AS cond_p " +
        "FROM c2 JOIN c1 ON c2.w1 = c1.w1 " +
        s"ORDER BY c_big DESC, c2.w1, c2.w2 LIMIT $LmTopK") { (s, dir) =>
      bigramLm(Tables.load(s, dir, "documents"))
    },

    // CCNet-style LM quality filter: per-doc mean bigram conditional
    // probability (exact integer ppm) under the corpus's own bigram LM.
    // bgd is referenced twice and chains through two generations — AS
    // MATERIALIZED per the DuckDB per-reference-inlining rule.
    Q("q154_lm_score",
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents " +
        "WHERE len(string_split(text,' ')) >= 2), " +
        "bg AS (SELECT doc_id, unnest([{'w1': a[i], 'w2': a[i+1]} " +
        "FOR i IN generate_series(1, len(a)-1)]) AS b FROM t), " +
        "bgd AS MATERIALIZED (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg), " +
        "c2 AS (SELECT w1, w2, COUNT(*) AS c_big FROM bgd GROUP BY 1, 2), " +
        "lm AS (SELECT w1, w2, (1000000 * c_big) // " +
        "(SUM(c_big) OVER (PARTITION BY w1)) AS ppm FROM c2) " +
        "SELECT doc_id, COUNT(*) AS n_bigrams, (SUM(ppm) // COUNT(*))::BIGINT AS lm_ppm " +
        "FROM bgd JOIN lm ON bgd.w1 = lm.w1 AND bgd.w2 = lm.w2 " +
        "GROUP BY doc_id ORDER BY doc_id") { (s, dir) =>
      lmScore(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // BM25 top-k retrieval (integer-exact form — see bm25TopK): fixed
    // 3-term query, micro-unit scores, deterministic tie-break.
    Q("q157_bm25_topk", bm25OracleSql) { (s, dir) =>
      bm25TopK(Tables.load(s, dir, "documents"))
    },

    // Sliding-window chunking for embedding/RAG indexing: overlapping
    // 32-token windows at stride 16, fingerprinted per chunk.
    Q("q36_chunk_windows",
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents), " +
        "c AS (SELECT doc_id, unnest(generate_series(0, " +
        s"CASE WHEN len(a) <= $ChunkW THEN 0 " +
        s"ELSE (len(a) - $ChunkW + $ChunkS - 1) // $ChunkS END)) AS chunk_id, a FROM t) " +
        "SELECT doc_id, chunk_id, " +
        s"len(a[1 + chunk_id*$ChunkS : chunk_id*$ChunkS + $ChunkW])::BIGINT AS n_tok, " +
        CrossHash.h60Sql(
          s"array_to_string(a[1 + chunk_id*$ChunkS : chunk_id*$ChunkS + $ChunkW],' ')") +
        " AS fp " +
        "FROM c ORDER BY doc_id, chunk_id") { (s, dir) =>
      chunkWindows(Tables.load(s, dir, "documents")).orderBy("doc_id", "chunk_id")
    },
    Q("q30_token_stats",
      "SELECT doc_id, len(string_split(text,' ')) AS n_tokens, " +
        "length(text) AS len_chars, " +
        "CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE) / len(string_split(text,' ')) AS avg_tok_len, " +
        "len(regexp_extract_all(text, '[aeiou]+')) AS n_vowel_runs " +
        "FROM documents ORDER BY doc_id") { (s, dir) =>
      tokenStats(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    Q("q31_quality_score",
      "SELECT doc_id, len(string_split(text,' ')) AS n_tokens, " +
        "len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS stop_hits, " +
        "len(list_distinct(string_split(text,' '))) AS n_distinct, " +
        "CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')) " +
        " - CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS DOUBLE) / len(string_split(text,' ')) AS quality " +
        "FROM documents ORDER BY doc_id") { (s, dir) =>
      qualityScore(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // Stopword-density language heuristic: the synthetic corpus shares one
    // vocabulary, so the detector keys on English-stopword density with a
    // multiplicative threshold (no FP division in row selection).
    Q("q32_lang_id",
      "SELECT doc_id, lang, " +
        "CASE WHEN len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) * 20 > len(string_split(text,' ')) " +
        "THEN 'en' ELSE 'unk' END AS lang_pred " +
        "FROM documents ORDER BY doc_id") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), langPred(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    },

    // Adaptive power-of-two histogram sketch of document lengths per
    // source (capacity 16): the oracle independently derives the
    // minimal shift (the smallest grid where distinct bins fit) and
    // rebuilds the histogram — matching it value-for-value proves the
    // sketch's coarsening is canonical, not merge-order-dependent.
    Q("q121_rank_histogram", {
      val cap = HistCap
      "WITH v AS (SELECT source, n_chars AS v FROM documents), " +
        "shs AS (SELECT unnest(generate_series(0, 62)) AS s), " +
        "nb AS (SELECT source, s, COUNT(DISTINCT v // (1::BIGINT << s)) AS n " +
        "FROM v CROSS JOIN shs GROUP BY 1, 2), " +
        s"ms AS (SELECT source, CAST(MIN(s) AS INTEGER) AS shift FROM nb WHERE n <= $cap GROUP BY source) " +
        "SELECT v.source AS grp, ms.shift AS shift, " +
        "(v // (1::BIGINT << ms.shift)) * (1::BIGINT << ms.shift) AS bin_lo, COUNT(*) AS cnt " +
        "FROM v JOIN ms ON v.source = ms.source " +
        "GROUP BY 1, 2, 3 ORDER BY grp, bin_lo"
    }) { (s, dir) =>
      valueHistogram(Tables.load(s, dir, "documents"), "source", "n_chars", HistCap)
        .orderBy("grp", "bin_lo")
    },

    // Language-ID accuracy report: confusion matrix of the q32
    // heuristic against the corpus's ground-truth lang column — one
    // aggregation, |labels|² output rows at any scale.
    Q("q120_langid_confusion",
      "SELECT lang AS actual, " +
        "CASE WHEN len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) * 20 > len(string_split(text,' ')) " +
        "THEN 'en' ELSE 'unk' END AS predicted, COUNT(*) AS n " +
        "FROM documents GROUP BY 1, 2 ORDER BY actual, predicted") { (s, dir) =>
      confusionMatrix(
        Tables.load(s, dir, "documents")
          .select(col("lang"), langPred(col("text")).as("lang_pred")),
        "lang", "lang_pred")
        .orderBy("actual", "predicted")
    },

    Q("q33_fingerprint",
      "SELECT doc_id, " + CrossHash.h60Sql("text") + " AS fp " +
        "FROM documents ORDER BY doc_id") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), h60(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    Q("q35_bpe_tokens",
      "SELECT doc_id, len(string_split(text,' ')) AS n_ws_tokens, " +
        s"len(regexp_extract_all(text, '$BpePattern')) AS n_bpe_tokens " +
        "FROM documents ORDER BY doc_id") { (s, dir) =>
      tokenCounts(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // Repetition-quality metrics: duplicate-bigram and top-token counts
    // with integer-threshold flags. The oracle computes the top-token
    // count as a per-row correlated group-by-max (fine at oracle scale);
    // the Spark side folds the sorted token array instead — identical
    // integers, but shuffle-free at corpus scale.
    Q("q76_repetition_filter",
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents " +
        "WHERE len(string_split(text,' ')) >= 2), " +
        "m AS (SELECT doc_id, len(a) AS n, len(a)-1 AS nbg, " +
        "len(list_distinct([a[i]||' '||a[i+1] FOR i IN generate_series(1, len(a)-1)])) AS ndbg, " +
        "(SELECT max(c) FROM (SELECT count(*) AS c FROM unnest(a) AS u(tok) GROUP BY tok)) AS topc " +
        "FROM t) " +
        "SELECT doc_id, n AS n_tokens, nbg AS n_bigrams, nbg - ndbg AS n_dup_bigrams, " +
        "topc AS top_tok_count, " +
        "CASE WHEN (nbg - ndbg) * 10 > nbg OR topc * 10 > 2 * n THEN 1 ELSE 0 END AS flagged " +
        "FROM m ORDER BY doc_id") { (s, dir) =>
      repetitionStats(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // Top-5 distinctive terms per source by integer-ratio TF-IDF; the
    // output column `source` aliases the library's generic `grp`.
    Q("q79_tfidf_terms",
      "WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS tok FROM documents), " +
        "tf AS (SELECT source, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2), " +
        "dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1), " +
        "ns AS (SELECT COUNT(DISTINCT source) AS ns FROM documents), " +
        "sc AS (SELECT tf.source, tf.tok, tf.tf, dft.df, " +
        "(tf.tf * ns.ns)::DOUBLE / dft.df AS score " +
        "FROM tf JOIN dft USING (tok) CROSS JOIN ns), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY score DESC, tok) AS rn FROM sc) " +
        "SELECT source, tok, tf, df, score FROM r WHERE rn <= 5 ORDER BY source, tok") { (s, dir) =>
      tfidfTopTerms(Tables.load(s, dir, "documents"))
        .withColumnRenamed("grp", "source").orderBy("source", "tok")
    },

    // Per-source token-length distribution with exact discrete
    // quantiles (rank arithmetic, no interpolation).
    Q("q83_length_quantiles",
      "WITH m AS (SELECT source, doc_id, len(string_split(text,' ')) AS n FROM documents), " +
        "r AS (SELECT source, n, row_number() OVER (PARTITION BY source ORDER BY n, doc_id) AS rn, " +
        "COUNT(*) OVER (PARTITION BY source) AS cnt FROM m) " +
        "SELECT source, " +
        "MAX(CASE WHEN rn = (cnt + 3) // 4 THEN n END) AS p25, " +
        "MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n END) AS p50, " +
        "MAX(CASE WHEN rn = (3 * cnt + 3) // 4 THEN n END) AS p75, " +
        "MAX(n) AS mx, MIN(n) AS mn, CAST(COUNT(*) AS BIGINT) AS n_docs " +
        "FROM r GROUP BY source ORDER BY source") { (s, dir) =>
      lengthQuantiles(Tables.load(s, dir, "documents"))
        .withColumnRenamed("grp", "source").orderBy("source")
    },

    // Blocklist redaction: word-boundary term replacement + per-doc
    // replacement counts. Same \b-alternation pattern in both engines.
    Q("q84_blocklist_redact",
      raw"SELECT doc_id, len(regexp_extract_all(text, '\b(customer|spark)\b')) AS n_redacted, " +
        raw"regexp_replace(text, '\b(customer|spark)\b', '<x>', 'g') AS text_redacted " +
        "FROM documents ORDER BY doc_id") { (s, dir) =>
      redactTerms(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // PII scrub: the documents corpus carries no PII, so the gate
    // deterministically plants emails / IPv4s / phone spans from doc_id
    // (identically in both engines) and verifies counts + the fully
    // redacted text byte-for-byte.
    Q("q115_pii_redact",
      "WITH aug AS (SELECT doc_id, text || " +
        "CASE WHEN doc_id % 3 != 0 THEN ' contact u' || (doc_id % 97)::VARCHAR || '@ex' || (doc_id % 7)::VARCHAR || '.com' ELSE '' END || " +
        "CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 251)::VARCHAR || '.0.1' ELSE '' END || " +
        "CASE WHEN doc_id % 7 = 2 THEN ' call 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END AS text FROM documents), " +
        s"s1 AS (SELECT doc_id, len(regexp_extract_all(text, '$PiiEmail')) AS n_emails, " +
        s"regexp_replace(text, '$PiiEmail', '<EMAIL>', 'g') AS t FROM aug), " +
        s"s2 AS (SELECT doc_id, n_emails, len(regexp_extract_all(t, '$PiiIp')) AS n_ips, " +
        s"regexp_replace(t, '$PiiIp', '<IP>', 'g') AS t FROM s1), " +
        s"s3 AS (SELECT doc_id, n_emails, n_ips, len(regexp_extract_all(t, '$PiiPhone')) AS n_phones, " +
        s"regexp_replace(t, '$PiiPhone', '<PHONE>', 'g') AS t FROM s2) " +
        "SELECT doc_id, n_emails, n_ips, n_phones, t AS text_clean FROM s3 ORDER BY doc_id") { (s, dir) =>
      val id = col("doc_id")
      val aug = Tables.load(s, dir, "documents").select(id, concat(
        col("text"),
        when(id % 3 =!= 0, concat(lit(" contact u"), (id % 97).cast("string"),
          lit("@ex"), (id % 7).cast("string"), lit(".com"))).otherwise(lit("")),
        when(id % 5 === 0, concat(lit(" from 10."), (id % 251).cast("string"),
          lit(".0.1"))).otherwise(lit("")),
        when(id % 7 === 2, concat(lit(" call 555-"),
          lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit(""))
      ).as("text"))
      piiRedact(aug).orderBy("doc_id")
    },

    // Vocabulary pruning: top-20 corpus vocabulary (count desc, token
    // tiebreak), OOV tokens rewritten to <unk>. The oracle carries the
    // vocabulary list through a cross join; the Spark side ships it as
    // driver-collected model state.
    Q("q86_vocab_prune",
      "WITH tf AS (SELECT tok, count(*) AS c FROM (SELECT unnest(string_split(text,' ')) AS tok FROM documents) GROUP BY 1), " +
        "v AS (SELECT tok FROM tf ORDER BY c DESC, tok LIMIT 20), " +
        "vl AS (SELECT list(tok ORDER BY tok) AS vs FROM v) " +
        "SELECT doc_id, array_to_string(list_transform(string_split(text,' '), " +
        "t -> CASE WHEN list_contains(vl.vs, t) THEN t ELSE '<unk>' END), ' ') AS text_pruned, " +
        "len(list_filter(string_split(text,' '), t -> NOT list_contains(vl.vs, t))) AS n_oov " +
        "FROM documents CROSS JOIN vl ORDER BY doc_id") { (s, dir) =>
      vocabPrune(Tables.load(s, dir, "documents")).orderBy("doc_id")
    },

    // Heavy hitters through the native Misra–Gries aggregate. Capacity 64
    // exceeds the corpus vocabulary, so every counter is exact and the
    // oracle is a plain GROUP BY count; FreqSketchSpec pins the
    // bounded-capacity (approximate) regime the gate can't.
    Q("q88_heavy_hitters",
      "SELECT tok, cnt FROM (SELECT tok, count(*) AS cnt " +
        "FROM (SELECT unnest(string_split(text,' ')) AS tok FROM documents) " +
        "GROUP BY tok ORDER BY cnt DESC, tok LIMIT 10) ORDER BY cnt DESC, tok") { (s, dir) =>
      heavyHitters(Tables.load(s, dir, "documents"))
    },

    // Native Catalyst expression with codegen (graft.functions.RollingHash).
    // The oracle reproduces Java's wrapping 64-bit arithmetic in DuckDB by
    // folding the UTF-8 bytes (hex-decoded pairwise) through HUGEINT
    // arithmetic mod 2^64, then mapping back to the signed range — so even
    // the native expression is value-checked cross-engine.
    Q("q34_rolling_fingerprint",
      "SELECT doc_id, CASE WHEN r >= 9223372036854775808::HUGEINT " +
        "THEN (r - 18446744073709551616::HUGEINT)::BIGINT ELSE r::BIGINT END AS rfp " +
        "FROM (SELECT doc_id, list_reduce(" +
        "list_prepend(1125899906842597::HUGEINT, " +
        "[('0x'||substr(hex(encode(text)),2*i-1,2))::BIGINT " +
        "FOR i IN generate_series(1, octet_length(encode(text)))]), " +
        "(acc, b) -> (31*acc + b) % 18446744073709551616::HUGEINT) AS r " +
        "FROM documents) ORDER BY doc_id") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          RollingHash.rolling_hash(col("text")).as("rfp"))
        .orderBy("doc_id")
    }
  )
}
