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

  /** Curate any (id, text) frame:
    *   1. exact dedup — min-id representative per distinct text;
    *   2. quality gate — distinct-token ratio minus stopword ratio
    *      ≥ qualityNum/qualityDen (integer compare);
    *   3. language gate — stopword density > 1/densityDen ("en"
    *      heuristic, same predicate as [[TextAnalysis.langId]]).
    * Output: (doc_id, n_tokens, n_bpe_tokens, fp) — the id, the token
    * budget columns, and the cross-engine content fingerprint.
    */
  def curate(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      stopwords: Seq[String] = Seq("the", "a"),
      qualityNum: Int = 1, qualityDen: Int = 2,
      densityDen: Int = 20): DataFrame = {
    val a = split(col("text"), " ")
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"), size(a).as("n"),
        size(array_distinct(a)).as("nd"),
        size(filter(a, t => t.isin(stopwords: _*))).as("sh"))
      .filter((col("nd") - col("sh")) * qualityDen >= lit(qualityNum) * col("n") &&
        col("sh") * densityDen > col("n"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        size(regexp_extract_all(col("text"), lit(TextAnalysis.BpePattern), lit(0)))
          .as("n_bpe_tokens"),
        h60(col("text")).as("fp"))
  }

  def queries: Seq[Q] = Seq(
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
    }
  )
}
