package graft.operators

import graft.{Q, Tables}
import graft.functions.{CrossHash, MinHashCoefficients => MC}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact (hash-groupBy), n-gram Jaccard, MinHash + banded LSH, SimHash
  * with pigeonhole candidate generation, and quantized-embedding cosine
  * near-dup.
  *
  * Determinism contract: every hash is the md5-derived 60-bit integer
  * ([[graft.functions.CrossHash]]) that DuckDB computes identically, so
  * each query carries a full SQL oracle — including the LSH pipelines,
  * which are usually "unverifiable" in cross-engine tests.
  *
  * Scale notes (100 TB design):
  *   - exact dedup is one hash-shuffle on the group key — the minimal
  *     possible plan (map-side partial agg first);
  *   - n-gram Jaccard's shingle self-join is quadratic in docs sharing a
  *     shingle: correct at verification scale, but the *scale path* is
  *     q42's MinHash-LSH, which only joins docs sharing a (band, sig)
  *     bucket — the standard sub-quadratic near-dup plan;
  *   - SimHash reduces each doc to one 60-bit int; candidate pairs join
  *     on 15-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 chunk equal);
  *   - embedding near-dup quantizes floats to ints (×100) so the cosine
  *     threshold is an exact int64 comparison — reproducible across
  *     engines, partitionings and SIMD, unlike float accumulation.
  */
object Dedup {
  import CrossHash.{h60, h60modP, h60Sql, P}

  /** doc_id + distinct word-bigram shingles; docs with < 2 tokens dropped. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(a)-1), i -> concat(element_at(a,i), ' ', element_at(a,i+1)))"))
        .as("s"))
      .distinct()

  private val shinglesSql: String =
    "WITH t AS (SELECT doc_id, string_split(text,' ') AS a FROM documents " +
      "WHERE len(string_split(text,' ')) >= 2), " +
      "sh AS (SELECT DISTINCT doc_id, unnest([a[i] || ' ' || a[i+1] " +
      "FOR i IN generate_series(1, len(a)-1)]) AS s FROM t)"

  /** Quantized embeddings: int64 vector (×100) + int64 squared norm. */
  private[operators] def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> cast(round(cast(x AS double) * 100, 0) AS bigint))").as("q"))
      .withColumn("nrm", expr("aggregate(q, cast(0 AS bigint), (acc, x) -> acc + x * x)"))

  private[operators] val quantizedSql: String =
    "q AS (SELECT vec_id, [cast(round(x::DOUBLE * 100, 0) AS BIGINT) FOR x IN embedding] AS q " +
      "FROM embeddings), " +
      "n AS (SELECT vec_id, q, list_aggregate([x * x FOR x IN q], 'sum')::BIGINT AS nrm FROM q)"

  /** Exact int64 dot product of two quantized vectors (Spark side). */
  private[operators] def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Same dot product in DuckDB SQL over columns `$a`/`$b`. */
  private[operators] def qdotSql(a: String, b: String): String =
    s"list_aggregate([$a[i] * $b[i] FOR i IN generate_series(1, len($a))], 'sum')::BIGINT"

  def queries: Seq[Q] = Seq(

    Q("q40_exact_dedup",
      "SELECT MIN(doc_id) AS survivor, COUNT(*) AS n_copies, " +
        h60Sql("text") + " AS fp FROM documents GROUP BY text ORDER BY survivor") { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n_copies"))
        .select(col("survivor"), col("n_copies"), h60(col("text")).as("fp"))
        .orderBy("survivor")
    },

    // Pairs with word-bigram Jaccard > 0.2, threshold compared as
    // 5*|A∩B| > |A∪B| (exact integers).
    Q("q41_ngram_jaccard_pairs",
      shinglesSql + ", " +
        "sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), " +
        "inter AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS i " +
        " FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2) " +
        "SELECT d1, d2, i AS n_inter, sx.n + sy.n - i AS n_union " +
        "FROM inter JOIN sz sx ON d1 = sx.doc_id JOIN sz sy ON d2 = sy.doc_id " +
        "WHERE i * 5 > sx.n + sy.n - i ORDER BY d1, d2") { (s, dir) =>
      val sh = shingles(s, dir)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("x")
        .join(sh.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sz.as("sx"), col("d1") === col("sx.doc_id"))
        .join(sz.as("sy"), col("d2") === col("sy.doc_id"))
        .filter(col("i") * 5 > col("sx.n") + col("sy.n") - col("i"))
        .select(col("d1"), col("d2"), col("i").as("n_inter"),
          (col("sx.n") + col("sy.n") - col("i")).as("n_union"))
        .orderBy("d1", "d2")
    },

    // MinHash (16 permutations) + banded LSH (4 bands × 4 rows):
    // candidate pairs are docs agreeing on a full band signature.
    Q("q42_minhash_lsh",
      shinglesSql + ", " +
        s"hm AS (SELECT doc_id, ${h60Sql("s")} % $P AS hm FROM sh), " +
        s"mh AS (SELECT doc_id, j, MIN((ca * hm + cb) % $P) AS mh " +
        s" FROM hm CROSS JOIN (SELECT unnest(generate_series(0, ${MC.NumHashes - 1})) AS j, " +
        s"  unnest(${MC.sqlList(MC.A)}) AS ca, unnest(${MC.sqlList(MC.B)}) AS cb) c " +
        " GROUP BY doc_id, j), " +
        s"sig AS (SELECT doc_id, j // ${MC.BandRows} AS band, " +
        " string_agg(mh::VARCHAR, ',' ORDER BY j) AS sig FROM mh GROUP BY 1, 2) " +
        "SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM sig x JOIN sig y " +
        "ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id ORDER BY d1, d2") { (s, dir) =>
      val coef = array((0 until MC.NumHashes).map(j =>
        struct(lit(j).as("j"), lit(MC.A(j)).as("ca"), lit(MC.B(j)).as("cb"))): _*)
      val mh = shingles(s, dir)
        .select(col("doc_id"), h60modP(col("s")).as("hm"))
        .select(col("doc_id"), col("hm"), explode(coef).as("c"))
        .groupBy(col("doc_id"), col("c.j").as("j"))
        .agg(min((col("c.ca") * col("hm") + col("c.cb")) % P).as("mh"))
      val sig = mh
        .withColumn("band", expr(s"j div ${MC.BandRows}"))
        .groupBy("doc_id", "band")
        .agg(expr("array_join(transform(array_sort(collect_list(struct(j, mh))), " +
          "x -> cast(x.mh AS string)), ',')").as("sig"))
      sig.as("x")
        .join(sig.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
        .orderBy("d1", "d2")
    },

    // 60-bit SimHash: per-token 60-bit hash, token-frequency-weighted
    // sign vote per bit position.
    Q("q43_simhash",
      "WITH tok AS (SELECT doc_id, t AS tok, COUNT(*) AS cnt FROM " +
        " (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents) GROUP BY 1, 2), " +
        "th AS (SELECT doc_id, cnt, " + h60Sql("tok") + " AS th FROM tok), " +
        "bits AS (SELECT doc_id, b, SUM(CASE WHEN (th >> b) & 1 = 1 THEN cnt ELSE -cnt END) AS sb " +
        " FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) GROUP BY 1, 2) " +
        "SELECT doc_id, SUM(CASE WHEN sb > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash " +
        "FROM bits GROUP BY doc_id ORDER BY doc_id") { (s, dir) =>
      simhash(s, dir).orderBy("doc_id")
    },

    // Candidate pairs: equal 15-bit chunk (pigeonhole over 4 chunks
    // guarantees recall for hamming ≤ 3), then exact hamming ≤ 8 filter.
    Q("q44_simhash_pairs",
      "WITH tok AS (SELECT doc_id, t AS tok, COUNT(*) AS cnt FROM " +
        " (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents) GROUP BY 1, 2), " +
        "th AS (SELECT doc_id, cnt, " + h60Sql("tok") + " AS th FROM tok), " +
        "bits AS (SELECT doc_id, b, SUM(CASE WHEN (th >> b) & 1 = 1 THEN cnt ELSE -cnt END) AS sb " +
        " FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) GROUP BY 1, 2), " +
        "sh AS (SELECT doc_id, SUM(CASE WHEN sb > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash " +
        " FROM bits GROUP BY doc_id), " +
        "ch AS (SELECT doc_id, simhash, k, (simhash >> (15 * k)) & 32767 AS cv " +
        " FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)), " +
        "cand AS (SELECT DISTINCT x.doc_id AS d1, x.simhash AS h1, y.doc_id AS d2, y.simhash AS h2 " +
        " FROM ch x JOIN ch y ON x.k = y.k AND x.cv = y.cv AND x.doc_id < y.doc_id) " +
        "SELECT d1, d2, bit_count(xor(h1, h2))::BIGINT AS hamm FROM cand " +
        "WHERE bit_count(xor(h1, h2)) <= 8 ORDER BY d1, d2") { (s, dir) =>
      val sh = simhash(s, dir)
      val ch = sh.select(col("doc_id"), col("simhash"),
          explode(expr("sequence(0, 3)")).as("k"))
        .withColumn("cv", expr("shiftright(simhash, 15 * k) % 32768"))
      ch.as("x")
        .join(ch.as("y"),
          col("x.k") === col("y.k") && col("x.cv") === col("y.cv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("x.simhash").as("h1"),
          col("y.doc_id").as("d2"), col("y.simhash").as("h2"))
        .distinct()
        .withColumn("hamm", expr("cast(bit_count(h1 ^ h2) AS bigint)"))
        .filter(col("hamm") <= 8)
        .select("d1", "d2", "hamm")
        .orderBy("d1", "d2")
    },

    // Embedding near-dup: cosine ≥ 0.4 decided entirely in int64:
    //   dot ≥ 0  AND  25·dot² ≥ 4·‖a‖²·‖b‖²   (0.4² = 4/25)
    Q("q45_embedding_neardup",
      "WITH " + quantizedSql + ", " +
        "p AS (SELECT a.vec_id AS v1, b.vec_id AS v2, " +
        qdotSql("a.q", "b.q") + " AS dot, a.nrm AS na, b.nrm AS nb " +
        " FROM n a JOIN n b ON a.vec_id < b.vec_id) " +
        "SELECT v1, v2, dot, na, nb FROM p " +
        "WHERE dot >= 0 AND 25 * dot * dot >= 4 * na * nb ORDER BY v1, v2") { (s, dir) =>
      val n = quantized(s, dir)
      n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
          qdot(col("a.q"), col("b.q")).as("dot"),
          col("a.nrm").as("na"), col("b.nrm").as("nb"))
        .filter(col("dot") >= 0 &&
          lit(25) * col("dot") * col("dot") >= lit(4) * col("na") * col("nb"))
        .orderBy("v1", "v2")
    }
  )

  /** Shared SimHash pipeline (doc_id, simhash). */
  private def simhash(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("th", h60(col("tok")))
      .select(col("doc_id"), col("cnt"), col("th"),
        explode(expr("sequence(0, 59)")).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(expr("CASE WHEN shiftright(th, b) % 2 = 1 THEN cnt ELSE -cnt END")).as("sb"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN sb > 0 THEN shiftleft(cast(1 AS bigint), b) ELSE cast(0 AS bigint) END"))
        .as("simhash"))
}
