package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared embedding primitives: exact int64 quantization and
  * random-hyperplane sign-LSH banding — used by the near-dup pipeline
  * (q45) and the ANN similarity-search operators (q62/q63).
  *
  * Everything here is cross-engine exact: vectors quantize to int64
  * (×100), dot products and norms are integer arithmetic, hyperplane
  * components derive from a fixed integer formula, and the only
  * floating-point value (cosine) is produced by ONE division + sqrt of
  * exactly-representable int64s (< 2^53), which IEEE 754 rounds
  * identically in every engine — no accumulation-order dependence.
  */
object EmbeddingLsh {

  /** Sign-LSH geometry: NumBands bands of BandBits bits each. */
  val NumBands = 8
  val BandBits = 6

  /** Quantize any (id, float-vector) frame: int64 vector (×100) + int64
    * squared norm, output columns (vec_id, q, nrm) plus any `keep`
    * passthrough columns (labels, sources — still a pure projection,
    * no join needed to retain them). Library entry point — every
    * cosine downstream is exact integer arithmetic.
    */
  def quantize(df: DataFrame, idCol: String, vecCol: String,
      keep: Seq[String] = Nil): DataFrame =
    df.select(col(idCol).as("vec_id") +: expr(
        s"transform($vecCol, x -> cast(round(cast(x AS double) * 100, 0) AS bigint))").as("q")
        +: keep.map(col): _*)
      .withColumn("nrm", expr("aggregate(q, cast(0 AS bigint), (acc, x) -> acc + x * x)"))

  /** The gate's `embeddings` table quantized. */
  def quantized(s: SparkSession, dir: String): DataFrame =
    quantize(Tables.load(s, dir, "embeddings"), "vec_id", "embedding")

  val quantizedSql: String =
    "q0 AS (SELECT vec_id, [cast(round(x::DOUBLE * 100, 0) AS BIGINT) FOR x IN embedding] AS q " +
      "FROM embeddings), " +
      "n AS (SELECT vec_id, q, list_aggregate([x * x FOR x IN q], 'sum')::BIGINT AS nrm FROM q0)"

  /** `nf`: the quantized frame under LISTWISE DELETION — a vector with
    * ANY null component contributes nothing, count included. This is
    * [[graft.functions.GramAgg]]'s null contract, declared in the
    * oracle rather than left to a bare SUM's per-element null skip
    * (which would still count the vector and keep its other
    * components). Append after [[quantizedSql]].
    */
  val nullFreeSql: String =
    "nf AS (SELECT vec_id, q FROM n " +
      "WHERE len(q) = len(list_filter(q, x -> x IS NOT NULL))), "

  /** Exact int64 dot product of two quantized vectors (Spark side): a
    * native codegen expression ([[graft.functions.QDot]]) — the HOF
    * formulation (`aggregate(zip_with(...))`) interprets its lambda per
    * element, which is the hot loop at N·Q dots.
    */
  def qdot(a: Column, b: Column): Column = graft.functions.QDot.qdot(a, b)

  /** Same dot product in DuckDB SQL over columns `$a`/`$b`. */
  def qdotSql(a: String, b: String): String =
    s"list_aggregate([$a[i] * $b[i] FOR i IN generate_series(1, len($a))], 'sum')::BIGINT"

  /** Fixed pseudo-random hyperplane component H(j)(i), identical
    * arithmetic in Spark SQL and DuckDB: values in [-504, 504], all
    * intermediate products < 2^63.
    */
  def hcomp(j: Int): String =
    s"(((53*${j + 1}+97*i) * 2654435761) % 1009 - 504)"

  /** (vec_id, k, bv): band index + band value per vector, Spark side.
    * Input must expose `vec_id` and quantized `q`. All 48 hyperplane
    * signatures compute in ONE native codegen pass
    * ([[graft.functions.SignBands]]); the DuckDB oracle keeps the
    * per-bit SQL formulation — identical integers.
    */
  def bands(n: DataFrame): DataFrame =
    n.select(col("vec_id"), posexplode(
      graft.functions.SignBands.sign_bands(col("q"), NumBands, BandBits))
      .as(Seq("k", "bv")))

  /** DuckDB CTE fragments `bits`, `bd`, `bands` over source CTE `src`
    * (default `n`). The ONE rendering of the sign-LSH geometry — the
    * q45/q63/q89/q91 oracles all instantiate it, so a change to the
    * hyperplane formula cannot diverge them.
    */
  def bandsSql(src: String = "n"): String = {
    val nh = NumBands * BandBits
    val bits = (0 until nh).map { j =>
      s"CASE WHEN list_aggregate([q[i+1] * ${hcomp(j)} FOR i IN generate_series(0,63)], 'sum')::BIGINT >= 0 " +
        s"THEN 1::BIGINT ELSE 0::BIGINT END AS bit$j"
    }.mkString(", ")
    val bandvals = (0 until NumBands).map { k =>
      "(" + (0 until BandBits).map(r => s"bit${BandBits * k + r} * ${1L << r}").mkString(" + ") + s") AS band$k"
    }.mkString(", ")
    val bands = (0 until NumBands)
      .map(k => s"SELECT vec_id, $k AS k, band$k AS bv FROM bd").mkString(" UNION ALL ")
    s"bits AS (SELECT vec_id, $bits FROM $src), " +
      s"bd AS (SELECT vec_id, $bandvals FROM bits), " +
      s"bands AS ($bands)"
  }
}
