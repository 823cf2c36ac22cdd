package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques as library API: the shuffle-shaping tools a 100 TB
  * pipeline reaches for when the default plan hits a wall.
  *
  *   - SALTING: a single hot key (an empty-string document, a null-ish
  *     default, one viral item) funnels its entire group through ONE
  *     reducer. Two-phase salted aggregation splits each key across
  *     `salts` sub-groups (deterministic content-derived salt — stable
  *     under task retries, unlike random or partition-id salts), partial-
  *     aggregates them in parallel, then merges the tiny per-salt
  *     partials. The hot key's work spreads over `salts` reducers at the
  *     cost of one extra (small) shuffle.
  *   - BUCKETING: covered by Spark's bucketed tables — see
  *     ScaleSpec's co-located join proof (same bucket count + key on
  *     both sides ⇒ join with NO exchange on either side).
  */
object Scale {

  // Content-derived row salt: hash of ALL columns, so a re-executed map
  // task routes every row to the SAME salt it chose the first time. A
  // positional salt (monotonically_increasing_id, partition id, random)
  // is nondeterministic under retry — after a fetch failure, reducers
  // that already consumed attempt-1 output coexist with attempt-2's
  // re-routed rows and the counts silently double/drop (SPARK-23207).
  // The cost: FULLY identical duplicate rows share one salt — but those
  // collapse into a single partial per (key, salt) in the map-side
  // combine before they ever shuffle, so they cannot re-create the hot
  // key; the salt's job is spreading hot KEYS whose rows differ, which
  // a content hash does.
  private def salt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts))

  /** `df.groupBy(key).count()` with two-phase salting: skew-proof for
    * any key distribution.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("count"))

  /** Salted exact decimal sum per key (partial sums merge exactly —
    * this is why the money columns ride DECIMAL, not DOUBLE: the merge
    * is associative whatever the salt split).
    */
  def saltedSum(df: DataFrame, key: String, value: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("sum"))
}
