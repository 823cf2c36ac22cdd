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

  // Round-robin row salt. A content-derived salt cannot split a hot key
  // made of IDENTICAL rows (the common case — think repeated default
  // values), so the salt must vary per physical row. Any assignment is
  // correct: the phase-2 merge is associative, so a task retry that
  // lands rows on different salts still produces the same final result.
  private def salt(df: DataFrame, salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

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
