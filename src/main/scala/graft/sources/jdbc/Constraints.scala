package graft.sources.jdbc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-write constraint validation (reference
  * `crates/common/src/util/constraints.rs:28-95`: a dup-key check built
  * as a `GROUP BY keys HAVING count > 1` plan over the incoming
  * batches, run before any row is written).
  *
  * Distributed by construction — one hash aggregation over the input,
  * no collect of data; only the (tiny) violation sample reaches the
  * driver.
  */
object Constraints {

  /** Throws if `df` contains more than one row for any value of `keys`;
    * the message carries up to three offending key tuples.
    */
  def assertUniqueKeys(df: DataFrame, keys: Seq[String]): Unit = {
    val dups = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .limit(3)
      .collect()
    if (dups.nonEmpty) {
      val sample = dups.map(r => keys.map(k => s"$k=${r.getAs[Any](k)}").mkString("(", ", ", ")"))
        .mkString(", ")
      throw new IllegalStateException(
        s"upsert input violates key uniqueness on ${keys.mkString(",")}: $sample ...")
    }
  }
}
