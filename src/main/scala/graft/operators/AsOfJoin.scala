package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark SQL lacks (brief: "when the reference
  * has an operator Spark lacks … (a) compose existing ops if semantics
  * allow"). For each left row, attach the latest right-side value whose
  * time is ≤ the left row's time, per key.
  *
  * The naive formulation is a range join (`l.key = r.key AND r.t <=
  * l.t` + argmax) whose intermediate blows up with key×time density.
  * This implementation is the scalable composition: UNION both sides
  * into one keyed timeline, ONE shuffle on the key, and a running
  * `last(value ignoring nulls)` window — O(n log n) per key, no
  * intermediate pair set at all. Tie discipline: at equal time the
  * right side sorts before the left (inclusive ≤), equal-time right
  * rows resolve to the largest value, so results are deterministic and
  * cross-engine verifiable.
  */
object AsOfJoin {

  /** `left` columns + `outName` = latest `right.valueCol` with
    * `right.timeCol <= left.timeCol` per `key` (null if none). Both
    * inputs must expose `key` and `timeCol`; times must be orderable
    * and exactly comparable (use integer epochs, not truncated units).
    */
  def lastValueAsOf(left: DataFrame, right: DataFrame, key: String,
      timeCol: String, valueCol: String, outName: String): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val outCols = left.columns.map(col).toSeq :+ col("__tag") :+ col("__v")
    val lTagged = left
      .withColumn("__tag", lit(1))
      .withColumn("__v", lit(null).cast(vType))
      .select(outCols: _*)
    val rTagged = left.columns.filterNot(c => c == key || c == timeCol)
      .foldLeft(right.select(col(key), col(timeCol), col(valueCol).as("__v"))) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .withColumn("__tag", lit(0))
      .select(outCols: _*)
    val w = Window.partitionBy(key)
      .orderBy(col(timeCol), col("__tag"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn(outName, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag", "__v")
  }

  def queries: Seq[Q] = Seq(
    // Each click joined to the user's latest purchase at-or-before its
    // timestamp. Times compared as exact epoch NANOS on both engines
    // (micros truncation would flip boundary comparisons).
    Q("q18_asof_join",
      "WITH c AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events WHERE event_type = 'purchase'), " +
        "j AS (SELECT c.event_id, c.user_id, c.t, p.event_id AS pid, p.t AS pt " +
        " FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.t <= c.t), " +
        "m AS (SELECT event_id, max(pt) AS mpt FROM j GROUP BY 1), " +
        "r AS (SELECT j.event_id, j.user_id, max(j.pid) AS last_purchase FROM j JOIN m " +
        " ON j.event_id = m.event_id AND (j.pt = m.mpt OR (j.pt IS NULL AND m.mpt IS NULL)) " +
        " GROUP BY 1, 2) " +
        "SELECT event_id, user_id, last_purchase FROM r ORDER BY event_id") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      // exact nanos on both engines (see q17 for the nanosAsLong contract)
      val t =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType) col("ts")
        else expr("unix_micros(ts) * 1000")
      val base = ev.select(col("event_id"), col("user_id"), col("event_type"), t.as("t"))
      val clicks = base.filter(col("event_type") === "click")
        .select("event_id", "user_id", "t")
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("t"))
      lastValueAsOf(clicks, purchases, key = "user_id", timeCol = "t",
        valueCol = "pid", outName = "last_purchase")
        .select("event_id", "user_id", "last_purchase")
        .orderBy("event_id")
    }
  )
}
