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

  /** Range (interval) join at scale: pairs (left point, right interval)
    * with `point ∈ [start, start+width)` per key. The naive theta join
    * is quadratic per key; here intervals of bounded width explode into
    * at most ⌈width/bucket⌉+1 coarse time buckets, the join is an
    * EQUI-join on (key, bucket), and the exact containment filter runs
    * on candidates only — the standard interval-join decomposition,
    * shuffle keyed on (key, bucket) so hot keys also spread over time.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startTime: String, width: Long, bucket: Long): DataFrame = {
    // `div`, never `/`: epoch nanos exceed 2^53, double division would
    // misplace bucket boundaries
    val spans = intervals.withColumn("__b", explode(sequence(
      expr(s"$startTime div $bucket"),
      expr(s"($startTime + ${width}L) div $bucket"))))
    val bucketed = points.withColumn("__b", expr(s"$pointTime div $bucket"))
    // a point has exactly ONE bucket and an interval visits each bucket
    // once, so every qualifying pair appears exactly once — no dedup
    bucketed.join(spans, Seq(key, "__b"))
      .filter(col(pointTime) >= col(startTime) &&
        col(pointTime) < col(startTime) + lit(width))
      .drop("__b")
  }

  def queries: Seq[Q] = Seq(
    // Each click joined to the user's latest purchase at-or-before its
    // timestamp. Times compared as exact epoch MICROS on both engines
    // (DuckDB reads the TIMESTAMP_NS parquet column at micro precision,
    // so Spark floors its nanos with `div 1000` to the same domain).
    Q("q18_asof_join",
      "WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'), " +
        "j AS (SELECT c.event_id, c.user_id, c.t, p.event_id AS pid, p.t AS pt " +
        " FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.t <= c.t), " +
        "m AS (SELECT event_id, max(pt) AS mpt FROM j GROUP BY 1), " +
        "r AS (SELECT j.event_id, j.user_id, max(j.pid) AS last_purchase FROM j JOIN m " +
        " ON j.event_id = m.event_id AND (j.pt = m.mpt OR (j.pt IS NULL AND m.mpt IS NULL)) " +
        " GROUP BY 1, 2) " +
        "SELECT event_id, user_id, last_purchase FROM r ORDER BY event_id") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      // micros domain on both engines (see class comment)
      val t = Tables.epochMicros(ev)
      val base = ev.select(col("event_id"), col("user_id"), col("event_type"), t.as("t"))
      val clicks = base.filter(col("event_type") === "click")
        .select("event_id", "user_id", "t")
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("t"))
      lastValueAsOf(clicks, purchases, key = "user_id", timeCol = "t",
        valueCol = "pid", outName = "last_purchase")
        .select("event_id", "user_id", "last_purchase")
        .orderBy("event_id")
    },

    // Clicks within one hour AFTER a purchase by the same user: the
    // bucketed range join (equi-join on (user, hour-bucket) + exact
    // containment) vs DuckDB's native range join.
    Q("q19_range_join",
      "WITH c AS (SELECT event_id AS cid, user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pt FROM events WHERE event_type = 'purchase') " +
        "SELECT p.pid, c.cid, c.t - p.pt AS dt_us FROM p JOIN c " +
        "ON p.user_id = c.user_id AND c.t >= p.pt AND c.t < p.pt + 3600000000 " +
        "ORDER BY pid, cid") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val t = Tables.epochMicros(ev)
      val base = ev.select(col("event_id"), col("user_id"), col("event_type"), t.as("t"))
      val clicks = base.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("t"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("t").as("pt"))
      val hourUs = 3600000000L
      rangeJoin(clicks, purchases, key = "user_id",
        pointTime = "t", startTime = "pt", width = hourUs, bucket = hourUs)
        .select(col("pid"), col("cid"), (col("t") - col("pt")).as("dt_us"))
        .orderBy("pid", "cid")
    }
  )
}
