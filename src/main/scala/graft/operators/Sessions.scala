package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch sessionization over an event stream: gap-based session
  * assignment (a new session starts when the inter-event gap exceeds
  * `gap`) and per-session aggregates — the classic clickstream /
  * telemetry operator (the streaming flavor lives in
  * [[graft.streaming.EventStream]] via `session_window`; this is the
  * batch-backfill twin over the same semantics).
  *
  * Scale shape: ONE hash shuffle on the entity key. The lag and
  * running-sum windows share the (user_id)-partitioned sort, and the
  * final per-session aggregation groups on (user_id, session) — a
  * superset of the window's hash key, so EnsureRequirements reuses the
  * same exchange instead of shuffling again. Nothing is driver-side and
  * per-entity state never exceeds that entity's events.
  *
  * Cross-engine exactness: all gap arithmetic is on epoch MICROSECOND
  * integers (the parquet nanos are integer-truncated to µs in both
  * engines), and the money sum routes through DECIMAL(18,2).
  */
object Sessions {

  /** Events table ts column → epoch-micros long; the shared tolerant
    * accessor (long-nanos / TIMESTAMP / TIMESTAMP_NTZ all map to the
    * same µs domain as the oracle's `epoch_us`). */
  private def microsOf(ev: DataFrame, tsCol: String): Column =
    Tables.epochMicros(ev, tsCol)

  /** Sessionize any (entity, time, value) frame; returns one row per
    * session: (user_id, sess, n_events, start_us, end_us, sum_value).
    * `sess` numbers an entity's sessions 1..n in time order.
    */
  def sessionize(ev: DataFrame, gapMinutes: Int = 240,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col(userCol).as("user_id"), col(idCol).as("event_id"),
        microsOf(ev, tsCol).as("us"), col(valueCol).as("value"))
      .withColumn("prev", lag("us", 1).over(wOrd))
      .withColumn("brk",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum("brk").over(wRun))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("start_us"), max("us").as("end_us"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
  }

  /** Ordered funnel analysis: per entity, the epoch-µs time of the
    * first occurrence of each funnel step, and the furthest stage
    * reached IN ORDER (step k counts only if its first occurrence is at
    * or after the time that completed stage k−1). One
    * map-side-combinable conditional-MIN aggregation — a single shuffle
    * on the entity key at any scale, no window, no self-join (the
    * per-step-pair join formulation is quadratic in steps and shuffles
    * per step).
    */
  def funnel(ev: DataFrame, steps: Seq[String] = Seq("view", "click", "purchase"),
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val base = ev.select(col(userCol).as("user_id"),
        microsOf(ev, tsCol).as("us"), col(typeCol).as("et"))
      .groupBy("user_id")
      .agg(min(when(col("et") === steps.head, col("us"))).as("t0"),
        steps.tail.zipWithIndex.map { case (s, i) =>
          min(when(col("et") === s, col("us"))).as(s"t${i + 1}")
        }: _*)
    // stage k requires t0 <= t1 <= ... <= t(k-1), each non-null; the
    // fold builds "time that completed stage k" left to right
    val stage = steps.indices.tail.foldLeft(
        (when(col("t0").isNotNull, 1L).otherwise(0L), col("t0"))) {
      case ((st, prevT), i) =>
        val ok = col(s"t$i").isNotNull && col(s"t$i") >= prevT && st === i.toLong
        (when(ok, (i + 1).toLong).otherwise(st),
          when(ok, col(s"t$i")).otherwise(prevT))
    }._1
    base.withColumn("stage", stage)
  }

  /** Cohort retention: users grouped by their first-activity day (the
    * cohort), counted distinct on each subsequent day-offset they were
    * active. Day indices are exact epoch-µs integer divisions, so both
    * engines bucket identically. Scale shape: the first-activity frame
    * is one map-side-combinable MIN per user and joins back
    * broadcast-sized relative to the event stream; the retention matrix
    * aggregation is the only event-stream shuffle.
    */
  def retention(ev: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    // integer day index via `div` (Column./ is floating division)
    val days = ev.select(col(userCol).as("user_id"),
        microsOf(ev, tsCol).as("us"))
      .select(col("user_id"), expr("us div 86400000000").as("d"))
    val first = days.groupBy("user_id").agg(min("d").as("d0"))
    days.join(first, "user_id")
      .groupBy(col("d0").as("cohort_day"), (col("d") - col("d0")).as("days_since"))
      .agg(countDistinct("user_id").as("n_active"))
  }

  def queries: Seq[Q] = Seq(
    // First-touch funnel over events: first view/click/purchase times
    // per user and the furthest stage reached in order.
    Q("q92_funnel",
      "WITH m AS (SELECT user_id, " +
        "min(CASE WHEN event_type='view' THEN epoch_us(ts) END) AS t0, " +
        "min(CASE WHEN event_type='click' THEN epoch_us(ts) END) AS t1, " +
        "min(CASE WHEN event_type='purchase' THEN epoch_us(ts) END) AS t2 " +
        "FROM events GROUP BY user_id) " +
        "SELECT user_id, t0, t1, t2, CAST(CASE WHEN t0 IS NULL THEN 0 " +
        "WHEN t1 IS NULL OR t1 < t0 THEN 1 " +
        "WHEN t2 IS NULL OR t2 < t1 THEN 2 ELSE 3 END AS BIGINT) AS stage " +
        "FROM m ORDER BY user_id") { (s, dir) =>
      funnel(Tables.load(s, dir, "events")).orderBy("user_id")
    },

    // Day-cohort retention matrix: first-activity-day cohorts ×
    // days-since-first distinct-active counts.
    Q("q94_retention",
      "WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events), " +
        "f AS (SELECT user_id, min(d) AS d0 FROM e GROUP BY user_id) " +
        "SELECT f.d0 AS cohort_day, e.d - f.d0 AS days_since, " +
        "count(DISTINCT e.user_id) AS n_active " +
        "FROM e JOIN f ON e.user_id = f.user_id GROUP BY 1, 2 " +
        "ORDER BY cohort_day, days_since") { (s, dir) =>
      retention(Tables.load(s, dir, "events")).orderBy("cohort_day", "days_since")
    },

    // Inter-event gap analysis with lead/lag + defaults: previous and
    // next event times per user (epoch-µs, -1 default at the edges) and
    // the gap to the previous event.
    Q("q93_lead_lag",
      "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events) " +
        "SELECT user_id, event_id, us, " +
        "lag(us, 1, -1) OVER w AS prev_us, " +
        "lead(us, 1, -1) OVER w AS next_us, " +
        "us - lag(us, 1) OVER w AS gap_us " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id) " +
        "ORDER BY user_id, us, event_id") { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val us = microsOf(ev, "ts")
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      ev.select(col("user_id"), col("event_id"), us.as("us"))
        .select(col("user_id"), col("event_id"), col("us"),
          lag("us", 1, -1L).over(w).as("prev_us"),
          lead("us", 1, -1L).over(w).as("next_us"),
          (col("us") - lag("us", 1).over(w)).as("gap_us"))
        .orderBy("user_id", "us", "event_id")
    },

    // Gap-based sessions (4 h) over `events` with per-session counts,
    // bounds and exact money totals.
    Q("q87_sessionize",
      "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events), " +
        "m AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e), " +
        "b AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 14400000000 THEN 1 ELSE 0 END AS brk FROM m), " +
        "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS sess FROM b) " +
        "SELECT user_id, CAST(sess AS BIGINT) AS sess, count(*) AS n_events, min(us) AS start_us, max(us) AS end_us, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM s GROUP BY 1, 2 ORDER BY user_id, sess") { (s, dir) =>
      sessionize(Tables.load(s, dir, "events")).orderBy("user_id", "sess")
    }
  )
}
