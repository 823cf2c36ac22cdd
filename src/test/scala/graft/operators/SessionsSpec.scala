package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Batch sessionization: randomized cross-check against a sequential
  * in-memory sessionizer, plus the gap invariants.
  */
class SessionsSpec extends AnyFunSuite with SparkFixture {

  private val gapMin = 240
  private val gapUs = gapMin * 60L * 1000000L

  /** The obviously-correct single-threaded reference. */
  private def seqSessions(events: Seq[(Long, Long, Long, Double)])
      : Map[(Long, Long), (Long, Long, Long)] = {
    events.groupBy(_._1).flatMap { case (u, evs) =>
      var sess = 0L
      var prev = Long.MinValue
      evs.sortBy(e => (e._3, e._2)).map { case (_, _, us, _) =>
        if (prev == Long.MinValue || us - prev > gapUs) sess += 1
        prev = us
        ((u, sess), us)
      }.groupBy(_._1).map { case (k, xs) =>
        k -> (xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max)
      }
    }
  }

  test("randomized cross-check vs sequential sessionizer") {
    import spark.implicits._
    val rnd = new Random(42)
    // 20 users, clustered timestamps so both regimes (within-gap and
    // session-breaking) occur frequently
    val events = (1L to 2000L).map { id =>
      val u = rnd.nextInt(20).toLong
      val us = rnd.nextInt(50).toLong * gapUs / 3 + rnd.nextInt(1000000)
      (u, id, us, 1.0)
    }
    val df = events.toDF("user_id", "event_id", "us", "value")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("value"))
      .repartition(7)
    val got = Sessions.sessionize(df, gapMinutes = gapMin)
      .select("user_id", "sess", "n_events", "start_us", "end_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == seqSessions(events))
  }

  test("session bounds respect the gap: adjacent sessions are > gap apart") {
    import spark.implicits._
    val evs = Seq(
      (1L, 1L, 0L), (1L, 2L, 1000L), // session 1
      (1L, 3L, gapUs + 2000L), // session 2 (gap exceeded by 1ms)
      (2L, 4L, 5L)) // other user unaffected
      .toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), lit(2.5).as("value"))
    val rows = Sessions.sessionize(evs, gapMinutes = gapMin)
      .orderBy("user_id", "sess").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
    // exact DECIMAL money sum
    assert(rows.head.getDouble(5) == 5.0)
  }

  test("funnel: furthest stage reached IN first-touch order") {
    import spark.implicits._
    def ev(rows: (Long, Long, String)*) = rows.toSeq
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), col("user_id").as("event_id"), lit(0.0).as("value"))
    val df = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full funnel
      (2L, 10L, "click"), (2L, 20L, "view"), // click BEFORE view -> stage 1
      (3L, 10L, "view"), // view only
      (4L, 10L, "signup"), // never entered -> 0
      (5L, 10L, "view"), (5L, 10L, "click")) // same-µs tie counts (>=)
    val got = Sessions.funnel(df).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 2L), got)
  }

  test("plan: ONE exchange — session agg reuses the window's hash partitioning") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 5L, i.toLong, i * 1000L, 1.0))
      .toDF("user_id", "event_id", "us", "value")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("value"))
    val p = Sessions.sessionize(df).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length == 1,
      s"(user_id, sess) agg should reuse the user_id exchange:\n$p")
  }
}
