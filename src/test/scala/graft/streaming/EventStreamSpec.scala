package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Watermarked windowed aggregation over an unbounded event stream:
  * completed windows emit exactly once (append mode), late data beyond
  * the watermark is dropped, state stays bounded.
  */
class EventStreamSpec extends AnyFunSuite with SparkFixture {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("append-mode hourly aggregate emits finalized windows only") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val agg = EventStream.hourlyAggregate(
      input.toDF().toDF("ts", "event_type", "value"), lateness = "5 minutes")

    val q = agg.writeStream
      .format("memory").queryName("hourly_out").outputMode("append").start()
    try {
      // two events in hour 10, one in hour 11
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.5),
        (ts("2024-01-01 10:40:00"), "click", 2.5),
        (ts("2024-01-01 11:01:00"), "view", 1.0))
      q.processAllAvailable()
      // nothing final yet: watermark = 11:01 - 5min < 11:00
      assert(spark.table("hourly_out").count() == 0)

      // advance event time past 11:05 → hour-10 window finalizes
      input.addData((ts("2024-01-01 11:20:00"), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSet == Set(("2024-01-01 10:00:00.0", "click", 2L, 4.0)))

      // a straggler older than the watermark is dropped, not re-emitted
      input.addData((ts("2024-01-01 10:10:00"), "click", 99.0))
      input.addData((ts("2024-01-01 12:30:00"), "view", 1.0))
      q.processAllAvailable()
      val after = spark.table("hourly_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      // hour-10 click window still counts 2 (the 99.0 never lands);
      // hour-11 views finalized with the two in-time events
      assert(after.count(_._1 == "2024-01-01 10:00:00.0") == 1)
      assert(after.toSet.contains(("2024-01-01 11:00:00.0", "view", 2L, 4.0)))
    } finally q.stop()
  }
}
