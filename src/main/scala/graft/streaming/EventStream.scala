package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming extension (SURVEY §2.7: the reference is
  * batch-only — every exec declares `Boundedness::Bounded` — so this is
  * the north-star extension, not parity): the same declarative
  * transforms the batch engine runs, over an unbounded `events` stream.
  *
  * The seams are exactly where SURVEY points:
  *   - source: any streaming DataFrame with (ts, event_type, value) —
  *     `readStream` on files/Kafka in production, `MemoryStream` in
  *     tests;
  *   - transform: event-time windowed aggregation with a watermark
  *     bounding state (at 100 TB/day the watermark IS the memory
  *     budget: state per key×window is dropped once the watermark
  *     passes);
  *   - sink: `writeStream` with append semantics — finalized windows
  *     only, so downstream JDBC/document sinks receive each window
  *     exactly once.
  */
object EventStream {

  /** Per-(hour window, event_type) count + exact DECIMAL sum of value,
    * with `lateness` watermark. Append-mode compatible: a window emits
    * only when the watermark guarantees it is complete.
    */
  def hourlyAggregate(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("hour_ts"),
        col("event_type"), col("n"), col("total_value"))
}
