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

  test("driftStats: per-window augmented Gramian equals the batch statistic") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Seq[Long])](spark)
    val out = EventStream.driftStats(
      input.toDF().toDF("ts", "q"), windowLen = "1 hour", lateness = "5 minutes")
    val q = out.writeStream
      .format("memory").queryName("drift_out").outputMode("append").start()
    try {
      val hour10 = Seq(Seq(2L, 3L), Seq(-1L, 4L), Seq(0L, 5L))
      input.addData(hour10.zipWithIndex.map { case (v, i) =>
        (ts(s"2024-01-01 10:0$i:00"), v) }: _*)
      input.addData((ts("2024-01-01 11:20:00"), Seq(7L, 7L)))
      q.processAllAvailable()
      val rows = spark.table("drift_out").collect()
      assert(rows.length == 1, rows.mkString(","))
      val gm = rows.head
        .getAs[scala.collection.Seq[scala.collection.Seq[Long]]](1)
        .map(_.toSeq).toSeq
      // batch reference: augmented Gramian of the hour-10 vectors
      val aug = hour10.map(1L +: _)
      val want = (0 until 3).map(i => (0 until 3).map(j =>
        aug.map(v => v(i) * v(j)).sum))
      assert(gm == want, gm)
      // cell (0,0) is the window's vector count, row 0 the linear sums
      assert(gm(0)(0) == 3L && gm(0)(1) == 1L && gm(0)(2) == 12L)
    } finally q.stop()
  }

  test("streaming dedup keeps first arrival per fingerprint, bounded state") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)](spark)
    val out = EventStream.dedupStream(
      input.toDF().toDF("ts", "doc_id", "text"), lateness = "5 minutes")

    val q = out.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "alpha"),
        (ts("2024-01-01 10:00:30"), 2L, "beta"),
        (ts("2024-01-01 10:01:00"), 3L, "alpha")) // dup within watermark
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L), s"dup survived: $ids")

      // another duplicate in a later batch, still within the watermark
      input.addData((ts("2024-01-01 10:02:00"), 4L, "beta"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)

      // new content always passes
      input.addData((ts("2024-01-01 10:03:00"), 5L, "gamma"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
        == Set(1L, 2L, 5L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionize closes sessions on gap and timeout") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)](spark)
    val out = EventStream.sessionize(
      input.toDF().toDF("ts", "event_type"), gapMinutes = 10, lateness = "1 minute")

    val q = out.writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // session A: 3 events within the gap; then a 20-min silence, then
      // one more event — a new session, which also closes the first
      input.addData(
        (ts("2024-01-01 09:00:00"), "click"),
        (ts("2024-01-01 09:05:00"), "click"),
        (ts("2024-01-01 09:08:00"), "click"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 09:28:00"), "click"))
      q.processAllAvailable()
      val s1 = spark.table("sess_out").as[EventStream.Session].collect()
      assert(s1.length == 1, s"expected first session closed: ${s1.mkString(",")}")
      assert(s1.head == EventStream.Session("click",
        ts("2024-01-01 09:00:00").getTime / 1000,
        ts("2024-01-01 09:08:00").getTime / 1000, 3))

      // advancing the watermark past last+gap closes the open session
      // via the event-time timeout, without any further 'click' event
      input.addData((ts("2024-01-01 10:30:00"), "other"))
      q.processAllAvailable()
      val s2 = spark.table("sess_out").as[EventStream.Session].collect()
      assert(s2.exists(s => s.event_type == "click" && s.n_events == 1 &&
        s.session_start == ts("2024-01-01 09:28:00").getTime / 1000),
        s"timeout did not close the idle session: ${s2.mkString(",")}")
    } finally q.stop()
  }

  test("sinkTo appends finalized windows to a JDBC catalog table") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.strm")
    spark.sql("DROP TABLE IF EXISTS ext.strm.hourly")
    spark.sql("CREATE TABLE ext.strm.hourly " +
      "(hour_ts TIMESTAMP, event_type STRING, n BIGINT, total_value DOUBLE)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString

    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val agg = EventStream.hourlyAggregate(
      input.toDF().toDF("ts", "event_type", "value"), lateness = "5 minutes")
    val q = EventStream.sinkTo(agg, "ext.strm.hourly", ckpt)
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.5),
        (ts("2024-01-01 10:40:00"), "click", 2.5))
      q.processAllAvailable()
      // window not finalized → nothing reaches the remote store yet
      assert(spark.table("ext.strm.hourly").count() == 0)

      // watermark passes 11:05 → hour-10 window lands in Derby
      input.addData((ts("2024-01-01 11:20:00"), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("ext.strm.hourly").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSet == Set(("2024-01-01 10:00:00.0", "click", 2L, 4.0)),
        s"unexpected sink contents: ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("curateTo decontaminates each micro-batch with the batch operator") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.strm")
    spark.sql("DROP TABLE IF EXISTS ext.strm.clean")
    spark.sql("CREATE TABLE ext.strm.clean " +
      "(ts TIMESTAMP, doc_id BIGINT, text STRING)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_curate_ckpt").toString
    val bench = Seq((100L, "wizards oozing quartz jam")).toDF("doc_id", "text")

    val input = MemoryStream[(Timestamp, Long, String)](spark)
    val q = EventStream.curateTo(
      input.toDF().toDF("ts", "doc_id", "text"), bench, "ext.strm.clean", ckpt)
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "totally fresh content here indeed"),
        (ts("2024-01-01 10:01:00"), 2L, "behold wizards oozing quartz jam today"))
      q.processAllAvailable()
      // the doc sharing a benchmark 4-gram never reaches the store
      import spark.implicits._
      assert(spark.table("ext.strm.clean").select("doc_id").as[Long].collect().toSet
        == Set(1L))

      // later batches are filtered independently (no cross-batch state)
      input.addData(
        (ts("2024-01-01 10:02:00"), 3L, "wizards oozing quartz jam"),
        (ts("2024-01-01 10:03:00"), 4L, "another clean line of words"))
      q.processAllAvailable()
      assert(spark.table("ext.strm.clean").select("doc_id").as[Long].collect().toSet
        == Set(1L, 4L))
    } finally q.stop()
  }

  test("nearDedupTo drops exact, in-batch-near, and cross-batch-near duplicates") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.strm")
    spark.sql("DROP TABLE IF EXISTS ext.strm.corpus")
    spark.sql("CREATE TABLE ext.strm.corpus (doc_id BIGINT, text STRING)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_neardedup_ckpt").toString

    // a 40-word base text; near-dups differ in ONE word (high Jaccard on
    // 2-shingles → LSH band collision; simhash hamming well under 8)
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    def variant(pos: Int): String =
      (1 to 40).map(i => if (i == pos) "CHANGED" else s"tok$i").mkString(" ")
    val distinct1 = (1 to 40).map(i => s"other$i").mkString(" ")
    val distinct2 = (1 to 40).map(i => s"fresh$i").mkString(" ")

    val input = MemoryStream[(Long, String)](spark)
    val q = EventStream.nearDedupTo(
      input.toDF().toDF("doc_id", "text"), "ext.strm.corpus", ckpt)
    try {
      // batch 1: base kept; in-batch near-dup (d2) dropped; distinct kept
      input.addData((1L, base), (2L, variant(40)), (3L, distinct1))
      q.processAllAvailable()
      assert(spark.table("ext.strm.corpus").select("doc_id").as[Long].collect().toSet
        == Set(1L, 3L))

      // batch 2: exact re-arrival dropped (fp), cross-batch near-dup of
      // the STORED corpus dropped (simhash pigeonhole), new doc kept
      input.addData((4L, base), (5L, variant(7)), (6L, distinct2))
      q.processAllAvailable()
      assert(spark.table("ext.strm.corpus").select("doc_id").as[Long].collect().toSet
        == Set(1L, 3L, 6L))
    } finally q.stop()
  }

  test("annSinkTo serves each probe batch the exact IVF top-k of the batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.strm")
    spark.sql("DROP TABLE IF EXISTS ext.strm.annres")
    spark.sql("CREATE TABLE ext.strm.annres (qid BIGINT, vec_id BIGINT, cos DOUBLE)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ann_ckpt").toString

    // deterministic 8-dim corpus, ids 0..99; probe ids start at 1000
    def vec(seed: Long): Array[Float] =
      (0 until 8).map(d => (((seed * 31 + d * 7) % 19) - 9) / 3.0f).toArray
    val corpus = (0L until 100L).map(i => (i, vec(i))).toDF("vec_id", "embedding")

    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = EventStream.annSinkTo(
      input.toDF().toDF("vec_id", "embedding"), corpus, "ext.strm.annres", ckpt,
      nprobe = 3, k = 4)
    try {
      input.addData((1000L, vec(3)), (1001L, vec(55)))
      q.processAllAvailable()
      input.addData((1002L, vec(77)))
      q.processAllAvailable()

      // oracle: the BATCH IVF chain over corpus ∪ all probes
      val all = graft.operators.EmbeddingLsh.quantize(
        corpus.unionByName(Seq((1000L, vec(3)), (1001L, vec(55)), (1002L, vec(77)))
          .toDF("vec_id", "embedding")), "vec_id", "embedding")
      val expect = graft.operators.Similarity.annIvf(all,
          isQuery = col("vec_id") >= 1000L,
          isCentroid = col("vec_id") < 1000L && col("vec_id") % 25 === 0,
          nprobe = 3, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.operators.GraftCache.releaseAll()

      val got = spark.table("ext.strm.annres")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"streaming=$got batch=$expect")
      assert(got.map(_._1) == Set(1000L, 1001L, 1002L))
    } finally q.stop()
  }

  test("heavyHittersStream keeps a running exact sketch across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[(String, String)](spark)
    val hh = EventStream.heavyHittersStream(
      input.toDF().toDF("grp", "item"), capacity = 8)

    val q = hh.writeStream
      .format("memory").queryName("hh_out").outputMode("update").start()
    try {
      input.addData(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "x"))
      q.processAllAvailable()
      input.addData(("g1", "a"), ("g1", "c"), ("g2", "x"))
      q.processAllAvailable()
      // latest update per group reflects ALL batches (running state):
      // distinct ≤ capacity, so counters are exact
      val last = spark.table("hh_out").collect()
        .map(r => r.getString(0) -> r.getMap[String, Long](1).toMap)
        .groupBy(_._1).map { case (g, xs) => g -> xs.last._2 }
      assert(last("g1") == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
      assert(last("g2") == Map("x" -> 2L))
    } finally q.stop()
  }

  test("streaming sessionize matches the batch operator on real event data across micro-batches") {
    // The batch operator is the oracle (itself DuckDB-oracled via q87):
    // feed the same second-granularity events through the stateful
    // streaming path in TWO micro-batches split on a time boundary —
    // sessions spanning the boundary must continue through state — then
    // close everything via the event-time timeout and compare exactly.
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val gapMin = 240
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("user_id") < 40)
    // second-granularity timestamps (the streaming state works in epoch
    // seconds), tolerant of long-nanos / TIMESTAMP / TIMESTAMP_NTZ
    // parquet readings via the shared epoch-micros accessor
    val us = graft.Tables.epochMicros(ev)
    val tsSec = timestamp_micros(us - pmod(us, lit(1000000L)))
    val raw = ev.select(tsSec.as("ts"),
      col("user_id").cast("string").as("event_type"),
      col("event_id"), lit(1.0).as("value"))

    val rows = raw.select("ts", "event_type").as[(Timestamp, String)]
      .collect().sortBy(_._1.getTime)
    assert(rows.length > 100, s"test corpus too small: ${rows.length}")
    val splitAt = rows(rows.length / 2)._1.getTime
    val (b1, b2) = rows.partition(_._1.getTime < splitAt)
    val sentinel = (new Timestamp(rows.last._1.getTime +
      (gapMin + 120) * 60000L), "sentinel")

    val input = MemoryStream[(Timestamp, String)](spark)
    val out = EventStream.sessionize(
      input.toDF().toDF("ts", "event_type"), gapMinutes = gapMin,
      lateness = "1 second")
    val q = out.writeStream
      .format("memory").queryName("sess_eq_out").outputMode("append").start()
    val streamed =
      try {
        input.addData(b1.toSeq); q.processAllAvailable()
        input.addData(b2.toSeq); q.processAllAvailable()
        input.addData(sentinel); q.processAllAvailable()
        spark.table("sess_eq_out").as[EventStream.Session].collect()
          .filter(_.event_type != "sentinel")
          .map(s => (s.event_type, s.session_start, s.session_end, s.n_events))
          .toSet
      } finally q.stop()

    val batch = graft.operators.Sessions.sessionize(raw, gapMinutes = gapMin,
        userCol = "event_type")
      .select(col("user_id"),
        (col("start_us") / 1000000L).cast("long"),
        (col("end_us") / 1000000L).cast("long"), col("n_events"))
      .as[(String, Long, Long, Long)].collect().toSet

    assert(streamed == batch,
      s"streaming/batch divergence: only-streaming=${(streamed -- batch).take(5)} " +
        s"only-batch=${(batch -- streamed).take(5)}")
  }

  test("streaming hourly aggregate matches the batch windowed aggregate on real event data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("user_id") < 40)
    val tsCol =
      if (ev.schema("ts").dataType.typeName == "long")
        expr("timestamp_micros(ts DIV 1000)") // micros precision, like the operators
      else col("ts")
    val raw = ev.select(tsCol.as("ts"), col("event_type"),
      col("value").cast("double").as("value"))

    val rows = raw.as[(Timestamp, String, Double)].collect().sortBy(_._1.getTime)
    val splitAt = rows(rows.length / 2)._1.getTime
    val (b1, b2) = rows.partition(_._1.getTime < splitAt)
    // far-future sentinel: watermark passes every real window's end
    val sentinel = (new Timestamp(rows.last._1.getTime + 7200000L), "sentinel", 0.0)

    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val agg = EventStream.hourlyAggregate(
      input.toDF().toDF("ts", "event_type", "value"), lateness = "1 second")
    val q = agg.writeStream
      .format("memory").queryName("hr_eq_out").outputMode("append").start()
    val streamed =
      try {
        input.addData(b1.toSeq); q.processAllAvailable()
        input.addData(b2.toSeq); q.processAllAvailable()
        input.addData(sentinel); q.processAllAvailable()
        spark.table("hr_eq_out")
          .filter(col("event_type") =!= "sentinel")
          .as[(Timestamp, String, Long, Double)].collect().toSet
      } finally q.stop()

    // the batch oracle: identical expression over the same frame —
    // windows split across the micro-batch boundary must have merged
    val batch = raw
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n"), col("total_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"divergence: only-streaming=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }

  test("streaming dedup emits exactly the batch-distinct fingerprint set, each once") {
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // deterministic arrival times; lateness covers the whole span so no
    // fingerprint state is evicted → exactly-once within the window
    val rows = docs.as[(Long, String)].collect()
      .map { case (id, text) => (new Timestamp(1700000000000L + id * 1000L), id, text) }
      .sortBy(_._1.getTime)
    val (b1, b2) = rows.splitAt(rows.length / 2)

    val input = MemoryStream[(Timestamp, Long, String)](spark)
    val out = EventStream.dedupStream(
      input.toDF().toDF("ts", "doc_id", "text"), lateness = "30 days")
    val q = out.writeStream
      .format("memory").queryName("dd_eq_out").outputMode("append").start()
    val streamedFps =
      try {
        input.addData(b1.toSeq); q.processAllAvailable()
        input.addData(b2.toSeq); q.processAllAvailable()
        spark.table("dd_eq_out").select("fp").as[Long].collect()
      } finally q.stop()

    val batchFps = docs
      .select(graft.functions.CrossHash.h60(col("text")).as("fp"))
      .distinct().as[Long].collect().toSet
    assert(streamedFps.length == streamedFps.toSet.size,
      "a fingerprint was emitted more than once")
    assert(streamedFps.toSet == batchFps,
      s"fingerprint set mismatch: streaming ${streamedFps.length} vs batch ${batchFps.size}")
  }

  test("stream-stream interval join matches the batch interval join on real event data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("user_id") < 40)
    val tsCol =
      if (ev.schema("ts").dataType.typeName == "long")
        expr("timestamp_micros(ts DIV 1000)")
      else col("ts")
    val raw = ev.select(col("user_id"), tsCol.as("ts"),
      col("event_id"), col("event_type"))
    val views = raw.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    val clicks = raw.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")

    val vRows = views.as[(Long, Timestamp, Long)].collect().sortBy(_._2.getTime)
    val cRows = clicks.as[(Long, Timestamp, Long)].collect().sortBy(_._2.getTime)
    assert(vRows.nonEmpty && cRows.nonEmpty)
    val maxTs = math.max(vRows.last._2.getTime, cRows.last._2.getTime)
    // sentinel on BOTH sides: each side's watermark must pass every
    // real pair's bound before append mode will emit it
    val sentinelTs = new Timestamp(maxTs + 86400000L)

    val vIn = MemoryStream[(Long, Timestamp, Long)](spark)
    val cIn = MemoryStream[(Long, Timestamp, Long)](spark)
    val joined = EventStream.attributeClicks(
      vIn.toDF().toDF("user_id", "ts", "event_id"),
      cIn.toDF().toDF("user_id", "ts", "event_id"),
      withinMinutes = 30, lateness = "1 second")
    val q = joined.writeStream
      .format("memory").queryName("attr_out").outputMode("append").start()
    val streamed =
      try {
        // two micro-batches per side, split on each side's median —
        // pairs spanning the boundary must come from the join state
        val (v1, v2) = vRows.partition(_._2.getTime < vRows(vRows.length / 2)._2.getTime)
        val (c1, c2) = cRows.partition(_._2.getTime < cRows(cRows.length / 2)._2.getTime)
        vIn.addData(v1.toSeq); cIn.addData(c1.toSeq); q.processAllAvailable()
        vIn.addData(v2.toSeq); cIn.addData(c2.toSeq); q.processAllAvailable()
        vIn.addData((-1L, sentinelTs, -1L)); cIn.addData((-1L, sentinelTs, -1L))
        q.processAllAvailable()
        spark.table("attr_out")
          .filter(col("user_id") =!= -1L)
          .select("user_id", "click_id", "view_id")
          .as[(Long, Long, Long)].collect().toSet
      } finally q.stop()

    val batch = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .join(views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id")),
        expr("c_user = v_user AND v_ts <= c_ts AND v_ts >= c_ts - INTERVAL 30 MINUTES"))
      .select(col("c_user"), col("click_id"), col("view_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture produced no attributable pairs — test is vacuous")
    assert(streamed == batch,
      s"divergence: only-streaming=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)} " +
        s"(${streamed.size} vs ${batch.size})")
  }
  test("ingestTo: streaming micro-batches converge the lake table; late merge touches one directory") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, String, Double, String)](spark)
    val table = java.nio.file.Files.createTempDirectory("graft_lake").toString + "/events"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lake_ckpt").toString
    val stream = input.toDF().toDF("event_id", "event_type", "value", "event_date")
      .select(col("event_id"), col("event_type"), col("value"),
        to_date(col("event_date")).as("event_date"))
    val q = EventStream.ingestTo(stream, table, "event_date", "event_id", ckpt)
    try {
      // batch 1 bootstraps the table with two days
      input.addData(
        (1L, "click", 1.0, "2024-01-01"), (2L, "view", 2.0, "2024-01-01"),
        (3L, "click", 3.0, "2024-01-02"))
      q.processAllAvailable()
      assert(spark.read.parquet(table).count() == 3)

      def listing(): Map[String, Long] = {
        val root = java.nio.file.Paths.get(table)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .map(p => root.relativize(p).toString ->
            java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .toMap
      }
      val afterBootstrap = listing()

      // batch 2: a late CORRECTION to day 1 (key 2 revalued) plus a new
      // day — day-2's directory must stay byte-identical
      input.addData(
        (2L, "view", 20.0, "2024-01-01"), (4L, "view", 4.0, "2024-01-03"))
      q.processAllAvailable()
      val got = spark.read.parquet(table)
        .select("event_id", "event_type", "value").as[(Long, String, Double)]
        .collect().toSet
      assert(got == Set((1L, "click", 1.0), (2L, "view", 20.0),
        (3L, "click", 3.0), (4L, "view", 4.0)))
      val afterMerge = listing()
      val day2Before = afterBootstrap.filter(_._1.contains("=2024-01-02"))
      assert(day2Before.nonEmpty)
      for ((f, m) <- day2Before)
        assert(afterMerge.get(f).contains(m), s"untouched day rewritten: $f")
      assert(afterMerge.keys.exists(_.contains("=2024-01-03")))
    } finally q.stop()
  }

  test("maintenance cadence: ingest → compactAndSwap → continued ingest merges into the NEW generation") {
    // the real lake loop (r12 verdict item 8): a streaming ingest runs,
    // the maintainer compacts-and-swaps between micro-batches, and the
    // next micro-batch merges into the PUBLISHED generation — never the
    // retired one. This exercises the shared maintenance lock
    // end-to-end: ingestTo's mergeInto and compactAndSwap serialize on
    // the same <path>.compacting file, and here they interleave in the
    // exact cadence a single-maintainer deployment runs.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, String, Double, String)](spark)
    val table = java.nio.file.Files.createTempDirectory("graft_lakecad").toString + "/events"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lakecad_ck").toString
    val stream = input.toDF().toDF("event_id", "event_type", "value", "event_date")
      .select(col("event_id"), col("event_type"), col("value"),
        to_date(col("event_date")).as("event_date"))
    val q = EventStream.ingestTo(stream, table, "event_date", "event_id", ckpt)
    try {
      // three micro-batches of ingest across three days
      input.addData(
        (1L, "click", 1.0, "2024-01-01"), (2L, "view", 2.0, "2024-01-01"))
      q.processAllAvailable()
      input.addData((3L, "click", 3.0, "2024-01-02"))
      q.processAllAvailable()
      input.addData((4L, "view", 4.0, "2024-01-03"))
      q.processAllAvailable()
      def contents(path: String): Set[(Long, String, Double)] =
        spark.read.parquet(path)
          .select("event_id", "event_type", "value")
          .as[(Long, String, Double)].collect().toSet
      val preSwap = contents(table)
      assert(preSwap.size == 4)

      // maintainer turn: compact + atomic swap between micro-batches
      val retired = graft.operators.Layout.compactAndSwap(
        spark, table, "event_date")
      assert(contents(table) == preSwap, "swap changed content")

      def listing(path: String): Map[String, Long] = {
        val root = java.nio.file.Paths.get(path)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .map(p => root.relativize(p).toString ->
            java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .toMap
      }
      val newGen = listing(table)
      val retiredGen = listing(retired)

      // ingest continues: a late day-1 correction + a new day — the
      // micro-batch must merge into the PUBLISHED generation
      input.addData(
        (2L, "view", 20.0, "2024-01-01"), (5L, "click", 5.0, "2024-01-04"))
      q.processAllAvailable()
      assert(contents(table) == Set(
        (1L, "click", 1.0), (2L, "view", 20.0), (3L, "click", 3.0),
        (4L, "view", 4.0), (5L, "click", 5.0)),
        "post-swap micro-batch did not converge the published table")
      // untouched days of the NEW generation stay byte-identical
      val afterMerge = listing(table)
      for ((f, m) <- newGen if f.contains("=2024-01-02") || f.contains("=2024-01-03"))
        assert(afterMerge.get(f).contains(m), s"untouched day rewritten: $f")
      // the RETIRED generation received NOTHING — draining readers see
      // exactly the pre-swap table
      assert(listing(retired) == retiredGen, "retired generation disturbed")
      assert(contents(retired) == preSwap)
      // and the shared lock is free for the next maintainer turn
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(table + ".compacting")), "lock leaked")
    } finally q.stop()
  }

  test("lmFilterTo: streaming docs gated by a static LM equal the batch gate, scores bit-identical") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // offline-trained LM: a reference corpus where "a b" dominates head
    // 'a' and "c d" is the only 'c' successor
    val train = Seq(
      (1L, "a b a b a b c d"), (2L, "a b a c"), (3L, "b a b a")
    ).toDF("doc_id", "text")
    val lm = TextAnalysis.lmTable(train).localCheckpoint()
    // stream: doc 10 is pure in-vocabulary text (high ppm), doc 11 is
    // half out-of-vocabulary (penalized at 0 ppm), doc 12 is entirely
    // OOV (score 0), doc 13 has one token (no LM evidence -> absent)
    val docs = Seq(
      (10L, "a b a b"), (11L, "a b x y"), (12L, "q r s"), (13L, "z"))
    val batchScores = TextAnalysis.lmScoreAgainst(docs.toDF("doc_id", "text"), lm)
      .as[(Long, Long, Long)].collect().toSet
    assert(batchScores.map(_._1) == Set(10L, 11L, 12L), batchScores)
    val thr = batchScores.find(_._1 == 12L).get._3 + 1 // cut doc 12 for sure
    val expectKept = batchScores.filter(_._3 >= thr)
    assert(expectKept.map(_._1).contains(10L) && !expectKept.map(_._1).contains(12L),
      s"fixture vacuous: $batchScores thr=$thr")

    val input = MemoryStream[(Long, String)](spark)
    val out = java.nio.file.Files.createTempDirectory("graft_lmgate").toString + "/kept"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lmgate_ck").toString
    val q = EventStream.lmFilterTo(
      input.toDF().toDF("doc_id", "text"), lm, thr, out, ckpt)
    try {
      // split across micro-batches: per-doc decisions must not depend
      // on batch boundaries (the static LM is the only shared state)
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      def kept(): Set[(Long, Long, Long)] = spark.read.parquet(out)
        .select("doc_id", "n_bigrams", "lm_ppm") // drop the batch=N partition col
        .as[(Long, Long, Long)].collect().toSet
      val streamed = kept()
      assert(streamed == expectKept,
        s"stream/batch divergence: stream=$streamed batch=$expectKept")
      // at-least-once replay: re-running a batch with ITS OWN id must
      // leave exactly one copy (the overwrite-per-batch-dir contract —
      // a plain append would double the kept corpus here)
      EventStream.lmGateBatch(docs.take(2).toDF("doc_id", "text"), lm, thr, out, 0L)
      assert(kept() == expectKept, s"replayed batch duplicated rows: ${kept()}")
      assert(spark.read.parquet(out).count() == expectKept.size)
      // restart-with-raised-threshold replay (ADVICE r16): batch 0's
      // survivors all fail the new gate — the replay must DELETE the
      // prior attempt's batch dir, not leave its stale survivors behind
      val batch0Ids = docs.take(2).map(_._1).toSet
      assert(kept().exists(r => batch0Ids(r._1)), "fixture vacuous")
      EventStream.lmGateBatch(
        docs.take(2).toDF("doc_id", "text"), lm, Long.MaxValue, out, 0L)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/batch=0")),
        "stale batch-0 survivors outlived the raised gate")
    } finally q.stop()
  }

  test("bm25IndexTo: maintained-index top-k equals batch bm25TopK bit-for-bit, boundary- and replay-independent") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val terms = Seq("spark", "merge")
    // docs crafted so scores differ: tf, dl and df all vary; doc 5 has
    // no query terms (scores 0), doc 6 is term-dense and short
    val docs = Seq(
      (1L, "spark merge spark window join"),
      (2L, "merge merge merge plan"),
      (3L, "spark plan plan plan plan plan plan"),
      (4L, "window window spark merge"),
      (5L, "nothing relevant here at all"),
      (6L, "spark merge"))
    val batchAnswer = TextAnalysis.bm25TopK(
      docs.toDF("doc_id", "text"), terms, k = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(batchAnswer.size == 4 &&
      batchAnswer.map(_._3).distinct.size > 1, s"fixture vacuous: $batchAnswer")

    val input = MemoryStream[(Long, String)](spark)
    val path = java.nio.file.Files.createTempDirectory("graft_bm25ix").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bm25ix_ck").toString
    val q = EventStream.bm25IndexTo(
      input.toDF().toDF("doc_id", "text"), terms, path, ckpt)
    try {
      // split across micro-batches: df/totlen/n_docs must come out
      // identical to the one-shot batch aggregate
      input.addData(docs.take(3): _*)
      q.processAllAvailable()
      input.addData(docs.drop(3): _*)
      q.processAllAvailable()
      def topk(): Seq[(Long, Long, Long)] =
        EventStream.bm25TopKFromIndex(spark, path, terms.size, k = 4)
          .as[(Long, Long, Long)].collect().toSeq
      assert(topk() == batchAnswer,
        s"maintained index diverged: index=${topk()} batch=$batchAnswer")
      // at-least-once replay: re-running batch 0 must rewrite its own
      // rows and re-derive the SAME stats (state lives in the durable
      // table, so nothing double-counts)
      EventStream.bm25IndexBatch(docs.take(3).toDF("doc_id", "text"), terms, path, 0L)
      assert(topk() == batchAnswer, s"replay changed the answer: ${topk()}")
      assert(spark.read.parquet(s"$path/tf").count() == docs.size)
      // a zero-doc batch writes nothing and leaves the stats untouched
      EventStream.bm25IndexBatch(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), terms, path, 99L)
      assert(topk() == batchAnswer)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/tf/batch=99")))
      // versioned stats publish (VERDICT r16 #3): versions are immutable
      // once complete, the reader resolves the newest COMPLETE one — a
      // partial (footer-less, no _SUCCESS) newer dir is invisible, so a
      // mid-publish reader sees old-or-new, never neither
      def statsDirs(): Set[String] = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(path))
          .iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("stats")).toSet
      }
      assert(statsDirs() == Set("stats-v0", "stats-v1"),
        s"expected current+previous versions, got ${statsDirs()}")
      val partial = java.nio.file.Paths.get(s"$path/stats-v7")
      java.nio.file.Files.createDirectories(partial)
      java.nio.file.Files.write(partial.resolve("part-junk.parquet"),
        Array[Byte](1, 2, 3))
      assert(topk() == batchAnswer,
        "a partial newer stats version must be invisible to readers")
      // the next publish overwrites the partial dir, folds the delta
      // incrementally, keeps the previous version draining, reaps older
      val extra = Seq((7L, "spark spark merge spark"))
      EventStream.bm25IndexBatch(extra.toDF("doc_id", "text"), terms, path, 7L)
      val batchAnswer2 = TextAnalysis.bm25TopK(
        (docs ++ extra).toDF("doc_id", "text"), terms, k = 4)
        .as[(Long, Long, Long)].collect().toSeq
      assert(topk() == batchAnswer2,
        s"incremental stats diverged: index=${topk()} batch=$batchAnswer2")
      assert(statsDirs() == Set("stats-v7", "stats-v1"),
        s"reap should keep current+previous: ${statsDirs()}")
      // a non-empty batch OLDER than the newest version whose own
      // version is gone is a second maintainer / rewound checkpoint —
      // folding its delta again would double-count; loud refusal
      val e = intercept[IllegalArgumentException] {
        EventStream.bm25IndexBatch(extra.toDF("doc_id", "text"), terms, path, 0L)
      }
      assert(e.getMessage.contains("refusing"), e.getMessage)
    } finally q.stop()
  }

  test("bm25MaintainTo: deletion tombstones re-derive stats exactly; replay-safe; re-add refused") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val terms = Seq("spark", "merge")
    val docs = Seq(
      (1L, "spark merge spark window join"),
      (2L, "merge merge merge plan"),
      (3L, "spark plan plan plan plan plan plan"),
      (4L, "window window spark merge"),
      (5L, "nothing relevant here at all"),
      (6L, "spark merge"))
    val input = MemoryStream[(Long, String, Boolean)](spark)
    val path = java.nio.file.Files.createTempDirectory("graft_bm25mt").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bm25mt_ck").toString
    val q = EventStream.bm25MaintainTo(
      input.toDF().toDF("doc_id", "text", "deleted"), terms, path, ckpt)
    try {
      def topk(): Seq[(Long, Long, Long)] =
        EventStream.bm25TopKFromIndex(spark, path, terms.size, k = 4)
          .as[(Long, Long, Long)].collect().toSeq
      def expectOver(ids: Set[Long]): Seq[(Long, Long, Long)] =
        TextAnalysis.bm25TopK(
          docs.filter(d => ids(d._1)).toDF("doc_id", "text"), terms, k = 4)
          .as[(Long, Long, Long)].collect().toSeq
      input.addData(docs.take(4).map(d => (d._1, d._2, false)): _*)
      q.processAllAvailable()
      // batch 1: two adds AND a delete of doc 2 — the deleted doc must
      // vanish from candidates AND stats at the same version flip
      input.addData(Seq((5L, docs(4)._2, false), (6L, docs(5)._2, false),
        (2L, "", true)): _*)
      q.processAllAvailable()
      assert(topk() == expectOver(Set(1L, 3L, 4L, 5L, 6L)),
        s"deletion diverged from the batch recompute: ${topk()}")
      // the published stats row equals a FULL recompute over tf ∖ tombstones
      val fromScratch = TextAnalysis.bm25Stats(TextAnalysis.bm25Tf(
        docs.filter(_._1 != 2L).toDF("doc_id", "text"), terms), terms.size)
        .collect().toSeq
      val vDirs = new java.io.File(path).listFiles()
        .map(_.getName).filter(_.startsWith("stats-v")).sorted
      val published = spark.read.parquet(s"$path/${vDirs.last}").collect().toSeq
      assert(published == fromScratch,
        s"incremental stats drifted: $published vs $fromScratch")
      // at-least-once replay of the mutation batch: same rows, same stats
      EventStream.bm25MaintainBatch(
        Seq((5L, docs(4)._2, false), (6L, docs(5)._2, false), (2L, "", true))
          .toDF("doc_id", "text", "deleted"), terms, path, 1L)
      assert(topk() == expectOver(Set(1L, 3L, 4L, 5L, 6L)),
        "replayed mutation batch changed the answer")
      // delete-only batch
      EventStream.bm25MaintainBatch(
        Seq((6L, "", true)).toDF("doc_id", "text", "deleted"), terms, path, 2L)
      assert(topk() == expectOver(Set(1L, 3L, 4L, 5L)),
        s"delete-only batch diverged: ${topk()}")
      // tombstones are FINAL: re-adding doc 2 is refused loudly
      val e = intercept[IllegalArgumentException] {
        EventStream.bm25MaintainBatch(
          Seq((2L, "spark merge", false)).toDF("doc_id", "text", "deleted"),
          terms, path, 3L)
      }
      assert(e.getMessage.contains("tombstoned"), e.getMessage)
      // within-batch add+delete of the same NEW id nets to zero
      EventStream.bm25MaintainBatch(
        Seq((7L, "spark spark spark", false), (7L, "", true))
          .toDF("doc_id", "text", "deleted"), terms, path, 4L)
      assert(topk() == expectOver(Set(1L, 3L, 4L, 5L)),
        s"within-batch add+delete leaked: ${topk()}")
      // VERSION-CONSISTENT reads (r17 review): complete batch dirs with
      // id ABOVE the newest published stats version are invisible — a
      // maintainer crash between the tombstone/tf writes and the stats
      // publish must leave readers on the previous consistent state
      // (candidates, tombstones and stats flip TOGETHER), never a mix
      Seq(Tuple1(4L)).toDF("doc_id").write
        .parquet(s"$path/tombstones/batch=50")
      Seq((99L, 3L, 0L, 0L)).toDF("doc_id", "dl", "tf_0", "tf_1")
        .write.parquet(s"$path/tf/batch=50")
      assert(topk() == expectOver(Set(1L, 3L, 4L, 5L)),
        s"unpublished batch dirs leaked into the read: ${topk()}")
    } finally q.stop()
  }

  test("bm25Compact folds tf ∖ tombstones into one generation: top-k bit-identical, tombstones retired, ids reusable") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val terms = Seq("spark", "merge")
    val docs = Seq(
      (1L, "spark merge spark window join"),
      (2L, "merge merge merge plan"),
      (3L, "spark plan plan plan plan plan plan"),
      (4L, "window window spark merge"))
    val path = java.nio.file.Files.createTempDirectory("graft_bm25cp").toString
    def topk(): Seq[(Long, Long, Long)] =
      EventStream.bm25TopKFromIndex(spark, path, terms.size, k = 4)
        .as[(Long, Long, Long)].collect().toSeq
    def mut(rows: Seq[(Long, String, Boolean)], id: Long): Unit =
      EventStream.bm25MaintainBatch(
        rows.toDF("doc_id", "text", "deleted"), terms, path, id)
    mut(docs.take(2).map(d => (d._1, d._2, false)), 0L)
    mut(docs.drop(2).map(d => (d._1, d._2, false)) :+ (2L, "", true), 1L)
    val before = topk()
    val stats = spark.read.parquet(s"$path/stats-v1").collect().toSeq
    // fold: the new generation holds exactly tf ∖ tombstones; the
    // published stats and the top-k answer are untouched bit-for-bit
    assert(EventStream.bm25Compact(spark, path) == 1L)
    assert(new java.io.File(s"$path/tfbase-v1/_SUCCESS").exists())
    assert(topk() == before, s"compaction changed the answer: ${topk()}")
    assert(spark.read.parquet(s"$path/tfbase-v1")
      .select("doc_id").distinct().count() == 3) // doc 2 folded out
    // a second fold at the same version is a no-op
    assert(EventStream.bm25Compact(spark, path) == 1L)
    // the next publish RETIRES folded tombstones from the live snapshot
    // (tb ≤ base) — the anti-join set is bounded by deletes since the
    // fold, and the retired id becomes reusable as a fresh document
    mut(Seq((5L, "spark merge", false)), 2L)
    assert(spark.read.parquet(s"$path/tomb-v2").count() == 0,
      "folded tombstone must leave the live snapshot")
    mut(Seq((2L, "merge plan plan", false)), 3L) // retired id, re-ingested
    val recompute = TextAnalysis.bm25TopK(
      (docs.filter(_._1 != 2L) ++ Seq((5L, "spark merge"),
        (2L, "merge plan plan"))).toDF("doc_id", "text"), terms, k = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(topk() == recompute,
      s"post-fold maintenance diverged: ${topk()} vs $recompute")
    // the published stats still equal the full recompute over the live set
    val fromScratch = TextAnalysis.bm25Stats(TextAnalysis.bm25Tf(
      (docs.filter(_._1 != 2L) ++ Seq((5L, "spark merge"),
        (2L, "merge plan plan"))).toDF("doc_id", "text"), terms), terms.size)
      .collect().toSeq
    assert(spark.read.parquet(s"$path/stats-v3").collect().toSeq == fromScratch)
    // the NEXT fold reaps the previous generation's drained inputs:
    // delta/tombstone dirs at or below the old base and older bases
    assert(EventStream.bm25Compact(spark, path) == 3L)
    def batchDirs(root: String): Set[Long] = {
      val d = new java.io.File(s"$path/$root")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.startsWith("batch="))
        .map(_.drop(6).toLong).toSet
    }
    assert(batchDirs("tf") == Set(2L, 3L),
      s"folded delta dirs must be reaped at the next fold: ${batchDirs("tf")}")
    assert(batchDirs("tombstones").isEmpty)
    // the superseded generation DRAINS for one more cycle (readers at
    // versions in [1, 3) still resolve it), then the fold after next
    // reaps it
    assert(new java.io.File(s"$path/tfbase-v1").exists(),
      "the superseded generation must drain one cycle before reaping")
    assert(topk() == recompute)
    mut(Seq((6L, "merge window", false)), 4L)
    assert(EventStream.bm25Compact(spark, path) == 4L)
    assert(!new java.io.File(s"$path/tfbase-v1").exists(),
      "the drained generation must be reaped at the fold after next")
    assert(stats.nonEmpty) // silence unused warning; v1 stats were read pre-fold
  }

  test("self-maintaining index: compactEvery bounds per-batch dirs-read for adds AND deletes (VERDICT r17 #2)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val terms = Seq("spark", "merge")
    val path = java.nio.file.Files.createTempDirectory("graft_bm25ce").toString
    def batchDirs(root: String): Int = {
      val d = new java.io.File(s"$path/$root")
      if (!d.exists()) 0
      else d.listFiles().count(_.getName.startsWith("batch="))
    }
    var live = Map.empty[Long, String]
    // 10 micro-batches of adds + periodic deletes, auto-folding every 2
    // delta dirs: the state any batch READS (base + deltas + one
    // snapshot) stays O(compactEvery) dirs regardless of stream length
    for (b <- 0L until 10L) {
      val id = 10L + b
      val add = (id, s"spark merge doc$b plan", false)
      val del = if (b >= 2 && b % 2 == 0) Seq((10L + b - 2, "", true)) else Seq.empty
      EventStream.bm25MaintainBatch(
        (Seq(add) ++ del).toDF("doc_id", "text", "deleted"),
        terms, path, b, compactEvery = 2)
      live = live + (id -> s"spark merge doc$b plan") -- del.map(_._1)
      // bound the state any batch READS: delta dirs above the current
      // base never exceed compactEvery; total disk dirs stay bounded
      // too (folded dirs drain exactly one cycle before reaping)
      val base = new java.io.File(path).listFiles().map(_.getName)
        .filter(n => n.startsWith("tfbase-v") && n.drop(8).forall(_.isDigit))
        .map(_.drop(8).toLong).maxOption.getOrElse(-1L)
      val above = {
        val d = new java.io.File(s"$path/tf")
        d.listFiles().map(_.getName).filter(_.startsWith("batch="))
          .count(_.drop(6).toLong > base)
      }
      assert(above <= 2,
        s"delta dirs above base $base grew past compactEvery at batch $b: $above")
      assert(batchDirs("tf") <= 4,
        s"disk dirs unbounded at batch $b: ${batchDirs("tf")}")
      val expect = TextAnalysis.bm25TopK(
        live.toSeq.toDF("doc_id", "text"), terms, k = 4)
        .as[(Long, Long, Long)].collect().toSeq
      val got = EventStream.bm25TopKFromIndex(spark, path, terms.size, k = 4)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == expect, s"batch $b diverged: $got vs $expect")
    }
    // the live tombstone snapshot is bounded by deletes since the last
    // fold, not by the 4 deletes of stream history
    val lastTomb = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("tomb-v")).map(_.drop(6).toLong).max
    assert(spark.read.parquet(s"$path/tomb-v$lastTomb").count() <= 2)
  }

  test("published replay leaves complete batch dirs untouched (ADVICE r17: no overwrite under readers)") {
    import spark.implicits._
    val terms = Seq("spark", "merge")
    val path = java.nio.file.Files.createTempDirectory("graft_bm25rp").toString
    EventStream.bm25MaintainBatch(
      Seq((1L, "spark merge", false), (2L, "plan", false))
        .toDF("doc_id", "text", "deleted"), terms, path, 0L)
    EventStream.bm25MaintainBatch(
      Seq((3L, "spark plan", false), (1L, "", true))
        .toDF("doc_id", "text", "deleted"), terms, path, 1L)
    def listing(root: String, id: Long): Seq[(String, Long)] = {
      val d = new java.io.File(s"$path/$root/batch=$id")
      d.listFiles().map(f => f.getName -> f.lastModified()).toSeq.sorted
    }
    val tf0 = listing("tf", 1L)
    val tb0 = listing("tombstones", 1L)
    Thread.sleep(1100) // mtime granularity
    // at-least-once replay of the PUBLISHED batch 1: its dirs are
    // complete and its stats version live, so the rewrite is skipped —
    // a concurrent version-consistent reader never sees _SUCCESS vanish
    EventStream.bm25MaintainBatch(
      Seq((3L, "spark plan", false), (1L, "", true))
        .toDF("doc_id", "text", "deleted"), terms, path, 1L)
    assert(listing("tf", 1L) == tf0,
      s"published replay rewrote tf/batch=1: ${listing("tf", 1L)} vs $tf0")
    assert(listing("tombstones", 1L) == tb0)
  }

  test("delete downdate reads only state ≤ batchId: a rewound checkpoint's orphan tf batch is invisible (ADVICE r17)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val terms = Seq("spark", "merge")
    val path = java.nio.file.Files.createTempDirectory("graft_bm25rw").toString
    EventStream.bm25MaintainBatch(
      Seq((1L, "spark merge", false), (2L, "spark spark plan", false))
        .toDF("doc_id", "text", "deleted"), terms, path, 0L)
    // a crash after batch 5's tf write but before its stats publish,
    // followed by a checkpoint rewind to batch 1: batch 5's complete tf
    // dir holds doc 2's REWRITTEN rows the stats never counted — the
    // bounded read must not subtract them when batch 1 deletes doc 9
    Seq((9L, 3L, 1L, 1L)).toDF("doc_id", "dl", "tf_0", "tf_1")
      .write.parquet(s"$path/tf/batch=5")
    EventStream.bm25MaintainBatch(
      Seq((9L, "", true), (3L, "merge merge", false))
        .toDF("doc_id", "text", "deleted"), terms, path, 1L)
    // doc 9 was never added at any version ≤ 1, so the delete subtracts
    // NOTHING: stats must equal the recompute over docs 1,2,3
    val expect = TextAnalysis.bm25Stats(TextAnalysis.bm25Tf(
      Seq((1L, "spark merge"), (2L, "spark spark plan"), (3L, "merge merge"))
        .toDF("doc_id", "text"), terms), terms.size).collect().toSeq
    assert(spark.read.parquet(s"$path/stats-v1").collect().toSeq == expect,
      "orphan tf batch above the version leaked into the downdate")
  }

  test("reapDrainMs age-gates the version reap (VERDICT r17 #3: slow-reader drain across publishes)") {
    import spark.implicits._
    val terms = Seq("spark", "merge")
    val path = java.nio.file.Files.createTempDirectory("graft_bm25ag").toString
    def versions(): Set[String] = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("stats-v")).toSet
    def mut(id: Long, drain: Long): Unit = EventStream.bm25MaintainBatch(
      Seq((100L + id, "spark merge", false)).toDF("doc_id", "text", "deleted"),
      terms, path, id, reapDrainMs = drain)
    mut(0L, 3600000L); mut(1L, 3600000L); mut(2L, 3600000L)
    // v0 is outside keep={2,1} but its superseder (v1) published
    // milliseconds ago — an hour-long drain window keeps it for the
    // slow reader that resolved v0 before v1 landed
    assert(versions() == Set("stats-v0", "stats-v1", "stats-v2"),
      s"age gate must keep young superseded versions: ${versions()}")
    // with the gate at 0 (the default two-publish contract) the next
    // publish reaps everything below current+previous immediately
    mut(3L, 0L)
    assert(versions() == Set("stats-v2", "stats-v3"), versions().toString)
  }

  test("bm25MaintainBatch refuses to bootstrap over a tf tree with no stats version") {
    import spark.implicits._
    // a pre-versioned-stats index (or a foreign checkpoint whose batch
    // ids restart) must not be silently adopted: a delta-only first
    // version would mis-normalize every later score, and restarting ids
    // would overwrite legacy tf dirs — loud refusal instead
    val terms = Seq("spark", "merge")
    val path = java.nio.file.Files.createTempDirectory("graft_bm25lg").toString
    Seq((1L, 5L, 2L, 1L)).toDF("doc_id", "dl", "tf_0", "tf_1")
      .write.parquet(s"$path/tf/batch=7") // legacy rows, no stats-v*
    val e = intercept[IllegalArgumentException] {
      EventStream.bm25MaintainBatch(
        Seq((2L, "spark merge", false), (9L, "", true))
          .toDF("doc_id", "text", "deleted"),
        terms, path, 0L)
    }
    assert(e.getMessage.contains("no stats version"), e.getMessage)
    // ADVICE r18: the refusal fires BEFORE any write — a refused
    // bootstrap must not leave this batch's tf/tombstone dirs as
    // orphans a foreign maintainer's later batch ids could fold in
    assert(!new java.io.File(s"$path/tf/batch=0").exists(),
      "refused bootstrap left an orphan tf batch dir")
    assert(!new java.io.File(s"$path/tombstones/batch=0").exists(),
      "refused bootstrap left an orphan tombstone batch dir")
  }

  test("auto-compaction into a held maintenance lock defers, never fails the publishing batch (ADVICE r18)") {
    import spark.implicits._
    val terms = Seq("spark", "merge")
    val path = java.nio.file.Files.createTempDirectory("graft_bm25dl").toString + "/idx"
    def bases: Seq[Long] = {
      val d = new java.io.File(path)
      if (!d.exists()) Seq.empty
      else d.listFiles().map(_.getName)
        .filter(n => n.startsWith("tfbase-v") && n.drop(8).forall(_.isDigit))
        .map(_.drop(8).toLong).toSeq
    }
    val lockFile = java.nio.file.Paths.get(path + ".compacting")
    java.nio.file.Files.createDirectories(lockFile.getParent)
    java.nio.file.Files.createFile(lockFile) // external maintainer holds it
    // two publishing batches cross the compactEvery=2 threshold while
    // the lock is held: each publish must SUCCEED (the auto-trigger
    // catches contention and defers), and no fold may land
    for (b <- 0L to 1L)
      EventStream.bm25MaintainBatch(
        Seq((10L + b, s"spark merge doc$b", false)).toDF("doc_id", "text", "deleted"),
        terms, path, b, compactEvery = 2)
    assert(bases.isEmpty, "a fold ran under a held maintenance lock")
    assert(new java.io.File(s"$path/stats-v1/_SUCCESS").exists(),
      "the publishing batch must land despite the held lock")
    // release: the threshold re-fires on the next publishing batch
    java.nio.file.Files.delete(lockFile)
    EventStream.bm25MaintainBatch(
      Seq((12L, "spark plan", false)).toDF("doc_id", "text", "deleted"),
      terms, path, 2L, compactEvery = 2)
    assert(bases.nonEmpty, "deferred fold did not re-trigger after release")
    assert(!java.nio.file.Files.exists(lockFile), "fold leaked the lock")
    // the index stays queryable and exact across the deferral cycle
    val got = EventStream.bm25TopKFromIndex(spark, path, terms.size, k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    val expect = graft.operators.TextAnalysis.bm25TopK(
      Seq((10L, "spark merge doc0"), (11L, "spark merge doc1"),
        (12L, "spark plan")).toDF("doc_id", "text"), terms, k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect, s"$got vs $expect")
  }

  test("ingestTo: a micro-batch firing INTO a held maintenance lock retries and completes once the lock frees") {
    // r14 verdict item 6: the bounded-backoff retry shipped with only a
    // message-prefix guard — this arm exercises REAL contention: the
    // lock is held while the micro-batch runs, released ~1.5 s in, and
    // the batch must land without failing the streaming query.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, String, Double, String)](spark)
    val table = java.nio.file.Files.createTempDirectory("graft_lakelock").toString + "/events"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lakelock_ck").toString
    val stream = input.toDF().toDF("event_id", "event_type", "value", "event_date")
      .select(col("event_id"), col("event_type"), col("value"),
        to_date(col("event_date")).as("event_date"))
    val lockFile = java.nio.file.Paths.get(table + ".compacting")
    java.nio.file.Files.createDirectories(lockFile.getParent)
    java.nio.file.Files.createFile(lockFile) // maintainer "holds" the lock
    val releaser = new Thread(() => {
      Thread.sleep(1500)
      java.nio.file.Files.deleteIfExists(lockFile)
    })
    releaser.setDaemon(true)
    val q = EventStream.ingestTo(stream, table, "event_date", "event_id", ckpt)
    try {
      input.addData((1L, "click", 1.0, "2024-01-01"))
      releaser.start()
      q.processAllAvailable() // blocks through the retries
      assert(q.exception.isEmpty,
        s"contended micro-batch failed the query: ${q.exception}")
      assert(spark.read.parquet(table).count() == 1,
        "retried micro-batch did not land")
      assert(!java.nio.file.Files.exists(lockFile), "lock leaked")
    } finally { q.stop(); releaser.join(5000) }
  }

  test("ingestTo: a lock held past lockWaitMs fails the query LOUDLY naming the maintenance lock") {
    // the other half of the retry contract: a lock still held at the
    // deadline is a crashed maintainer — silence here would mask data
    // loss behind an endlessly-spinning ingest.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, String, Double, String)](spark)
    val table = java.nio.file.Files.createTempDirectory("graft_lakedead").toString + "/events"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lakedead_ck").toString
    val stream = input.toDF().toDF("event_id", "event_type", "value", "event_date")
      .select(col("event_id"), col("event_type"), col("value"),
        to_date(col("event_date")).as("event_date"))
    val lockFile = java.nio.file.Paths.get(table + ".compacting")
    java.nio.file.Files.createDirectories(lockFile.getParent)
    java.nio.file.Files.createFile(lockFile) // never released
    val q = EventStream.ingestTo(stream, table, "event_date", "event_id",
      ckpt, lockWaitMs = 600L)
    try {
      input.addData((1L, "click", 1.0, "2024-01-01"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(t => t.getMessage != null &&
        t.getMessage.startsWith("maintenance lock")),
        s"failure does not name the maintenance lock: ${ex.getMessage}")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(table)),
        "deadline-failed batch wrote anyway")
    } finally {
      q.stop()
      java.nio.file.Files.deleteIfExists(lockFile)
    }
  }

  test("semDeDupTo: streamed keep/drop ≡ batch semDeDupWith over the union, boundary-independent (VERDICT r18 #5)") {
    import spark.implicits._
    import graft.operators.{AnnIndex, Similarity}
    def vecs(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.map { id =>
        val q = (0 until 8).map(i => (((id * 37 + i * 7919) % 11) - 5))
          .map(_.toLong)
        (id, q, q.map(x => x * x).sum)
      }.toDF("vec_id", "q", "nrm")
    // the persisted trained cells come from the r19 ANN index artifact —
    // the model seam the verdict names
    val base = vecs(1L to 30L)
    val idx = java.nio.file.Files.createTempDirectory("graft_sdd_idx")
      .toString + "/idx"
    AnnIndex.build(base, idx, Similarity.ivfTrainCents(base, c = 3),
      m = 4, ksub = 4)
    val cents = AnnIndex.readCents(spark, idx)
    val all = (1L to 30L) ++ (31L to 45L) ++ (46L to 60L)
    def stateOf(table: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(table)
        .select($"vec_id", $"cell", $"dist", $"kept")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    def batchExpect(ids: Seq[Long]): Seq[(Long, Long, Long, Long)] =
      Similarity.semDeDupWith(vecs(ids), cents, thr = 0.2)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    def run(splits: Seq[Seq[Long]]): String = {
      val table = java.nio.file.Files.createTempDirectory("graft_sdd_t")
        .toString + "/state"
      val ckpt = java.nio.file.Files.createTempDirectory("graft_sdd_ck").toString
      val input = MemoryStream[(Long, Seq[Long], Long)](spark)
      val q = EventStream.semDeDupTo(
        input.toDF().toDF("vec_id", "q", "nrm"), idx, table, ckpt, thr = 0.2)
      try {
        var seen = Seq.empty[Long]
        splits.foreach { ids =>
          input.addData(ids.map { id =>
            val r = vecs(Seq(id)).as[(Long, Seq[Long], Long)].head()
            r
          }: _*)
          q.processAllAvailable()
          seen = seen ++ ids
          // streamed state ≡ the batch decision over everything seen —
          // at EVERY trigger, not just the end
          assert(stateOf(table) == batchExpect(seen),
            s"diverged after batch ending at ${ids.last}")
        }
      } finally q.stop()
      table
    }
    val t1 = run(Seq(1L to 30L, 31L to 45L, 46L to 60L).map(_.toSeq))
    // different micro-batch boundaries, same union → same final state
    val t2 = run(Seq((1L to 10L).toSeq, (11L to 52L).toSeq, (53L to 60L).toSeq))
    assert(stateOf(t1) == stateOf(t2), "boundary-dependent state")
    assert(stateOf(t1) == batchExpect(all))
  }

  test("annIndexTo: streamed add/delete maintenance ≡ batch re-encode against the frozen model") {
    import spark.implicits._
    import graft.operators.{AnnIndex, Similarity}
    def vecs(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.map { id =>
        val q = (0 until 8).map(i => (((id * 41 + i * 6007) % 9) - 4))
          .map(_.toLong)
        (id, q, q.map(x => x * x).sum)
      }.toDF("vec_id", "q", "nrm")
    val base = vecs(1L to 25L)
    val idx = java.nio.file.Files.createTempDirectory("graft_annstr")
      .toString + "/idx"
    AnnIndex.build(base, idx, Similarity.ivfTrainCents(base, c = 3),
      m = 4, ksub = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_annstr_ck").toString
    val input = MemoryStream[(Long, Seq[Long], Long, Boolean)](spark)
    val q = EventStream.annIndexTo(
      input.toDF().toDF("vec_id", "q", "nrm", "deleted"), idx, ckpt)
    try {
      def mut(ids: Seq[Long], del: Seq[Long]): Unit = {
        input.addData(
          (ids.map { id =>
            val r = vecs(Seq(id)).as[(Long, Seq[Long], Long)].head()
            (r._1, r._2, r._3, false)
          } ++ del.map(d => (d, Seq.empty[Long], 0L, true))): _*)
        q.processAllAvailable()
      }
      mut(26L to 32L, Seq.empty)
      mut(Seq(33L), Seq(4L, 28L))
      // streamed index state ≡ the batch encode of the live set against
      // the FROZEN model (the AnnIndexSpec contract, through the stream)
      val live = vecs(((1L to 33L).filterNot(Set(4L, 28L))).toSeq)
      val expect = Similarity.pqEncode(Similarity.ivfResiduals(
          live, AnnIndex.readCents(spark, idx)),
          AnnIndex.readBooks(spark, idx), keep = Seq("cell"))
        .select($"vec_id", $"codes", $"cell").as[(Long, Seq[Int], Long)]
        .collect().toSeq.sortBy(_._1)
      val got = AnnIndex.encodedState(spark, idx)
        .select($"vec_id", $"codes", $"cell").as[(Long, Seq[Int], Long)]
        .collect().toSeq.sortBy(_._1)
      assert(got == expect)
      // and the search path serves the maintained state
      val qs = vecs(Seq(300L))
      val fromIdx = AnnIndex.search(spark, idx, qs, nprobe = 2, k = 3)
        .as[(Long, Long, Long)].collect().toSeq
      val probes = Similarity.ivfProbes(qs, AnnIndex.readCents(spark, idx),
        org.apache.spark.sql.functions.lit(true), 2)
      val expectS = Similarity.adcScan(
          Similarity.pqEncode(Similarity.ivfResiduals(
            live, AnnIndex.readCents(spark, idx)),
            AnnIndex.readBooks(spark, idx), keep = Seq("cell")),
          probes, AnnIndex.readBooks(spark, idx), 3)
        .as[(Long, Long, Long)].collect().toSeq
      assert(fromIdx == expectS)
    } finally q.stop()
  }
}

