package graft.functions

import graft.SparkFixture
import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order key and the clustered layout it exists for.
  *
  *   - the magic-number bit spread must equal a bit-by-bit reference
  *     loop (guards the Morton constants),
  *   - SQL surface ≡ Column surface ≡ the oracle's shift-mask SQL,
  *   - rankScale is an order-preserving surjection onto the 16-bit ends,
  *   - and the POINT of it all, measured: on identical rows and file
  *     counts, a z-clustered layout answers a second-dimension point
  *     predicate from a fraction of the files the linear layout needs.
  */
class ZOrderSpec extends AnyFunSuite with SparkFixture {

  /** Bit-by-bit reference: bit i of arg j → position i*n + j. */
  private def refKey(vs: Seq[Long]): Long = {
    val n = vs.length
    var z = 0L
    for (j <- vs.indices; i <- 0 until ZOrder.Bits)
      z |= ((vs(j) >> i) & 1L) << (i * n + j)
    z
  }

  test("key2/key3 match the bit-by-bit reference on random 16-bit inputs") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong() & 0xFFFFL
      val b = rnd.nextLong() & 0xFFFFL
      val c = rnd.nextLong() & 0xFFFFL
      assert(ZOrder.key2(a, b) == refKey(Seq(a, b)), s"key2($a,$b)")
      assert(ZOrder.key3(a, b, c) == refKey(Seq(a, b, c)), s"key3($a,$b,$c)")
    }
    // out-of-range inputs mask to their low 16 bits, never overflow
    assert(ZOrder.key2(0x1FFFFL, 0L) == ZOrder.key2(0xFFFFL, 0L))
    assert(ZOrder.key3(-1L, 0L, 0L) == ZOrder.key3(0xFFFFL, 0L, 0L))
    assert(ZOrder.key2(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    assert(ZOrder.key3(0xFFFFL, 0xFFFFL, 0xFFFFL) == 0xFFFFFFFFFFFFL)
  }

  test("SQL registration, Column builder, and oracle SQL all agree; NULL in, NULL out") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val df = rows.toDF("a", "b")
    df.createOrReplaceTempView("zin")
    val got = spark.sql(
      s"SELECT a, b, graft_zorder(a, b) AS f, ${ZOrder.sql("a", "b")} AS o FROM zin")
      .collect()
    for (r <- got) {
      val expect = ZOrder.key2(r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == expect, "sql function")
      assert(r.getLong(3) == expect, "oracle arithmetic")
    }
    val viaColumn = df.select(ZOrder.zorder(col("a"), col("b")).as("z")).collect()
    for ((r, (a, b)) <- viaColumn.zip(rows)) assert(r.getLong(0) == ZOrder.key2(a, b))

    val nulls = spark.sql(
      "SELECT graft_zorder(CAST(NULL AS INT), 3), graft_zorder(1, 2, CAST(NULL AS INT))")
      .collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))

    intercept[Exception] { spark.sql("SELECT graft_zorder(1)").collect() }
    intercept[Exception] { spark.sql("SELECT graft_zorder(1, 2, 3, 4)").collect() }
  }

  test("rankScale: hits both 16-bit ends, order-preserving, constant span collapses to 0") {
    import spark.implicits._
    val vals = Seq(7L, 12L, 999L, 100000L, 7L, 50000L)
    val df = vals.toDF("v")
    val scaled = df.select(Layout.rankScale(col("v"), 7L, 100000L).as("r"))
      .collect().map(_.getLong(0))
    assert(scaled(0) == 0L && scaled(3) == ZOrder.Mask)
    assert(scaled.forall(r => r >= 0 && r <= ZOrder.Mask))
    // order-preserving: scaled ranks sort exactly as the values do
    val byVal = vals.zip(scaled).sortBy(_._1).map(_._2)
    assert(byVal == byVal.sorted)
    val const = df.select(Layout.rankScale(col("v"), 5L, 5L).as("r"))
      .collect().map(_.getLong(0))
    assert(const.forall(_ == 0L))
  }

  test("measured: z-layout prunes a second-dimension predicate; linear layout cannot") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val files = 16
    val zOut = java.nio.file.Files.createTempDirectory("graft_zlay").toString
    val linOut = java.nio.file.Files.createTempDirectory("graft_linlay").toString
    Layout.clusterWrite(li, Seq("l_partkey", "l_suppkey"), zOut, files)
    Layout.linearWrite(li, "l_partkey", linOut, files)

    // same rows either way — layout must never change content
    assert(spark.read.parquet(zOut).count() == li.count())
    assert(spark.read.parquet(linOut).count() == li.count())

    val zSupp = Layout.zoneMap(spark, zOut, "l_suppkey").cache()
    val linSupp = Layout.zoneMap(spark, linOut, "l_suppkey").cache()
    assert(zSupp.count() == files && linSupp.count() == files)

    // l_suppkey is the SECOND z dimension and nowhere in the linear key:
    // every linear file spans the whole supplier domain, z files don't.
    for (s <- Seq(0L, 3L, 7L, 9L)) {
      val z = Layout.candidateFiles(zSupp, s)
      val lin = Layout.candidateFiles(linSupp, s)
      assert(lin == files, s"linear layout should be unable to prune suppkey=$s")
      assert(z * 2 <= lin, s"suppkey=$s: z candidates $z vs linear $lin")
    }

    // the leading dimension still prunes under z (coarser than a pure
    // sort — that's the documented trade of covering BOTH dimensions)
    val zPart = Layout.zoneMap(spark, zOut, "l_partkey")
    assert(Layout.candidateFiles(zPart, 100L) < files)

    // prunedRead: bit-identical to the full-scan filter while actually
    // reading fewer files (zone ranges are false-positive-only), and an
    // out-of-domain range yields an empty frame with the full schema
    val pruned = Layout.prunedRead(spark, zOut, "l_suppkey", 3L, 5L,
      zm = Some(zSupp))
    val full = spark.read.parquet(zOut)
      .filter(col("l_suppkey").between(3L, 5L))
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.agg(sum(col("l_orderkey")), sum(col("l_partkey"))).head() ==
      full.agg(sum(col("l_orderkey")), sum(col("l_partkey"))).head())
    assert(pruned.inputFiles.length < files,
      s"prunedRead touched ${pruned.inputFiles.length} of $files files")
    val empty = Layout.prunedRead(spark, zOut, "l_suppkey", 1000000L, 2000000L)
    assert(empty.count() == 0 && empty.schema == full.schema)
    intercept[IllegalArgumentException] {
      Layout.prunedRead(spark, zOut, "l_suppkey", 5L, 3L)
    }

    // the RECTANGLE probe: the candidate set is the intersection of the
    // two dimensions' zone maps — no larger than either alone — and the
    // rows equal the plain conjunctive filter exactly
    val rect = Layout.prunedReadRect(spark, zOut,
      Seq(("l_partkey", 100L, 400L), ("l_suppkey", 3L, 5L)))
    val rectFull = spark.read.parquet(zOut)
      .filter(col("l_partkey").between(100L, 400L) &&
        col("l_suppkey").between(3L, 5L))
    assert(rect.count() == rectFull.count() && rectFull.count() > 0)
    assert(rect.agg(sum(col("l_orderkey"))).head() ==
      rectFull.agg(sum(col("l_orderkey"))).head())
    val partOnly = Layout.prunedRead(spark, zOut, "l_partkey", 100L, 400L)
      .inputFiles.length
    val suppOnly = Layout.prunedRead(spark, zOut, "l_suppkey", 3L, 5L)
      .inputFiles.length
    assert(rect.inputFiles.length <= math.min(partOnly, suppOnly),
      s"rect ${rect.inputFiles.length} vs part $partOnly / supp $suppOnly")

    // a PRECOMPUTED zone map (r13: table-lifetime manifest state, the
    // per-read recompute is a choice not a tax) yields the identical
    // result and candidate set
    val zmAll = Layout.zoneMapAll(spark, zOut, Seq("l_partkey", "l_suppkey"))
    val rectPre = Layout.prunedReadRect(spark, zOut,
      Seq(("l_partkey", 100L, 400L), ("l_suppkey", 3L, 5L)), Some(zmAll))
    assert(rectPre.count() == rectFull.count())
    assert(rectPre.agg(sum(col("l_orderkey"))).head() ==
      rectFull.agg(sum(col("l_orderkey"))).head())
    assert(rectPre.inputFiles.sorted.toSeq == rect.inputFiles.sorted.toSeq)
    zSupp.unpersist(); linSupp.unpersist()
  }

  test("centsWrite layout knobs: file count and row-group size are honored, values unchanged") {
    import spark.implicits._
    // the r13 read-floor probe's lesson operationalized: files sizes
    // parallelism, blockBytes sizes row groups — both must actually
    // reach the writer, and neither may perturb the cents values
    val df = (1L to 3000L).map(i => (i, i / 7.0)).toDF("id", "v")
      .select(col("id"), col("v").cast("decimal(18,2)").as("v"))
    val out = java.nio.file.Files.createTempDirectory("graft_centsknob").toString + "/t"
    Layout.centsWrite(df, Seq("v"), out, files = 3, blockBytes = 1L << 20)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 3, s"expected 3 files, got ${files.length}")
    val back = spark.read.parquet(out)
    assert(back.count() == 3000)
    val mismatch = back.join(df, "id")
      .filter(col("v_c") =!=
        (col("v").cast("decimal(18,2)") * lit(100)).cast("long"))
      .count()
    assert(mismatch == 0, s"$mismatch cents values diverged under the knobs")
  }

  test("bloom writes: bitset appears past the dictionary boundary, lookups lossless") {
    import spark.implicits._
    // footer truth via the shared census helper (any-row-group aware)
    def bloomCols(out: String): Set[String] =
      Layout.bloomColumns(spark, new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)

    // BELOW the boundary: sf0.001 lineitem chunks stay fully
    // dictionary-encoded, and parquet correctly DISCARDS the bloom (the
    // dictionary page is already an exact membership filter)
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val small = java.nio.file.Files.createTempDirectory("graft_bloomd").toString
    Layout.clusterWriteWithBloom(li, Seq("l_partkey", "l_suppkey"),
      Seq("l_orderkey"), small, 4, ndv = 8192)
    assert(!bloomCols(small).contains("l_orderkey"),
      "dictionary-encoded chunk unexpectedly carries a bloom")

    // PAST the boundary: ~1M distinct longs per chunk overflow the 1 MB
    // dictionary page — the bitset lands on the bloom column only (the
    // clustered columns' skip level is the zone map, not a bloom)
    val big = spark.range(2000000L).select(
      (col("id") % 1000L).as("a"), (col("id") % 997L).as("b"),
      (col("id") * 2654435761L).as("k"))
    val bOut = java.nio.file.Files.createTempDirectory("graft_bloomw").toString
    val pOut = java.nio.file.Files.createTempDirectory("graft_plainw").toString
    Layout.clusterWriteWithBloom(big, Seq("a", "b"), Seq("k"), bOut, 2,
      ndv = 1000000L)
    Layout.clusterWrite(big, Seq("a", "b"), pOut, 2)
    assert(bloomCols(bOut) == Set("k"),
      s"expected a bloom on k only, got ${bloomCols(bOut)}")
    assert(bloomCols(pOut).isEmpty, "plain layout must carry no bitsets")

    // blooms are skip-only, never lossy: point lookups (present and
    // absent keys) agree with the plain layout exactly
    for (k <- Seq(0L, 2654435761L * 999999L, 17L)) {
      def look(path: String) = spark.read.parquet(path)
        .filter(col("k") === lit(k))
        .agg(count(lit(1)), sum(col("a")), sum(col("b"))).head()
      assert(look(bOut) == look(pOut), s"lookup k=$k diverged")
    }
  }

  test("partitionedWrite prunes to the predicate's directories; compaction preserves content") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(spark, dir, "events")
    val day = to_date(timestamp_micros(graft.Tables.epochMicros(ev)))
    val frame = ev.select(col("event_id"), col("event_type"), col("value"),
      day.as("event_date"))
    val out = java.nio.file.Files.createTempDirectory("graft_bydate").toString
    Layout.partitionedWrite(frame, "event_date", out)

    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    // a 3-day range reads ONLY files under its three date directories —
    // directory-level pruning, no footer consulted for the other 27 days.
    // inputFiles reports the PRE-pruning listing, so the pin reads the
    // executed scan's own numFiles metric instead.
    val pruned = back.filter(col("event_date").between(
      to_date(lit("2024-01-10")), to_date(lit("2024-01-12"))))
    assert(pruned.collect().length > 0)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.partitionFilters.nonEmpty, "date filter not a PartitionFilter")
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead == 3,
      s"pruned scan read $filesRead files of ${back.inputFiles.length}")

    // skip levels COMPOSE: a zone-pruned read of the PARTITIONED table
    // keeps the directory-derived column (basePath) and still reads a
    // file subset — event_id is sequential in time, so date files carry
    // tight event_id ranges the zone map can use
    val (idLo, idHi) = Layout.columnRanges(frame, Seq("event_id"))("event_id")
    val idMid = idLo + (idHi - idLo) / 10
    val zp = Layout.prunedRead(spark, out, "event_id", idLo, idMid)
    assert(zp.columns.contains("event_date"),
      "partition column lost by the pruned read")
    assert(zp.inputFiles.length < back.inputFiles.length)
    assert(zp.count() ==
      back.filter(col("event_id").between(idLo, idMid)).count())
    assert(zp.filter(col("event_date") === to_date(lit("2024-01-01"))).count() > 0)

    // fragment the table (4 files per date), compact, content unchanged
    // and the per-date file count back to the task-ownership minimum
    val frag = java.nio.file.Files.createTempDirectory("graft_frag").toString
    frame.repartition(4, col("event_id"))
      .write.mode("overwrite").partitionBy("event_date").parquet(frag)
    val compacted = java.nio.file.Files.createTempDirectory("graft_compact").toString
    Layout.compactPartitioned(spark, frag, "event_date", compacted)
    val before = spark.read.parquet(frag)
    val after = spark.read.parquet(compacted)
    assert(after.count() == before.count())
    // value sums ride DECIMAL so the compare is layout-order-independent
    assert(after.agg(sum(col("event_id")),
        sum(col("value").cast("decimal(18,2)"))).head() ==
      before.agg(sum(col("event_id")),
        sum(col("value").cast("decimal(18,2)"))).head())
    def perDate(files: Array[String]): Map[String, Int] =
      files.groupBy(_.split("/").find(_.startsWith("event_date=")).getOrElse("?"))
        .map { case (k, v) => k -> v.length }
    assert(perDate(before.inputFiles).values.max >= 4)
    assert(perDate(after.inputFiles).values.max <
      perDate(before.inputFiles).values.max,
      "compaction did not reduce the per-date file count")

    // the production-scale variant: salted writers fan each date across
    // N tasks — still date-bounded file counts, now write-parallel. AQE
    // coalesces the tiny test shuffle back to one task (the right
    // adaptive floor at this size), so pin the mechanism with AQE off.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val salted = java.nio.file.Files.createTempDirectory("graft_salted").toString
      Layout.partitionedWrite(frame, "event_date", salted,
        writersPerPartition = 3, salt = Some(col("event_id")))
      val saltedBack = spark.read.parquet(salted)
      assert(saltedBack.count() == frame.count())
      val saltedPerDate = perDate(saltedBack.inputFiles)
      assert(saltedPerDate.values.max <= 3 && saltedPerDate.values.max > 1,
        s"salted write file spread off: $saltedPerDate")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("mergeInto rewrites only the touched partitions; replace/insert/leave semantics exact") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(spark, dir, "events")
    val day = to_date(timestamp_micros(graft.Tables.epochMicros(ev)))
    val base = ev.select(col("event_id"), col("event_type"), col("value"),
      day.as("event_date"))
    val out = java.nio.file.Files.createTempDirectory("graft_mergetbl").toString
    Layout.partitionedWrite(base, "event_date", out)

    def listing(d: String): Map[String, Long] = {
      val root = java.nio.file.Paths.get(d)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = listing(out)

    val touched = base.filter(col("event_date").between(
      to_date(lit("2024-01-10")), to_date(lit("2024-01-11"))))
    val updates = touched.select(col("event_id"),
        lit("adjusted").as("event_type"),
        (col("value") + lit(100.0)).as("value"), col("event_date"))
      .unionByName(touched.select(
        (col("event_id") + lit(10000000L)).as("event_id"),
        lit("backfill").as("event_type"), col("value"), col("event_date")))
    Layout.mergeInto(spark, out, updates, "event_date", "event_id")
    val after = listing(out)

    // untouched directories: byte-identical listing, same mtimes; the
    // two touched directories: fully replaced
    val untouchedBefore = before
      .filter(f => !f._1.contains("=2024-01-10") && !f._1.contains("=2024-01-11"))
    for ((f, m) <- untouchedBefore)
      assert(after.get(f).contains(m), s"untouched file rewritten: $f")
    assert(before.keys.exists(_.contains("event_date=2024-01-10")))
    for (d <- Seq("event_date=2024-01-10", "event_date=2024-01-11")) {
      val olds = before.keys.filter(_.contains(d)).toSet
      val news = after.keys.filter(_.contains(d)).toSet
      assert(news.nonEmpty && olds.intersect(news).isEmpty,
        s"$d not rewritten by the merge")
    }

    // content: replace-by-key + insert-new + leave-rest == recompute
    val got = spark.read.parquet(out)
    val expect = base.filter(!col("event_date").between(
        to_date(lit("2024-01-10")), to_date(lit("2024-01-11"))))
      .unionByName(updates)
    assert(got.count() == expect.count())
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("event_id")),
        sum(col("value").cast("decimal(18,2)")),
        count(when(col("event_type") === "adjusted", 1)),
        count(when(col("event_type") === "backfill", 1))).head()
    assert(sig(got) == sig(expect))
  }

  test("mergeInto adaptive fallback: identical rows either path, fallback past the share threshold, lock + staging cleaned") {
    // r13 verdict item 5: above MergeRewriteShare the surgical
    // dynamic-overwrite merge yields to an out-of-place staged rewrite
    // + swap. The CONTENT contract must be path-independent.
    import org.apache.spark.sql.DataFrame
    val rows = (1L to 400L).map(k => (k, (k % 4).toInt, s"v$k"))
    val updates = spark.createDataFrame(
      (1L to 300L).filter(_ % 2 == 0).map(k => (k, (k % 4).toInt, "upd"))
        .appended((9001L, 1, "new")))
      .toDF("k", "p", "s")
      // touches p ∈ {0,1,2,3}? evens cover 0,2 and odd-partition evens…
      .filter(col("p").isin(0, 1, 2)) // 3 of 4 partitions → share 0.75 > 0.6
    def freshTable(): String = {
      val out = java.nio.file.Files
        .createTempDirectory("graft_mergeadapt").toString + "/t"
      Layout.partitionedWrite(
        spark.createDataFrame(rows).toDF("k", "p", "s"), "p", out)
      out
    }
    def sig(df: DataFrame) = df
      .agg(count(lit(1)), sum(col("k")),
        sum(xxhash64(col("k"), col("p"), col("s")).cast("decimal(38,0)")))
      .head()
    val surgical = freshTable()
    Layout.mergeInto(spark, surgical, updates, "p", "k", rewriteShare = 2.0)
    val fallback = freshTable()
    val beforeUntouched = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(fallback, "p=3"))
        .iterator().asScala.map(_.getFileName.toString).toSet
    }
    Layout.mergeInto(spark, fallback, updates, "p", "k") // default 0.6 → rewrite path
    // both paths: identical content
    assert(sig(spark.read.parquet(surgical)) == sig(spark.read.parquet(fallback)),
      "adaptive fallback diverged from the surgical merge")
    // the fallback really took the rewrite path: even the untouched p=3
    // directory carries fresh files (the staged generation replaced all)
    val afterUntouched = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(fallback, "p=3"))
        .iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
    }
    assert(afterUntouched.nonEmpty && beforeUntouched.intersect(afterUntouched).isEmpty,
      "fallback did not rewrite — the share trigger never fired")
    // hygiene: lock released, no staging or retired generation left
    val parent = java.nio.file.Paths.get(fallback).getParent
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.list(parent).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.contains(".compacting") || n.contains(".merge-staging") ||
        n.contains(".retired-")).toSeq
    assert(leftovers.isEmpty, s"fallback left $leftovers behind")
  }

  test("mergeInto fallback crash between renames: rerun forward-recovers the FULL corpus, never bootstraps from the batch") {
    // r14 verdict #1: the window where live has been renamed to
    // .retired-* and the complete (_SUCCESS-marked) .merge-staging has
    // not been published. Before the fix, the rerun's bootstrap branch
    // rebuilt the table from ONE batch and the next fallback deleted the
    // staged corpus as a "crash orphan".
    import org.apache.spark.sql.DataFrame
    val rows = (1L to 400L).map(k => (k, (k % 4).toInt, s"v$k"))
    val updates = spark.createDataFrame(
      (1L to 300L).filter(_ % 2 == 0).map(k => (k, (k % 4).toInt, "upd")))
      .toDF("k", "p", "s")
      .filter(col("p").isin(0, 1, 2)) // share 0.75 > 0.6 → fallback path
    def freshTable(): String = {
      val out = java.nio.file.Files
        .createTempDirectory("graft_mergecrash").toString + "/t"
      Layout.partitionedWrite(
        spark.createDataFrame(rows).toDF("k", "p", "s"), "p", out)
      out
    }
    def sig(df: DataFrame) = df
      .agg(count(lit(1)), sum(col("k")),
        sum(xxhash64(col("k"), col("p"), col("s")).cast("decimal(38,0)")))
      .head()
    // expected content: a clean merge on a twin table
    val twin = freshTable()
    Layout.mergeInto(spark, twin, updates, "p", "k")
    val expected = sig(spark.read.parquet(twin))
    // victim: construct the exact between-renames crash state by hand —
    // complete merged staging, live renamed away, lock left behind
    val out = freshTable()
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    val mergedDf = spark.read.parquet(out)
      .join(updates.select(col("k"), col("p")), Seq("k", "p"), "left_anti")
      .unionByName(updates)
    Layout.partitionedWrite(mergedDf, "p", out + ".merge-staging")
    assert(fs.exists(hp(out + ".merge-staging/_SUCCESS")),
      "test setup: staging incomplete")
    assert(fs.rename(hp(out), hp(out + ".retired-m424242")), "test setup rename")
    fs.createNewFile(hp(out + ".compacting")) // the crash held the lock
    // first rerun fails on the stale lock with instructions
    val eLock = intercept[IllegalStateException] {
      Layout.mergeInto(spark, out, updates, "p", "k")
    }
    assert(eLock.getMessage.contains("maintenance lock"))
    // the operator removes the lock per the instructions, then reruns:
    // the rerun MUST publish the staged corpus forward, then merge the
    // (re-submitted) batch — idempotent, so content equals the clean merge
    fs.delete(hp(out + ".compacting"), false)
    Layout.mergeInto(spark, out, updates, "p", "k")
    assert(sig(spark.read.parquet(out)) == expected,
      "forward recovery lost the corpus (bootstrapped from the batch?)")
    // hygiene: staging consumed, crash's retired generation reaped, lock gone
    val parent = java.nio.file.Paths.get(out).getParent
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.list(parent).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.contains(".compacting") || n.contains(".merge-staging") ||
        n.contains(".retired-")).toSeq
    assert(leftovers.isEmpty, s"recovery left $leftovers behind")
    // failure arm: live absent beside a PARTIAL staging (no _SUCCESS) is
    // an unrecoverable external state — loud refusal, never a bootstrap
    val out2 = freshTable()
    fs.mkdirs(hp(out2 + ".merge-staging"))
    assert(fs.rename(hp(out2), hp(out2 + ".retired-7")), "test setup rename")
    val e2 = intercept[IllegalStateException] {
      Layout.mergeInto(spark, out2, updates, "p", "k")
    }
    assert(e2.getMessage.contains("refusing to bootstrap"), e2.getMessage)
    assert(!fs.exists(hp(out2)), "refusal must not have written anything")
    // crash-AFTER-publish arm (r15 verdict #2): live PRESENT beside a
    // stranded .retired-* — the publish succeeded, only the retired
    // delete was lost. The next merge must reap the superseded
    // generation (it previously leaked forever) and produce the same
    // content as a clean merge on the recovered table.
    val out3 = freshTable()
    Layout.mergeInto(spark, out3, updates, "p", "k") // a completed merge...
    val expected3 = sig(spark.read.parquet(out3))
    // ...whose retired delete "crashed": resurrect a stale generation
    Layout.partitionedWrite(
      spark.createDataFrame(rows).toDF("k", "p", "s"), "p",
      out3 + ".retired-m313131")
    val moreUpdates = spark.createDataFrame(
      Seq((2L, 2, "upd2"), (999L, 2, "new"))).toDF("k", "p", "s")
    Layout.mergeInto(spark, out3, moreUpdates, "p", "k")
    assert(!fs.exists(hp(out3 + ".retired-m313131")),
      "superseded retired generation must be reaped when live is present")
    // the reap must not have LOST anything: the full key set survives
    // (400 originals + key 999) and the two touched keys carry the new
    // values — i.e. the merge behaved exactly as on a clean table
    val keys = spark.read.parquet(out3).select("k").distinct().count()
    assert(keys == 401, s"corpus lost rows after reap-merge: $keys keys")
    val upd2 = spark.read.parquet(out3)
      .filter(col("k").isin(2L, 999L) && col("p") === 2).select("s")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(upd2 == Seq("new", "upd2"), s"merge content wrong: $upd2")
    assert(expected3 != null) // the pre-crash merge materialized
    // draining-compact arm (r16 verdict #1): forward recovery must reap
    // ONLY merge-owned .retired-m* — an unmarked .retired-<nanos> beside
    // the crash is a compactAndSwap generation still draining under ITS
    // caller's readers, and deleting it would pull files out from under
    // them. Construct the between-renames crash state WITH such a
    // sibling present; recovery publishes the staging, reaps the m
    // generation, and leaves the draining one byte-intact.
    val out4 = freshTable()
    val merged4 = spark.read.parquet(out4)
      .join(updates.select(col("k"), col("p")), Seq("k", "p"), "left_anti")
      .unionByName(updates)
    Layout.partitionedWrite(merged4, "p", out4 + ".merge-staging")
    assert(fs.rename(hp(out4), hp(out4 + ".retired-m888")), "test setup rename")
    Layout.partitionedWrite(
      spark.createDataFrame(rows.take(40)).toDF("k", "p", "s"), "p",
      out4 + ".retired-616161") // the draining compact generation
    val drainSig = sig(spark.read.parquet(out4 + ".retired-616161"))
    Layout.mergeInto(spark, out4, updates, "p", "k")
    assert(sig(spark.read.parquet(out4)) == expected,
      "forward recovery with a draining sibling lost the corpus")
    assert(!fs.exists(hp(out4 + ".retired-m888")),
      "merge-owned retired generation must be reaped by forward recovery")
    assert(fs.exists(hp(out4 + ".retired-616161")) &&
      sig(spark.read.parquet(out4 + ".retired-616161")) == drainSig,
      "recovery deleted a DRAINING compact generation it does not own")
  }

  test("compactAndSwap publishes atomically: content hash unchanged, files collapsed, retired generation drains") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(spark, dir, "events")
    val day = to_date(timestamp_micros(graft.Tables.epochMicros(ev)))
    val base = ev.select(col("event_id"), col("event_type"), col("value"),
      day.as("event_date"))
    val out = java.nio.file.Files.createTempDirectory("graft_cmpsw").toString + "/t"
    for (r <- 0 until 3)
      base.filter(pmod(col("event_id"), lit(3)) === r)
        .repartition(col("event_date"))
        .write.mode("append").partitionBy("event_date").parquet(out)
    def sig(path: String) = spark.read.parquet(path)
      .agg(count(lit(1)), sum(col("event_id")),
        sum(col("value").cast("decimal(18,2)")),
        sum(xxhash64(col("event_id"), col("event_type"))
          .cast("decimal(38,0)"))).head()
    def listing(path: String): Map[String, Long] = {
      val root = java.nio.file.Paths.get(path)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    }
    val preSig = sig(out)
    val preListing = listing(out)
    val preFiles = spark.read.parquet(out).inputFiles.length
    assert(preFiles > spark.read.parquet(out).select("event_date")
      .distinct().count(), "setup not fragmented")

    val retired = Layout.compactAndSwap(spark, out, "event_date")

    // content identical through the swap (order/partition-independent sig)
    assert(sig(out) == preSig, "compaction changed content")
    // file count collapsed to one per date
    val postFiles = spark.read.parquet(out).inputFiles.length
    val dates = spark.read.parquet(out).select("event_date").distinct().count()
    assert(postFiles == dates, s"expected $dates files, got $postFiles")
    // the retired generation is BYTE-IDENTICAL to the pre-swap table
    // (same relative files, same mtimes): an in-flight reader that
    // planned against the old generation drains from it untouched
    assert(listing(retired) == preListing, "retired generation disturbed")
    assert(sig(retired) == preSig)

    // crash recovery: simulate death BETWEEN the two renames (live
    // absent, staging complete) — the next call must publish the staged
    // generation forward, never fail or rebuild from nothing
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    assert(fs.rename(hp(out), hp(out + ".staging")), "test setup rename")
    Layout.compactAndSwap(spark, out, "event_date")
    assert(sig(out) == preSig, "crash recovery lost content")
  }

  test("centsWrite: exact round-trip incl. negatives and NULLs; overflow fails loudly") {
    import spark.implicits._
    // values chosen to hit the rounding and sign edges: the per-value
    // contract is round2(v) × 100 carried exactly as int64
    val vals: Seq[java.lang.Double] = Seq(0.0, 0.01, -0.01, 1.005, -1.005,
      123.456, -999999.99, 2.675, null, 1e9 + 0.005)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v").cast("decimal(18,2)").as("v"))
    val out = java.nio.file.Files.createTempDirectory("graft_centsrt").toString + "/t"
    Layout.centsWrite(df, Seq("v"), out)
    val back = spark.read.parquet(out)
    assert(back.schema("v_c").dataType.typeName == "long")
    // read-back cents must equal the declared DECIMAL(18,2) value × 100
    // for every row, with NULL staying NULL
    val joined = back.join(df, "id")
      .select(col("id"), col("v_c"),
        (col("v").cast("decimal(18,2)") * lit(100)).cast("long").as("expect"))
      .collect()
    assert(joined.length == vals.length)
    joined.foreach { r =>
      val (got, exp) = (r.isNullAt(1), r.isNullAt(2)) match {
        case (true, true) => (0L, 0L)
        case (false, false) => (r.getLong(1), r.getLong(2))
        case other => fail(s"null mismatch on id ${r.getLong(0)}: $other")
      }
      assert(got == exp, s"id ${r.getLong(0)}: $got != $exp")
    }
    // a value whose cents exceed int64 must FAIL the write (ANSI cast),
    // never wrap silently into a wrong layout
    val huge = Seq((1L, BigDecimal("99999999999999999.99")))
      .toDF("id", "v").select(col("id"), col("v").cast("decimal(38,2)").as("v"))
    val hugeOut = java.nio.file.Files.createTempDirectory("graft_centsov").toString + "/t"
    val e = intercept[Exception] { Layout.centsWrite(huge, Seq("v"), hugeOut) }
    assert(e.toString.toLowerCase.contains("overflow") ||
      Option(e.getCause).exists(_.toString.toLowerCase.contains("overflow")) ||
      e.toString.contains("CAST_OVERFLOW") || e.toString.contains("ArithmeticException"),
      s"expected a loud overflow, got: $e")
  }

  test("compactAndSwap reclaims an orphaned staging generation from a crashed write") {
    import spark.implicits._
    val base = Seq((1L, 1, "a"), (2L, 1, "b"), (3L, 2, "c")).toDF("k", "p", "v")
    val out = java.nio.file.Files.createTempDirectory("graft_cmporph").toString + "/t"
    Layout.partitionedWrite(base, "p", out)
    // simulate a crash MID-WRITE of a previous compaction: a stale,
    // half-written staging dir beside a healthy live table
    val stale = java.nio.file.Paths.get(out + ".staging")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.write(stale.resolve("garbage.parquet"), Array[Byte](1, 2, 3))
    Layout.compactAndSwap(spark, out, "p")
    val got = spark.read.parquet(out).select("k", "p", "v")
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set((1L, 1, "a"), (2L, 1, "b"), (3L, 2, "c")),
      s"orphan reclaim corrupted the table: $got")

    // a live-absent PARTIAL staging (no _SUCCESS) must fail loudly, not
    // publish garbage forward as the table
    val out2 = java.nio.file.Files.createTempDirectory("graft_cmppart").toString + "/t"
    val stale2 = java.nio.file.Paths.get(out2 + ".staging")
    java.nio.file.Files.createDirectories(stale2)
    java.nio.file.Files.write(stale2.resolve("garbage.parquet"), Array[Byte](1))
    val e = intercept[IllegalStateException] {
      Layout.compactAndSwap(spark, out2, "p")
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)

    // the single-maintainer lock: a held lock rejects a second caller
    // with instructions, and a completed call releases it
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out + ".compacting")),
      "lock not released after success")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(out + ".compacting"))
    val e2 = intercept[IllegalStateException] {
      Layout.compactAndSwap(spark, out, "p")
    }
    assert(e2.getMessage.contains("another maintainer"), e2.getMessage)
    java.nio.file.Files.delete(java.nio.file.Paths.get(out + ".compacting"))
  }

  test("mergeInto shares the maintenance lock: a merge during a swap fails loudly, a clean merge releases") {
    import spark.implicits._
    val base = Seq((1L, 1, "a"), (2L, 2, "b")).toDF("k", "p", "v")
    val out = java.nio.file.Files.createTempDirectory("graft_mergelock").toString + "/t"
    Layout.partitionedWrite(base, "p", out)
    // a compaction (or crashed maintainer) holds the lock: the merge
    // must NOT write into a generation that may be renamed mid-publish —
    // it fails with the shared single-maintainer instructions instead
    val lock = java.nio.file.Paths.get(out + ".compacting")
    java.nio.file.Files.createFile(lock)
    val updates = Seq((1L, 1, "A")).toDF("k", "p", "v")
    val e = intercept[IllegalStateException] {
      Layout.mergeInto(spark, out, updates, "p", "k")
    }
    assert(e.getMessage.contains("another maintainer"), e.getMessage)
    // the blocked merge changed nothing
    assert(spark.read.parquet(out).select("k", "p", "v")
      .as[(Long, Int, String)].collect().toSet ==
      Set((1L, 1, "a"), (2L, 2, "b")), "blocked merge mutated the table")
    java.nio.file.Files.delete(lock)
    // with the lock free the same merge applies and RELEASES the lock
    Layout.mergeInto(spark, out, updates, "p", "k")
    assert(spark.read.parquet(out).select("k", "p", "v")
      .as[(Long, Int, String)].collect().toSet ==
      Set((1L, 1, "A"), (2L, 2, "b")))
    assert(!java.nio.file.Files.exists(lock), "merge did not release the lock")
    // bootstrap path (first merge creates the table) locks/releases too
    val out2 = java.nio.file.Files.createTempDirectory("graft_mergeboot").toString + "/t"
    Layout.mergeInto(spark, out2, updates, "p", "k")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out2 + ".compacting")))
  }

  test("mergeInto scopes replacement per partition when a key repeats across touched partitions") {
    // key identifies a row WITHIN its partition (the documented
    // contract): key 1 lives in partitions p=1 AND p=2, both partitions
    // are touched by the merge, but only p=1's key-1 row is updated —
    // p=2's same-key row must survive (a key-only anti-join used to
    // delete it and never re-insert it: silent data loss)
    import spark.implicits._
    val base = Seq((1L, 1, "a"), (2L, 1, "b"), (1L, 2, "c"), (2L, 2, "d"),
      (1L, 3, "e")).toDF("k", "p", "v")
    val out = java.nio.file.Files.createTempDirectory("graft_mergekey").toString
    Layout.partitionedWrite(base, "p", out)
    // touches p=1 (replace k=1) and p=2 (insert k=9); p=2's k=1 is NOT
    // in the update set and must be left alone even though p=2 rewrites
    val updates = Seq((1L, 1, "A"), (9L, 2, "x")).toDF("k", "p", "v")
    Layout.mergeInto(spark, out, updates, "p", "k")
    val got = spark.read.parquet(out).select("k", "p", "v")
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set((1L, 1, "A"), (2L, 1, "b"), (1L, 2, "c"),
      (2L, 2, "d"), (9L, 2, "x"), (1L, 3, "e")),
      s"cross-partition key collision mishandled: $got")
  }
}
