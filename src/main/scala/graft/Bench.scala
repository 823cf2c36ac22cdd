package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds.
  *
  * Materialization is a full write to the no-op DSv2 sink — every column
  * is produced and every operator (including final sorts) executes, unlike
  * a `count()` which lets Catalyst prune columns and drop ordering.
  * Failures are loud: the error lands on stderr, the query is listed in
  * `"failed"`, and the exit code is non-zero when anything failed.
  *
  * Stall-proofing: this host exhibits intermittent multi-minute stalls
  * unrelated to the plans (BASELINE.md records 410.8 s vs 56.3 s
  * back-to-back on identical code), so each query is timed
  * SPARK_GRAFT_REPS times (default 3) and the REPORTED number is the
  * per-query MEDIAN; min/max land in `"queries_min"`/`"queries_max"` so
  * a stall is visible but never pollutes the headline metric.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // Split parquet inputs so scan/sort stages use every core even at
    // bench scale (sf0.1 lineitem is one 10.8 MB file — the default
    // 128 MB split would serialize every lineitem stage onto one task).
    // At cluster scale files exceed the split size and this is inert.
    val maxPart = sys.env.getOrElse("SPARK_GRAFT_MAXPART", (1 << 20).toString)
    // Comma-separated substrings: run only matching queries (iteration aid).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    def selected = {
      val all = SparkEntry.queries.toSeq.sortBy(_._1)
      only.fold(all)(pats => all.filter { case (n, _) => pats.exists(n.contains) })
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
      .config("spark.sql.files.openCostInBytes", "65536")
      // Single-JVM harness: shuffle blocks live in the page cache, so
      // compressing them is pure CPU overhead, and locality waits are
      // meaningless. Both belong ON for a real multi-node deployment.
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up pass: JIT, codegen caches, parquet footers and the
    // page cache all reach steady state before anything is measured —
    // the numbers then reflect the engine, not first-touch effects
    // (this host also shows intermittent first-materialization stalls
    // that would otherwise land inside one arbitrary timed query).
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // the timed pass reports failures
      // Drop this query's persisted intermediates: 53 queries × persist()
      // would otherwise accumulate in storage memory and the tail of the
      // run measures eviction thrash instead of the plans (observed as
      // 30 s medians on queries that run in 0.7 s standalone).
      spark.sharedState.cacheManager.clearCache()
    }
    var failed = List.empty[String]
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          if (!failed.contains(name)) {
            failed ::= name
            System.err.println(s"[bench] $name FAILED: $e")
            e.printStackTrace()
          }
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      spark.sharedState.cacheManager.clearCache()
      (name, times(times.length / 2), times.head, times.last)
    }
    def obj(f: ((String, Double, Double, Double)) => Double): String =
      results.map(r => s"\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val fails = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
      s""""queries":${obj(_._2)},"queries_min":${obj(_._3)},"queries_max":${obj(_._4)},""" +
      s""""failed":$fails,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
