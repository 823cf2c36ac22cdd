package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // optional query-name filter (local dev)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // generated-class cache sized to the 167-query application (see
      // Bench.scala — the 100-entry default cycles ~1000 codegen units)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); Spark reads it as Long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Clear stale output from renamed/removed queries so the rows-only
    // fallback in the compare never reports on a dir this run didn't write.
    val outRoot = new java.io.File(outDir)
    if (outRoot.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(outRoot)
    }
    outRoot.mkdirs()
    // Cross-run hygiene (r19, mirrors Bench): wipe persisted ANN index
    // artifacts so every Verify invocation computes from the parquet
    // inputs alone — nothing precomputed crosses invocation boundaries
    // (shared helper since r20, ADVICE r19: loud when the wipe fails).
    graft.operators.AnnIndex.wipePersistedRoot()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // written FIRST so a query crash can't lose the oracle map
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.isEmpty || only(kv._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Surface the failure to the comparator instead of vanishing: a
        // one-row sentinel parquet whose schema can never match an oracle
        // guarantees a RED row for this query rather than a silently
        // shorter correctness artifact (round-7 lesson: six analysis-time
        // failures shrank the artifact 116→110 with every row green).
        try {
          import spark.implicits._
          Seq(s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}")
            .toDF("_graft_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name sentinel write failed: ${e2.getMessage}")
        }
      }
      // Drop intermediates the operators persisted for this query — 54
      // queries' caches would otherwise accumulate across the run.
      graft.operators.GraftCache.releaseAll()
    }
    spark.stop()
  }
}
