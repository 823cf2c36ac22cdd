package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible source of BASELINE.md's N× scale-up measurements: build
  * a key-shifted N× union of a testdata table in memory and time an
  * operator chain cold over it, so wall-vs-rows curves are regenerable
  * (the BASELINE entries cite runs of this probe, not hand runs).
  *
  * Usage: `sbt "runMain graft.ScaleProbe <sfDir> <factor> <op>"`
  * where op ∈ {neardup (q116 chain), lsh (q42 chain), dedup (q40)}.
  * Emits one JSON line: {"op":…,"factor":N,"rows":R,"sec":S}.
  */
object ScaleProbe {

  /** N copies of `documents` with doc_ids shifted per copy and EVERY
    * token suffixed with the copy index — copies share zero shingles,
    * so they are NOT near-dups of each other: the dedup structure per
    * copy matches the base corpus, giving N× the work, not an N²
    * cross-copy candidate blowup (a trailing-salt variant of this probe
    * measured exactly that blowup — one changed shingle keeps ~0.95
    * Jaccard and every copy pair collides in LSH).
    */
  def scaledDocuments(spark: SparkSession, dir: String, factor: Int): DataFrame = {
    val base = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val shift = 1L << 32
    (0 until factor).map { i =>
      base.select((col("doc_id") + lit(i * shift)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1c$i").as("text"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, factor, op) =
      (args(0), args(1).toInt, if (args.length > 2) args(2) else "neardup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4"))
      .config("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = scaledDocuments(spark, sfDir, factor)
    def run(): Long = {
      val df = op match {
        case "neardup" => operators.Dedup.verifiedNearDups(docs)
        case "lsh" => operators.Dedup.minhashLshPairs(docs)
        case "dedup" => docs.groupBy("text").agg(min("doc_id").as("doc_id"))
        case other => throw new IllegalArgumentException(s"unknown op $other")
      }
      val n = df.count()
      operators.GraftCache.releaseAll()
      spark.catalog.clearCache()
      n
    }
    run() // untimed warm-up (JIT + codegen + page cache)
    operators.GraftCache.releaseAll(); spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val rows = run()
    val sec = (System.nanoTime() - t0) / 1e9
    // scalastyle:off println
    println(f"""{"op":"$op","factor":$factor,"rows":$rows,"sec":$sec%.3f}""")
    // scalastyle:on println
    spark.stop()
  }
}
