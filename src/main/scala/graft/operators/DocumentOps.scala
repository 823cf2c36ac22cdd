package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Driver-gate coverage for the document-store module
  * (graft.sources.document): the `events` table is exported as a
  * JSON-lines collection with a NESTED `props` document, then read back
  * through [[graft.sources.document.DocumentSource]] — schema inferred
  * by sampling (event_id pinned BIGINT via the declared-schema merge,
  * since small integers infer int32), the `event_type` equality pushed
  * down as a `{"event_type": {"$eq": "click"}}` filter document
  * evaluated before rows reach Spark, and the nested doc surfaced as a
  * JSON string column exactly like the reference's Mongo module
  * (`crates/mongodb/src/utils/schema.rs:62-66`).
  *
  * The DuckDB oracle reads the ORIGINAL parquet with its JSON
  * operators, so a hash match proves export → inference → pushdown →
  * typed read is value-exact end to end.
  */
object DocumentOps {

  /** Export `events` (nested `props` document) as a JSONL collection;
    * idempotent per sf-dir — a completed export (the `_SUCCESS` marker
    * of a committed Spark write) is reused, since the source parquet is
    * immutable for a given dir; the document-source file lister already
    * skips `_`-prefixed members.
    */
  private def exportEvents(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val path = "/tmp/graft_docs/" + dir.replaceAll("[^A-Za-z0-9.]", "_") + "/events_jsonl"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
      return path
    Tables.load(s, dir, "events")
      .select(concat(
        lit("{\"event_id\":"), col("event_id"),
        lit(",\"event_type\":\""), col("event_type"),
        lit("\",\"value\":"), col("value").cast("string"),
        lit(",\"props\":"), col("props"),
        lit("}")).as("value"))
      .write.mode("overwrite").text(path)
    path
  }

  def queries: Seq[Q] = Seq(
    Q("q60_doc_scan",
      "SELECT event_id, value, CAST(props->>'k' AS BIGINT) AS k FROM events " +
        "WHERE event_type = 'click' AND CAST(props->>'k' AS BIGINT) >= 50 " +
        "ORDER BY event_id") { (s, dir) =>
      val path = exportEvents(s, dir)
      s.read.format("graft.sources.document.DocumentSource")
        .option("path", path)
        .option("samplesize", "100")
        .option("declared", "event_id BIGINT")
        .load()
        .filter(col("event_type") === "click")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k") >= 50)
        .select("event_id", "value", "k")
        .orderBy("event_id")
    },

    // Nested flatten to depth 1 (reference unnest.rs:21-60): `props.k`
    // infers as a TYPED top-level column — no get_json_object by hand —
    // and the range filter on it pushes down as a dotted-path document
    // filter evaluated against the nested value.
    Q("q68_doc_flatten",
      "SELECT event_id, value, CAST(props->>'k' AS INT) AS pk FROM events " +
        "WHERE CAST(props->>'k' AS INT) >= 50 ORDER BY event_id") { (s, dir) =>
      val path = exportEvents(s, dir)
      s.read.format("graft.sources.document.DocumentSource")
        .option("path", path)
        .option("samplesize", "100")
        .option("declared", "event_id BIGINT")
        .option("flattendepth", "1")
        .load()
        .filter(col("`props.k`") >= 50)
        .select(col("event_id"), col("value"), col("`props.k`").as("pk"))
        .orderBy("event_id")
    }
  )
}
