package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column operators for a training-data pipeline.
  *
  * Media assets are opaque `binary` columns with typed metadata — the
  * Spark-native shape for image/audio/video at 100 TB: the bytes stay
  * in columnar storage, metadata is queryable, and decode/feature work
  * runs batch-wise inside partitions (never on the driver).
  *
  * The container has no media codecs, so the testdata "media" blob is
  * synthesized deterministically (a real magic-number header + the
  * document's UTF-8 payload) and [[Multimodal.extractFeatures]] STUBS
  * the codec behind a deterministic fake decoder — but every Spark-side
  * piece a real pipeline needs is real and tested: the binary schema,
  * the partition-wise batch processing, typed feature output, and
  * oracle-checked byte-level operators (length, content hash,
  * magic-byte sniffing).
  */
object Multimodal {

  /** Magic prefixes (hex): JPEG, PNG, MP3/ID3 — cycled by doc_id. */
  val Magics = Seq("FFD8FF" -> "jpeg", "89504E" -> "png", "494433" -> "mp3")

  /** Typed result of the (stubbed) decode + feature extraction. */
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      brightness: Double)

  /** doc_id + synthesized media blob (magic header + UTF-8 payload). */
  def mediaBlobs(s: SparkSession, dir: String): DataFrame = {
    val magicHex = element_at(
      array(Magics.map(m => lit(m._1)): _*),
      (col("doc_id") % Magics.length).cast("int") + 1)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        concat(unhex(magicHex), encode(col("text"), "UTF-8")).as("blob"))
  }

  /** Partition-wise "decode": sniffs the container from the magic
    * bytes, then derives deterministic fake dimensions and a mean-byte
    * "brightness" from the payload — the stub stands where an image
    * library would run, with identical batch shape and output schema.
    */
  def extractFeatures(blobs: DataFrame): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.select("doc_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val hex = bytes.take(3).map("%02X".format(_)).mkString
        val kind = Magics.toMap.getOrElse(hex, "bin")
        val payload = bytes.drop(3)
        // ??? real codec goes here; deterministic stand-in below
        val width = 16 + (if (payload.isEmpty) 0 else payload(0) & 0x3f)
        val height = 16 + (if (payload.length < 2) 0 else payload(1) & 0x3f)
        val brightness =
          if (payload.isEmpty) 0.0
          else payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
        MediaFeatures(id, kind, bytes.length, width, height, brightness)
      })
  }

  /** Strided-byte "resize" stub: where a real image library would
    * bilinear-resample, this selects every k-th payload byte down to
    * ≤ `targetBytes` — deterministic, so the whole plumbing (per-row
    * batch shape, output schema, downstream hashing) is oracle-checked.
    * Output: (doc_id, out_bytes, resized_md5).
    */
  def resizeStub(blobs: DataFrame, targetBytes: Int = 64): DataFrame =
    blobs.select(col("doc_id"), hex(col("blob")).as("h"))
      .withColumn("n", (length(col("h")) / 2).cast("int"))
      .withColumn("k", greatest(lit(1), (col("n") / targetBytes).cast("int")))
      .select(col("doc_id"),
        size(expr("sequence(1, n, k)")).as("out_bytes"),
        md5(expr("array_join(transform(sequence(1, n, k), i -> substr(h, 2*i-1, 2)), '')"))
          .as("resized_md5"))

  /** Frame sampler stub: treats the payload as contiguous
    * `frameBytes`-byte frames and emits every `every`-th frame's index
    * and content hash — the video-keyframe-sampling shape (one row per
    * sampled frame, exploded in place, never via the driver).
    */
  def frameSample(blobs: DataFrame, frameBytes: Int = 16, every: Int = 4): DataFrame =
    blobs.select(col("doc_id"), hex(col("blob")).as("h"))
      .withColumn("nf", (length(col("h")) / (2 * frameBytes)).cast("int"))
      .filter(col("nf") >= 1)
      .select(col("doc_id"),
        explode(expr(s"sequence(0, nf - 1, $every)")).as("frame_idx"),
        col("h"))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substr(h, ${2 * frameBytes} * frame_idx + 1, ${2 * frameBytes})"))
          .as("frame_md5"))

  def queries: Seq[Q] = Seq(

    // Byte-level operators over the binary column, oracle-checked:
    // hashing and sniffing go through hex so both engines agree on the
    // value space (DuckDB's md5 takes VARCHAR only).
    Q("q61_multimodal_binary", {
      val sniff = Magics.map { case (hex, kind) =>
        s"WHEN hex(blob) LIKE '$hex%' THEN '$kind'"
      }.mkString(" ")
      "WITH m AS (SELECT doc_id, " +
        "unhex(['FFD8FF','89504E','494433'][CAST(doc_id % 3 AS INT) + 1]) || encode(text) AS blob " +
        "FROM documents) " +
        s"SELECT doc_id, octet_length(blob) AS n_bytes, md5(hex(blob)) AS content_md5, " +
        s"CASE $sniff ELSE 'bin' END AS kind FROM m ORDER BY doc_id"
    }) { (s, dir) =>
      val sniff = Magics.foldRight(lit("bin")) { case ((magic, kind), els) =>
        when(hex(col("blob")).startsWith(magic), kind).otherwise(els)
      }
      mediaBlobs(s, dir)
        .select(col("doc_id"),
          length(col("blob")).as("n_bytes"),
          md5(hex(col("blob"))).as("content_md5"),
          sniff.as("kind"))
        .orderBy("doc_id")
    },

    // Decode + feature extraction (stubbed codec). The stand-in decoder is
    // deterministic byte arithmetic, so the oracle mirrors it exactly in
    // SQL (bytes via pairwise hex decode): kind from the cycled magic,
    // width/height from the first two payload bytes (& 0x3f == % 64 on
    // unsigned bytes), brightness = exact integer byte-sum / length.
    // MultimodalSpec additionally pins values in-JVM.
    Q("q64_multimodal_features",
      "WITH m AS (SELECT doc_id, " +
        "['FFD8FF','89504E','494433'][CAST(doc_id % 3 AS INT) + 1] AS mg, " +
        "encode(text) AS p FROM documents) " +
        "SELECT doc_id, " +
        "CASE mg WHEN 'FFD8FF' THEN 'jpeg' WHEN '89504E' THEN 'png' " +
        "WHEN '494433' THEN 'mp3' ELSE 'bin' END AS kind, " +
        "CAST(3 + octet_length(p) AS INT) AS n_bytes, " +
        "CAST(16 + CASE WHEN octet_length(p) = 0 THEN 0 " +
        "ELSE ('0x'||substr(hex(p),1,2))::BIGINT % 64 END AS INT) AS width, " +
        "CAST(16 + CASE WHEN octet_length(p) < 2 THEN 0 " +
        "ELSE ('0x'||substr(hex(p),3,2))::BIGINT % 64 END AS INT) AS height, " +
        "CASE WHEN octet_length(p) = 0 THEN 0.0 " +
        "ELSE list_aggregate([('0x'||substr(hex(p),2*i-1,2))::BIGINT " +
        "FOR i IN generate_series(1, octet_length(p))], 'sum')::DOUBLE / octet_length(p) " +
        "END AS brightness FROM m ORDER BY doc_id") { (s, dir) =>
      extractFeatures(mediaBlobs(s, dir)).toDF().orderBy("doc_id")
    },

    // Strided-byte resize stub: every k-th payload byte, k sized so the
    // output is <= 64 bytes; the selected-byte stream is re-hashed so a
    // one-byte discrepancy anywhere fails the oracle.
    Q("q71_multimodal_resize",
      "WITH m AS (SELECT doc_id, " +
        "unhex(['FFD8FF','89504E','494433'][CAST(doc_id % 3 AS INT) + 1]) || encode(text) AS blob " +
        "FROM documents), " +
        "hx AS (SELECT doc_id, hex(blob) AS h, CAST(octet_length(blob) AS INT) AS n FROM m), " +
        "kk AS (SELECT doc_id, h, n, greatest(1, n // 64) AS k FROM hx) " +
        "SELECT doc_id, len(generate_series(1, n, k)) AS out_bytes, " +
        "md5(array_to_string([substr(h, 2*i-1, 2) FOR i IN generate_series(1, n, k)], '')) AS resized_md5 " +
        "FROM kk ORDER BY doc_id") { (s, dir) =>
      // Sort BEFORE the strided-byte projection: the higher-order-
      // function expression is interpreted (not codegen'd), and a
      // trailing range sort would execute it twice (sample pass +
      // final). Sorting the cheap (doc_id, blob) rows first runs the
      // expensive projection once, after the exchange; narrow ops
      // preserve the range order.
      resizeStub(mediaBlobs(s, dir).orderBy("doc_id"))
    },

    // Frame sampling: 16-byte frames, every 4th frame hashed — one row
    // per sampled frame, exploded inside the scan projection.
    Q("q72_multimodal_frames",
      "WITH m AS (SELECT doc_id, " +
        "unhex(['FFD8FF','89504E','494433'][CAST(doc_id % 3 AS INT) + 1]) || encode(text) AS blob " +
        "FROM documents), " +
        "hx AS (SELECT doc_id, hex(blob) AS h, CAST(octet_length(blob) // 16 AS INT) AS nf FROM m " +
        " WHERE octet_length(blob) >= 16) " +
        "SELECT doc_id, unnest(generate_series(0, nf - 1, 4)) AS frame_idx, " +
        "md5(substr(h, 32 * unnest(generate_series(0, nf - 1, 4)) + 1, 32)) AS frame_md5 " +
        "FROM hx ORDER BY doc_id, frame_idx") { (s, dir) =>
      frameSample(mediaBlobs(s, dir)).orderBy("doc_id", "frame_idx")
    }
  )
}
