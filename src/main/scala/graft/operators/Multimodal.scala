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

  /** Hamming threshold for the q167 perceptual near-dup gate, probed
    * on the testdata corpus: identical payloads behind DIFFERENT
    * container magics land at hamming ≤ 2 (only the first chunk's mean
    * moves), while the corpus's closest DISTINCT texts sit at ≥ 8
    * (sf0.01; 12 at sf0.001) — 6 separates the two populations with
    * margin on both sides.
    */
  val DhashMaxHamming = 6

  /** (doc_id, simhash) — 60-bit dHash perceptual fingerprints of a
    * binary column ([[graft.functions.DHash]]; the output column is
    * named for [[graft.operators.Dedup.sigPairs]]' signature contract).
    */
  def dhashOf(blobs: DataFrame, idCol: String = "doc_id",
      blobCol: String = "blob"): DataFrame =
    blobs.select(col(idCol).as("doc_id"),
      graft.functions.DHash.dhash60(col(blobCol)).as("simhash"))

  /** Perceptual near-dup pairs over a binary column: dHash fingerprints
    * fed through EXACTLY the SimHash pairing machinery
    * ([[graft.operators.Dedup.sigPairs]] — pre-collapsed banded
    * pigeonhole join, weighted bucket caps, exact Hamming confirm), so
    * the multimodal family's near-dup story is the text family's, not a
    * parallel implementation. Output (d1, d2, hamm).
    */
  def dhashPairs(blobs: DataFrame, idCol: String = "doc_id",
      blobCol: String = "blob",
      maxHamming: Int = DhashMaxHamming): DataFrame =
    graft.operators.Dedup.sigPairs(dhashOf(blobs, idCol, blobCol), maxHamming)

  def queries: Seq[Q] = Seq(

    // Perceptual near-dup (q167, VERDICT r18 #8): dHash fingerprints —
    // pure integer chunk-mean + gradient bits, no codec — banded
    // through the q44 pairing machinery. The gate corpus is every
    // document in TWO container variants (jpeg and png magic, same
    // payload): a perceptual hash must pair them (byte-level md5
    // equality never can — the header-invariance the operator exists
    // for), and at the probed threshold it pairs ALL of them with zero
    // accidental pairs (variant hamming ≤ 2 vs ≥ 8 for the corpus's
    // closest distinct texts). The oracle replays the whole chain from
    // hex(blob) in exact integers.
    Q("q167_dhash_neardup", {
      val rc = graft.functions.DHash.Rows * graft.functions.DHash.Cols // 66
      "WITH m AS (SELECT 2*doc_id + v AS doc_id, " +
        "unhex(CASE v WHEN 0 THEN 'FFD8FF' ELSE '89504E' END) || encode(text) AS blob " +
        "FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS v)), " +
        "hx AS (SELECT doc_id, hex(blob) AS h, octet_length(blob) AS n FROM m), " +
        s"cg AS (SELECT doc_id, i, (i*n)//$rc AS lo, " +
        s"LEAST(GREATEST(((i+1)*n)//$rc, (i*n)//$rc + 1), n) AS hi, h " +
        s"FROM hx CROSS JOIN (SELECT unnest(generate_series(0, ${rc - 1})) AS i)), " +
        "cells AS (SELECT doc_id, i, " +
        "list_sum([('0x'||substr(h, 2*j+1, 2))::BIGINT " +
        "FOR j IN generate_series(lo, hi-1)]) // (hi - lo) AS cell FROM cg), " +
        "cl AS MATERIALIZED (SELECT doc_id, list(cell ORDER BY i) AS cs " +
        "FROM cells GROUP BY doc_id), " +
        "dh AS MATERIALIZED (SELECT doc_id, CAST(SUM(" +
        "CASE WHEN cs[(k//10)*11 + (k%10) + 2] > cs[(k//10)*11 + (k%10) + 1] " +
        "THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS simhash " +
        "FROM cl CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS k) " +
        "GROUP BY doc_id), " +
        "ch AS (SELECT doc_id, simhash, k, (simhash >> (15 * k)) & 32767 AS cv " +
        "FROM dh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)), " +
        s"chf AS ${Dedup.capBucketsSql("ch", Dedup.BucketCap, "doc_id, simhash, k, cv", "k", "cv")}, " +
        "cand AS (SELECT DISTINCT x.doc_id AS d1, x.simhash AS h1, " +
        "y.doc_id AS d2, y.simhash AS h2 " +
        "FROM chf x JOIN chf y ON x.k = y.k AND x.cv = y.cv AND x.doc_id < y.doc_id) " +
        "SELECT d1, d2, bit_count(xor(h1, h2))::BIGINT AS hamm FROM cand " +
        s"WHERE bit_count(xor(h1, h2)) <= $DhashMaxHamming ORDER BY d1, d2"
    }) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val variants = d.select(explode(array(
          struct((col("doc_id") * 2).as("doc_id"), lit("FFD8FF").as("mg")),
          struct((col("doc_id") * 2 + 1).as("doc_id"), lit("89504E").as("mg"))))
          .as("e"), col("text"))
        .select(col("e.doc_id").as("doc_id"),
          concat(unhex(col("e.mg")), encode(col("text"), "UTF-8")).as("blob"))
      dhashPairs(variants).orderBy("d1", "d2")
    },

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
