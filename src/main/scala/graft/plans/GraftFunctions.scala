package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Conv, Expression, ExpressionInfo, GetJsonObject, Literal, Md5, Substring}
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BpeCount, CharRunCount, EditDistance, FreqSketchAgg, GramAgg, KmvSketchAgg, QDot, RankHistAgg, RollingHash, SignBands, TokenCount, TokenHits, ZOrder2, ZOrder3}

/** SQL registrations for the engine's function surface: the same
  * Catalyst expressions the DataFrame operators use, callable from pure
  * `spark.sql(...)` — the analog of the reference exposing its engine
  * to SQL-only users (its Python/`datafusion-cli` bindings run SQL
  * text, never a DataFrame API; reference `python/python/tests/
  * test_duckdb.py:14-59`). Registered by [[GraftExtensions]], so any
  * session configured with the extension gets them.
  *
  * All functions keep the cross-engine determinism contract: integer
  * outputs, codegen-friendly (native `doGenCode` expressions, never
  * Scala UDFs), aggregates map-side combinable.
  */
object GraftFunctions {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name)

  /** A literal-int argument (sketch sizes and band shapes parameterize
    * the EXPRESSION, so they must fold at analysis time).
    */
  private def intArg(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $e")
  }

  /** The md5-derived 60-bit cross-engine hash ([[graft.functions.CrossHash]])
    * as a composed expression tree — identical to the Column form, so
    * SQL and DataFrame callers hash identically.
    */
  private def h60(e: Expression): Expression =
    Cast(Conv(Substring(Md5(Cast(e, org.apache.spark.sql.types.BinaryType)),
      Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)

  def register(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_h60"),
      info(classOf[Md5], "graft_h60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_h60(str)")
        h60(args.head)
      }))

    // string scans take Cast(_, String) like their Column builders do —
    // a raw non-string arg would fail at EXECUTION time (codegen/CCE)
    // instead of analysis
    e.injectFunction((FunctionIdentifier("graft_rolling_hash"),
      info(classOf[RollingHash], "graft_rolling_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_rolling_hash(str)")
        RollingHash(Cast(args.head, org.apache.spark.sql.types.StringType))
      }))

    e.injectFunction((FunctionIdentifier("graft_bpe_count"),
      info(classOf[BpeCount], "graft_bpe_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_bpe_count(str)")
        BpeCount(Cast(args.head, org.apache.spark.sql.types.StringType))
      }))

    e.injectFunction((FunctionIdentifier("graft_char_run_count"),
      info(classOf[CharRunCount], "graft_char_run_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_char_run_count(str, asciiClass)")
        val cls = args(1) match {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"graft_char_run_count: class must be a string literal, got $other")
        }
        CharRunCount(Cast(args.head, org.apache.spark.sql.types.StringType), cls)
      }))

    e.injectFunction((FunctionIdentifier("graft_token_count"),
      info(classOf[TokenCount], "graft_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_token_count(str)")
        TokenCount(Cast(args.head, org.apache.spark.sql.types.StringType))
      }))

    e.injectFunction((FunctionIdentifier("graft_token_hits"),
      info(classOf[TokenHits], "graft_token_hits"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "graft_token_hits(str, word, ...)")
        val words = args.tail.map {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"graft_token_hits: words must be string literals, got $other")
        }
        TokenHits(Cast(args.head, org.apache.spark.sql.types.StringType), words)
      }))

    e.injectFunction((FunctionIdentifier("graft_qdot"),
      info(classOf[QDot], "graft_qdot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_qdot(arr, arr)")
        QDot(args.head, args(1))
      }))

    e.injectFunction((FunctionIdentifier("graft_sign_bands"),
      info(classOf[SignBands], "graft_sign_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_sign_bands(arr, numBands, bandBits)")
        SignBands(args.head,
          intArg(args(1), "graft_sign_bands", "numBands"),
          intArg(args(2), "graft_sign_bands", "bandBits"))
      }))

    e.injectFunction((FunctionIdentifier("graft_edit_distance"),
      info(classOf[EditDistance], "graft_edit_distance"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_edit_distance(str, str)")
        EditDistance(args.head, args(1))
      }))

    // aggregates: the analyzer wraps a bare AggregateFunction into
    // AggregateExpression(Complete) exactly as for built-ins
    e.injectFunction((FunctionIdentifier("graft_kmv_kth_min"),
      info(classOf[KmvSketchAgg], "graft_kmv_kth_min"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_kmv_kth_min(col, k)")
        KmvSketchAgg(args.head, intArg(args(1), "graft_kmv_kth_min", "k"))
      }))

    e.injectFunction((FunctionIdentifier("graft_freq_sketch"),
      info(classOf[FreqSketchAgg], "graft_freq_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_freq_sketch(col, capacity)")
        FreqSketchAgg(args.head, intArg(args(1), "graft_freq_sketch", "capacity"))
      }))

    e.injectFunction((FunctionIdentifier("graft_rank_hist"),
      info(classOf[RankHistAgg], "graft_rank_hist"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_rank_hist(col, capacity)")
        RankHistAgg(args.head, intArg(args(1), "graft_rank_hist", "capacity"))
      }))

    e.injectFunction((FunctionIdentifier("graft_gram"),
      info(classOf[GramAgg], "graft_gram"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_gram(integral_array)")
        GramAgg(args.head)
      }))

    // Runtime-filter surface for star joins: a Bloom filter built from
    // the REDUCED dim-side keys, applied to the fact scan BEFORE its
    // shuffle — the manual form of Spark's InjectRuntimeFilter for
    // plans whose creation side exceeds the auto-injection size
    // heuristic (a dim-reduced orders set at 100× is ~15× over the
    // 10 MB creationSideThreshold yet still a perfect bloom source).
    // Composes Spark's native BloomFilterAggregate/BloomFilterMightContain
    // over XxHash64, so the pair is exactly the built-in runtime filter's
    // wire format. Usage (q137's exact pattern):
    // `graft_might_contain((SELECT graft_bloom_agg(k, n) FROM build),
    // probe_k)` — pass the RAW probe key: graft_might_contain hashes it
    // with XxHash64 itself, so pre-hashing the probe side would
    // double-hash and silently drop matching rows. The bloom arg must be
    // a scalar subquery or literal (Spark's own check).
    e.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
        "graft_bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_bloom_agg(col, expectedItems)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args.head)),
          intArg(args(1), "graft_bloom_agg", "expectedItems").toLong)
      }))

    e.injectFunction((FunctionIdentifier("graft_might_contain"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
        "graft_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_might_contain(bloom, col)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args.head,
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(1))))
      }))

    // Z-order interleaved key (graft.operators.Layout's clustering
    // primitive): 2 or 3 integral args, each masked to 16 bits, bit i
    // of arg j at position i*n+j. Args cast to LONG like the Column
    // builder, so SQL and DataFrame callers key identically.
    e.injectFunction((FunctionIdentifier("graft_zorder"),
      info(classOf[ZOrder2], "graft_zorder"),
      (args: Seq[Expression]) => {
        val longs = args.map(Cast(_, LongType))
        longs match {
          case Seq(a, b) => ZOrder2(a, b)
          case Seq(a, b, c) => ZOrder3(a, b, c)
          case _ => throw new IllegalArgumentException(
            "graft_zorder takes 2 or 3 integral columns")
        }
      }))

    // The blessed extraction path for the pincolumns catch-all column
    // (reference schema_projection.rs's JSON fold): a bare KEY instead
    // of JSONPath syntax — `graft_json_get(data, 'age')` ≡
    // `get_json_object(data, '$.age')`. Composed over Spark's native
    // GetJsonObject (codegen'd, whole-stage-compatible); the path
    // concat constant-folds for literal keys. Always evaluated LOCALLY
    // above the scan — the catch-all has no remote existence, and
    // JdbcScan/FederationRule refuse any pushdown touching it.
    e.injectFunction((FunctionIdentifier("graft_json_get"),
      info(classOf[GetJsonObject], "graft_json_get"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_json_get(json, key)")
        // the contract is a BARE key — a key carrying JSONPath syntax
        // would silently become a nested-path/wildcard query, diverging
        // from the catch-all fold's literal-key semantics; reject it at
        // analysis time (non-literal keys are the caller's contract to
        // honor — they cannot be checked here)
        args(1) match {
          case Literal(k, _) if k != null =>
            require(!k.toString.exists(c => ".[]*'?$".contains(c)),
              s"graft_json_get key '$k' contains JSONPath metacharacters; " +
                "use get_json_object(col, '$.path') for path queries")
          case _ => ()
        }
        GetJsonObject(args.head,
          Concat(Seq(Literal(UTF8String.fromString("$."),
            org.apache.spark.sql.types.StringType), args(1))))
      }))
  }
}
