package graft.sources.jdbc

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Live incremental-streaming tests over embedded Derby: the JDBC
  * micro-batch source ([[JdbcMicroBatchStream]]) polling an append-only
  * table by a monotonically increasing key.
  */
class JdbcStreamSpec extends AnyFunSuite with SparkFixture {

  private def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(SparkFixture.derbyUrl)
    try {
      val st = c.createStatement()
      try st.executeUpdate(sql) finally st.close()
    } finally c.close()
  }

  private def streamOf(table: String, extra: (String, String)*) = {
    val r = spark.readStream.format("graft.sources.jdbc.GraftJdbcSource")
      .option("url", SparkFixture.derbyUrl)
      .option("dbtable", table)
      .option("streamcolumn", "ID")
    extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("micro-batch stream delivers appended rows exactly once") {
    exec("CREATE TABLE STEV1 (ID BIGINT, V VARCHAR(20))")
    exec("INSERT INTO STEV1 VALUES (1, 'a'), (2, 'b')")
    val q = streamOf("STEV1").writeStream
      .format("memory").queryName("jstream1").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jstream1").count() == 2)
      exec("INSERT INTO STEV1 VALUES (3, 'c'), (4, 'd')")
      q.processAllAvailable()
      import spark.implicits._
      val got = spark.table("jstream1").as[(Long, String)].collect().sortBy(_._1)
      assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    } finally q.stop()
  }

  test("streamrate caps each micro-batch; everything still arrives") {
    exec("CREATE TABLE STEV2 (ID BIGINT, V VARCHAR(20))")
    exec("INSERT INTO STEV2 VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d'), (5,'e')")
    val q = streamOf("STEV2", "streamrate" -> "2").writeStream
      .format("memory").queryName("jstream2").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jstream2").count() == 5)
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(sizes.forall(_ <= 2), s"rate cap violated: ${sizes.mkString(",")}")
      assert(sizes.length >= 3, s"expected >=3 capped batches, got ${sizes.mkString(",")}")
    } finally q.stop()
  }

  test("rows at or below the watermark are ignored, never duplicated") {
    exec("CREATE TABLE STEV3 (ID BIGINT, V VARCHAR(20))")
    exec("INSERT INTO STEV3 VALUES (10, 'x'), (11, 'y')")
    val q = streamOf("STEV3").writeStream
      .format("memory").queryName("jstream3").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jstream3").count() == 2)
      // late arrival below the processed watermark: contractually ignored
      exec("INSERT INTO STEV3 VALUES (5, 'late')")
      q.processAllAvailable()
      assert(spark.table("jstream3").count() == 2)
      // but new rows above it still flow
      exec("INSERT INTO STEV3 VALUES (12, 'z')")
      q.processAllAvailable()
      import spark.implicits._
      val got = spark.table("jstream3").as[(Long, String)].collect().sortBy(_._1)
      assert(got.toSeq == Seq((10L, "x"), (11L, "y"), (12L, "z")))
    } finally q.stop()
  }

  test("JDBC stream composes with the near-dedup curation sink end to end") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // remote ingest table (streamed) and remote corpus table (sink +
    // dedup state) — the whole loop lives in the external database
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.stc")
    spark.sql("DROP TABLE IF EXISTS ext.stc.corpus")
    spark.sql("CREATE TABLE ext.stc.corpus (doc_id BIGINT, text STRING)")
    exec("CREATE TABLE STING (ID BIGINT, DOC_ID BIGINT, BODY VARCHAR(500))")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_jstream_ckpt").toString

    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val variant = (1 to 40).map(i => if (i == 40) "CHANGED" else s"tok$i").mkString(" ")
    val distinct1 = (1 to 40).map(i => s"other$i").mkString(" ")
    val distinct2 = (1 to 40).map(i => s"fresh$i").mkString(" ")
    def ins(id: Long, doc: Long, t: String): Unit =
      exec(s"INSERT INTO STING VALUES ($id, $doc, '$t')")

    ins(1, 1, base); ins(2, 2, variant); ins(3, 3, distinct1)
    val docs = streamOf("STING")
      .select(col("DOC_ID").as("doc_id"), col("BODY").as("text"))
    val q = graft.streaming.EventStream.nearDedupTo(docs, "ext.stc.corpus", ckpt,
      queryName = "graft_jdbc_neardedup")
    try {
      q.processAllAvailable()
      assert(spark.table("ext.stc.corpus").select("doc_id").as[Long].collect().toSet
        == Set(1L, 3L))
      // next poll: exact re-arrival and a fresh doc
      ins(4, 4, base); ins(5, 5, distinct2)
      q.processAllAvailable()
      assert(spark.table("ext.stc.corpus").select("doc_id").as[Long].collect().toSet
        == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("streamlag holds the delivered watermark behind the observed max") {
    exec("CREATE TABLE STEV5 (ID BIGINT, V VARCHAR(20))")
    exec("INSERT INTO STEV5 VALUES (10,'a'), (11,'b'), (12,'c')")
    val q = streamOf("STEV5", "streamlag" -> "2").writeStream
      .format("memory").queryName("jstream5").outputMode("append").start()
    try {
      q.processAllAvailable()
      import spark.implicits._
      // watermark = 12 - lag 2 = 10: only the safely-settled row flows
      assert(spark.table("jstream5").select("ID").as[Long].collect().toSet == Set(10L))
      // a fresh max advances the lagged watermark past the held rows
      exec("INSERT INTO STEV5 VALUES (20, 'd')")
      q.processAllAvailable()
      assert(spark.table("jstream5").select("ID").as[Long].collect().toSet
        == Set(10L, 11L, 12L))
    } finally q.stop()
  }

  test("incremental view maintenance: JDBC stream -> aggregate -> remote upsert") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.stc")
    spark.sql("DROP TABLE IF EXISTS ext.stc.summary")
    spark.sql("CREATE TABLE ext.stc.summary (user_id BIGINT, n BIGINT, total BIGINT)")
    exec("CREATE TABLE STMV (ID BIGINT, USER_ID BIGINT, V BIGINT)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_ckpt").toString

    exec("INSERT INTO STMV VALUES (1, 100, 5), (2, 100, 7), (3, 200, 1)")
    val agg = streamOf("STMV")
      .groupBy(col("USER_ID").as("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("V")).as("total"))
    val q = graft.streaming.EventStream.maintainTo(
      agg, "ext.stc.summary", Seq("user_id"), ckpt, queryName = "graft_mv")
    try {
      q.processAllAvailable()
      def summary() = spark.table("ext.stc.summary")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(summary() == Seq((100L, 2L, 12L), (200L, 1L, 1L)))
      // more facts arrive: the revised rows UPSERT (no duplicate keys)
      exec("INSERT INTO STMV VALUES (4, 100, 3), (5, 300, 9)")
      q.processAllAvailable()
      assert(summary() == Seq((100L, 3L, 15L), (200L, 1L, 1L), (300L, 1L, 9L)))
    } finally q.stop()
  }

  test("batch-only tables refuse streaming; offsets round-trip json") {
    exec("CREATE TABLE STEV4 (ID BIGINT, V VARCHAR(20))")
    // without streamcolumn the table has no MICRO_BATCH_READ capability
    // and the refusal fires at load()-time analysis
    val e = intercept[Exception] {
      spark.readStream.format("graft.sources.jdbc.GraftJdbcSource")
        .option("url", SparkFixture.derbyUrl).option("dbtable", "STEV4").load()
    }
    assert(e.getMessage.contains("does not support streamed reading"), e.getMessage)

    val s = new JdbcMicroBatchStream(
      JdbcOptions(Map("url" -> SparkFixture.derbyUrl, "dbtable" -> "STEV4",
        "streamcolumn" -> "ID")),
      org.apache.spark.sql.types.StructType(Nil), Nil, "ID")
    val off = JdbcStreamOffset(-42L)
    assert(s.deserializeOffset(off.json()) == off)
    assert(s.planInputPartitions(JdbcStreamOffset(7), JdbcStreamOffset(7)).isEmpty)
  }
}
