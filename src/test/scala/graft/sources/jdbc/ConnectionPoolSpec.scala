package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-executor pool contract (reference
  * `crates/common/src/sql/db_connection_pool/mod.rs:59-64`): physical
  * connections are reused across tasks, bounded by `poolmax`, and
  * `close()` on a pooled handle releases instead of tearing down.
  */
class ConnectionPoolSpec extends AnyFunSuite with SparkFixture {

  private def opts(extra: (String, String)*): JdbcOptions =
    JdbcOptions(Map("url" -> SparkFixture.derbyUrl) ++ extra)

  test("sequential borrowers reuse one physical connection") {
    val o = opts("poolmax" -> "3")
    val before = ConnectionPool.physicalOpens(o)
    (1 to 5).foreach { _ =>
      val c = o.connect()
      val st = c.createStatement()
      st.execute("VALUES 1")
      st.close()
      c.close() // releases to the pool, must not tear down
    }
    val after = ConnectionPool.physicalOpens(o)
    assert(after - before <= 1, s"expected 1 physical open, got ${after - before}")
  }

  test("a released handle is dead; the physical connection lives on") {
    val o = opts("poolmax" -> "3")
    val c = o.connect()
    c.close()
    assert(c.isClosed)
    intercept[java.sql.SQLException](c.createStatement())
    // the underlying connection is back in the pool and still usable
    val c2 = o.connect()
    try {
      assert(!c2.isClosed)
      val st = c2.createStatement()
      st.execute("VALUES 1")
      st.close()
    } finally c2.close()
  }

  test("dynamic credentials: passwordfile re-resolves per connect, secrets redact") {
    val f = java.nio.file.Files.createTempFile("graft_pw", ".txt")
    java.nio.file.Files.writeString(f, "s3cret\n")
    assert(JdbcOptions.resolvePassword(Map("passwordfile" -> f.toString)).contains("s3cret"))
    // static password wins over the file
    assert(JdbcOptions.resolvePassword(
      Map("password" -> "x", "passwordfile" -> f.toString)).contains("x"))
    // rotation: the next physical connect reads the NEW secret
    java.nio.file.Files.writeString(f, "rotated")
    assert(JdbcOptions.resolvePassword(Map("passwordfile" -> f.toString)).contains("rotated"))
    // secrets never echo into plans/logs via toString
    val o = JdbcOptions(Map("url" -> "jdbc:derby:memory:x", "password" -> "hunter2"))
    assert(!o.toString.contains("hunter2"))
    assert(o.toString.contains("*****"))
  }

  test("4-partition parallel scan opens at most poolmax physical connections") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.pool")
    spark.sql("DROP TABLE IF EXISTS ext.pool.t")
    import spark.implicits._
    (1L to 40L).map(i => (i, i % 5)).toDF("k", "v")
      .writeTo("ext.pool.t").create()

    // poolmax=2 is its own pool identity — the counter starts fresh
    val o = opts("poolmax" -> "2")
    val before = ConnectionPool.physicalOpens(o)
    val agg = spark.read
      .option("partitioncolumn", "k")
      .option("lowerbound", "1")
      .option("upperbound", "41")
      .option("numpartitions", "4")
      .option("poolmax", "2")
      .table("ext.pool.t")
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(agg.getLong(0) == 40L)
    val delta = ConnectionPool.physicalOpens(o) - before
    assert(delta >= 1 && delta <= 2,
      s"4 partition readers must share <= poolmax=2 physical connections, opened $delta")
  }
}
