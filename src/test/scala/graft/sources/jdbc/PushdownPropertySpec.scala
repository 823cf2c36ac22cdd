package graft.sources.jdbc

import graft.SparkFixture
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized pushdown equivalence: filters drawn from the whole
  * V2-translatable grammar (comparisons, arithmetic incl. modulo,
  * LIKE-shaped string predicates with wildcard characters IN the data
  * and the literals, IN lists, CASE WHEN, temporal extraction, NULL
  * handling / three-valued logic, AND/OR/NOT composition) must return
  * identical rows through the pushed Derby scan and over an in-memory
  * mirror. Whether a predicate pushes fully, partially or not at all is
  * irrelevant to the caller — THE RESULT MUST NOT CHANGE. This is the
  * contract the per-construct goldens in UnparserSpec cannot sweep.
  */
class PushdownPropertySpec extends AnyFunSuite with SparkFixture {

  // nulls in every column; strings contain LIKE metacharacters
  private lazy val rows: Seq[(java.lang.Long, java.lang.Double, String, java.sql.Timestamp)] =
    (1 to 40).map { i =>
      val k: java.lang.Long = if (i % 11 == 0) null else Long.box(i.toLong)
      val d: java.lang.Double = if (i % 7 == 0) null else Double.box((i * 13 % 20) * 2.5)
      val s: String =
        if (i % 9 == 0) null
        else Seq("plain", "pre%mid", "under_score", "back\\slash", "mix%_", s"word$i")(i % 6)
      val ts: java.sql.Timestamp =
        if (i % 13 == 0) null
        else java.sql.Timestamp.valueOf(f"${1994 + i % 4}%d-${1 + i % 12}%02d-${1 + i % 27}%02d 0${i % 9}:1${i % 5}:00")
      (k, d, s, ts)
    }

  private def setup(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ext.pp")
    spark.sql("DROP TABLE IF EXISTS ext.pp.t")
    import spark.implicits._
    rows.toDF("k", "d", "s", "ts").writeTo("ext.pp.t").create()
  }

  /** Random predicate over columns k/d/s/ts, identical for both sides. */
  private def pred(rnd: Random, depth: Int = 0): Column = {
    def leaf: Column = rnd.nextInt(10) match {
      case 0 => col("k") > lit(rnd.nextInt(40).toLong)
      case 1 => col("k") % lit(2 + rnd.nextInt(5)) === lit(rnd.nextInt(3))
      case 2 => col("d") <= lit(rnd.nextInt(50).toDouble)
      case 3 => col("s").startsWith(Seq("p", "pre%", "under_", "back\\")(rnd.nextInt(4)))
      case 4 => col("s").contains(Seq("%", "_", "\\", "id")(rnd.nextInt(4)))
      case 5 => col("s").isin("plain", "mix%_", s"word${rnd.nextInt(40)}")
      case 6 => col(Seq("k", "d", "s", "ts")(rnd.nextInt(4))).isNull
      case 7 => year(col("ts")) === lit(1994 + rnd.nextInt(4))
      case 8 => month(col("ts")) <= lit(1 + rnd.nextInt(12))
      case 9 => when(col("k") > 20, col("d")).otherwise(col("d") + 10) > lit(15.0)
    }
    if (depth >= 2 || rnd.nextInt(3) == 0) leaf
    else rnd.nextInt(3) match {
      case 0 => pred(rnd, depth + 1) && pred(rnd, depth + 1)
      case 1 => pred(rnd, depth + 1) || pred(rnd, depth + 1)
      case 2 => !pred(rnd, depth + 1)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("random predicates: pushed Derby scan == in-memory mirror") {
    setup()
    import spark.implicits._
    val local = rows.toDF("k", "d", "s", "ts")
    val remote = spark.table("ext.pp.t")
    for (seed <- 1 to 40) {
      val p1 = pred(new Random(seed))
      val p2 = pred(new Random(seed))
      val (got, want) = (sortedRows(remote.filter(p1)), sortedRows(local.filter(p2)))
      assert(got == want,
        s"seed=$seed predicate=${p1} diverged:\n got=$got\nwant=$want")
    }
  }
}
