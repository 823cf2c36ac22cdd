package graft.sources.document

import graft.SparkFixture
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.util.Random

/** Randomized filter-document equivalence: the document source
  * translates Spark predicates into find documents and EVALUATES THEM
  * ITSELF ([[FilterDoc.matches]] over JSONL) — an independent
  * evaluator, so random predicates must return exactly the rows the
  * same filter yields over an in-memory mirror of the collection.
  * Missing fields and nulls (document stores' defining wrinkle) are in
  * every generated batch; whether a predicate translates fully or
  * falls back to Spark must be invisible in the result.
  */
class DocumentPropertySpec extends AnyFunSuite with SparkFixture {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_docprop").toString
    val rnd = new Random(7)
    val lines = (1 to 60).map { i =>
      val fields = scala.collection.mutable.ListBuffer[String](s""""id": $i""")
      if (rnd.nextInt(10) != 0) fields += s""""n": ${rnd.nextInt(50)}"""
      if (rnd.nextInt(10) != 0) fields += s""""x": ${if (rnd.nextBoolean()) "null" else rnd.nextInt(20).toString}"""
      if (rnd.nextInt(8) != 0)
        fields += s""""tag": "${Seq("alpha", "beta", "pre%fix", "un_der")(rnd.nextInt(4))}""""
      fields.mkString("{", ", ", "}")
    }
    Files.writeString(java.nio.file.Paths.get(s"$d/c.jsonl"),
      lines.mkString("", "\n", "\n"))
    d
  }

  private def collection: DataFrame =
    spark.read.format("graft.sources.document.DocumentSource")
      .option("path", dir).load()

  private def pred(rnd: Random, depth: Int = 0): Column = {
    def leaf: Column = rnd.nextInt(8) match {
      case 0 => col("n") > lit(rnd.nextInt(50))
      case 1 => col("n") <= lit(rnd.nextInt(50))
      case 2 => col("x").isNull
      case 3 => col("x").isNotNull
      case 4 => col("tag") === Seq("alpha", "beta", "pre%fix")(rnd.nextInt(3))
      case 5 => col("tag").startsWith(Seq("al", "pre%", "un_")(rnd.nextInt(3)))
      case 6 => col("tag").isin("alpha", "un_der")
      case 7 => col("id") % lit(2 + rnd.nextInt(4)) === lit(rnd.nextInt(2))
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

  test("random predicates: document-source filter == in-memory mirror") {
    // mirror through the SAME inferred schema so values are identical
    val mirror = collection.cache()
    mirror.count()
    for (seed <- 1 to 30) {
      val p1 = pred(new Random(seed))
      val p2 = pred(new Random(seed))
      val got = sortedRows(collection.filter(p1))
      val want = sortedRows(mirror.filter(p2))
      assert(got == want, s"seed=$seed predicate=$p1 diverged:\n got=$got\nwant=$want")
    }
    mirror.unpersist()
  }

  test("pushed NOT over a missing field drops the row (three-valued logic)") {
    // NOT survives translation only over non-negatable predicates
    // (Catalyst rewrites NOT(a > b) to a <= b before pushdown); a doc
    // with NO tag evaluates NOT(tag LIKE 'al%') to UNKNOWN — SQL drops
    // it, and the pushed evaluator must agree (two-valued $nor
    // semantics would emit it: the round-8 review finding)
    val got = collection.filter(!col("tag").startsWith("al"))
      .select("tag").collect()
    assert(got.nonEmpty)
    assert(got.forall(r => !r.isNullAt(0)),
      "a row with a missing/null tag leaked through pushed NOT")
    // and the pushed plan really did push it (not a silent fallback)
    val pushed = collection.filter(!col("tag").startsWith("al"))
      .queryExecution.executedPlan.toString
    assert(pushed.contains("regex") || pushed.contains("nor"),
      s"predicate unexpectedly not pushed:\n$pushed")
  }
}
