package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts the bench/verify harness depends on. The collecting
  * harness keeps only ~2 KB of process-output tail and parses ONE JSON
  * line from it (BENCH_r04/r05 were truncated to `parsed: null` when
  * the line hit 7 KB) — these assertions fail a regression here before
  * a round's numbers are silently lost.
  */
class BenchContractSpec extends AnyFunSuite {

  private def qid(name: String) = name.takeWhile(_ != '_')

  test("qNN ids are unique (bench JSON keys + SPARK_GRAFT_ONLY matching)") {
    val ids = SparkEntry.all.map(q => qid(q.name))
    val dups = ids.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate bench ids: ${dups.mkString(",")}")
  }

  test("worst-case bench JSON line stays under the 2 KB collector tail") {
    // mirror Bench's emission shape with worst-case widths: every
    // median at the adaptive-precision maximum (999.9 — the driver
    // kills a bench run at its 590 s timeout, so no emitted line can
    // carry a 4-digit-seconds median); the diag map at its 10-entry cap
    // with every field at max width; `only` and `reps` are not emitted
    // on full runs, `sf` emits as its basename
    val medians = SparkEntry.all
      .map(q => "\"" + qid(q.name) + "\":999.9").mkString("{", ",", "}")
    val diag = (1 to 7)
      .map(i => "\"q1${i}0\":[999.9,999.9,100,32.0]").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":99999.999,"unit":"sec",""" +
      s""""queries":$medians,"diag":$diag,""" +
      s""""gcsec":999,"warmsec":999,""" +
      s""""failed":[],"sf":"sf0.1"}"""
    assert(line.length <= 2000,
      s"bench JSON would be ${line.length} B; trim before the harness truncates it")
  }

  test("every query has a distinct name and every oracle aliases no bare aggregates") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    // driver compare sorts columns by NAME: an unaliased aggregate like
    // sum(x) would never match the Spark column; cheap lint for the
    // obvious cases
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(!sql.toLowerCase.matches(""".*select [^,]*\((?!\*)[^)]*\)\s*(,|from).*""") ||
        sql.toLowerCase.contains(" as "),
        s"$n: oracle seems to project an unaliased expression")
    }
  }
}
