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

  test("worst-case bench JSON line fits the collector tail BESIDE sbt's trailer") {
    // The collector keeps the LAST 2000 chars of combined output, and
    // sbt prints a "[success] Total time: …" trailer (~80 B observed in
    // BENCH_r09's tail) AFTER the JSON line — so the line's real budget
    // is ~1918 B, not 2000. Worst-case width model: the adaptive
    // precision renders ≤ 4 chars at EVERY magnitude ("9.99", "99.9",
    // "590" — r12 added the whole-second tier past 100 s), so every
    // median is modeled at 4 chars. diag at its 2-entry cap; iso is
    // BYTE-BUDGETED at runtime (r12: entries admitted while the line
    // stays ≤ 1918 B, costed at worst width before each shot, hard cap
    // 16) so overflow is impossible by construction — this spec pins
    // that even worst-case medians leave ≥ 3 adjudication slots; every
    // field at max width; `only`/`reps`/empty `failed` are not emitted
    // on clean full runs, `sf` is a basename.
    val widths = Seq.fill(SparkEntry.all.size)("99.9")
    val medians = SparkEntry.all.zip(widths)
      .map { case (q, w) => "\"" + qid(q.name) + "\":" + w }.mkString("{", ",", "}")
    val diag = (1 to 2)
      .map(i => "\"q1${i}0\":[590.0,590.0,100,32.0]").mkString("{", ",", "}")
    val iso = (1 to 3)
      .map(i => "\"q1${i}0\":590.0").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":590.0,"unit":"sec",""" +
      s""""queries":$medians,"diag":$diag,"iso":$iso,""" +
      s""""gcsec":999,"warmsec":999,"sf":"sf0.1"}"""
    assert(line.length <= 1918,
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
