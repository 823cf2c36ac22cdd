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
    // r20 model (VERDICT r19 #1 — re-derived BEFORE the renderer landed).
    // Budget: the collector keeps the LAST 2000 chars of output. After
    // the line: its own newline (1) + sbt's success trailer, worst
    // observed shape "[success] Total time: 1234 s (20:34), completed
    // Dec 28, 2026, 12:59:59 PM" + newline = 74. Before the line:
    // nothing (r20: outputStrategy = StdoutOutput — the "[info] " logger
    // prefix that used to ride ON the line is gone, returning its 7 B).
    // True budget therefore 2000 − 75 = 1925; the renderer keeps
    // admitting against the stricter legacy 1918 (margin for an exotic
    // trailer).
    // Worst line (the guaranteed-fit rung t2=0 — every fqAt value ≤3
    // chars; iso/diag/failed/only all yield to zero; cal at its widest:
    // start/end pinned 9.9, g capped 9, w capped 99, retry count 3, end
    // re-probe 9.9):
    //   {"metric":"t","value":590,"unit":"sec",   39
    //   "queries":{...},                          10 + map + 1
    //     map: 99 2-digit gates × 9 ("q01":9.9) + (gates−99) × 10
    //          ("q101":9.9) + (gates−1) commas + 2 braces
    //   "cal":[9.9,9.9,9,99,3,9.9],               27
    //   "sf":0.1}                                 9
    // At 167 gates: map = 99×9 + 68×10 + 166 + 2 = 1739 → line = 1825.
    // Headroom: 93 B under the legacy 1918 admission budget, 100 B under
    // the true 1925 — ~8 future gates at 11 B each before the next
    // renderer trim is needed. The REAL line runs at rung t2=10 or 2.5
    // (2-decimal floor queries) whenever, as in every committed round,
    // actual medians are far narrower than the all-worst model.
    val gates = SparkEntry.all.size
    val worstMap = SparkEntry.all
      .map(q => "\"" + qid(q.name) + "\":9.9").mkString("{", ",", "}")
    val worstLine = s"""{"metric":"t","value":590,"unit":"sec",""" +
      s""""queries":$worstMap,""" +
      s""""cal":[9.9,9.9,9,99,3,9.9],""" + s""""sf":0.1}"""
    val threeDigit = SparkEntry.all.count(q => qid(q.name).length > 3)
    val model = 39 + 10 + (9 * (gates - threeDigit) + 10 * threeDigit +
      (gates - 1) + 2) + 1 + 27 + 9
    assert(worstLine.length == model,
      s"worst-case line is ${worstLine.length} B, model says $model — " +
        "the renderer/model drifted; re-derive before committing")
    assert(worstLine.length <= 1918 - 90,
      s"worst-case line ${worstLine.length} B leaves < 90 B headroom " +
        "under the 1918 admission budget; trim the renderer before adding gates")
  }

  test("iso wall budget is reserved for regression movers (r17 verdict #1)") {
    // regressions carry NO exonerating evidence without their shot —
    // their deadline must strictly exceed the stall-flag deadline, and
    // both must leave the 590 s driver kill real margin for the line
    assert(Bench.IsoDeadlineRegression > Bench.IsoDeadlineStall)
    assert(Bench.IsoDeadlineRegression <= 560.0)
  }

  test("iso candidates: evidence-less regressions first by ratio-vs-prev, then stall flags (r14 verdict item 2)") {
    // the path only fires on degraded runs — pin its ordering here so
    // the guarantee doesn't wait for one. Regressions carry NO
    // exonerating evidence without an iso shot, so they outrank stall
    // flags (which already carry their own best rep + diag context);
    // within regressions, q122-style: a 4.8× inflation of a small query
    // must outrank a 2.0× of a big one.
    val regressed = Seq(
      ("q104_tpch_q4", 1.28, 0.64),        // 2.0× on a bigger median
      ("q122_hard_negatives", 2.39, 0.50), // 4.8×
      ("q103_tpch_q15", 1.22, 0.32))       // 3.8×
    val got = Bench.isoOrder(Seq("q123_jdbc_expr_agg"), regressed)
    assert(got == Seq("q122_hard_negatives", "q103_tpch_q15",
      "q104_tpch_q4", "q123_jdbc_expr_agg"), got.toString)
    // a query both stall-flagged and regressed appears once, in the
    // regression (evidence-needing) position
    val dup = Bench.isoOrder(Seq("q122_hard_negatives"), regressed)
    assert(dup.head == "q122_hard_negatives" && dup.count(_ == "q122_hard_negatives") == 1)
  }

  test("prev-round matcher accepts both key spellings (r17 prefix-drop transition)") {
    // r≤16 artifacts carry "q157":1.86; r17+ lines carry "157":0.9 —
    // both must normalize to qNN or the regression trigger silently
    // disarms for exactly one transition round
    val old = Bench.scanMedians("\"q01\":0.54,\"q157\":1.86")
    val neu = Bench.scanMedians("\"01\":0.55,\"157\":0.9")
    assert(old == Map("q01" -> 0.54, "q157" -> 1.86), old.toString)
    assert(neu == Map("q01" -> 0.55, "q157" -> 0.9), neu.toString)
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
