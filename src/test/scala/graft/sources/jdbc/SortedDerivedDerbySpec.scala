package graft.sources.jdbc

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

/** LIVE probe of Derby's derived-table ORDER BY preservation — the one
  * engine in the live set whose `supportsSortedDerivedTable` was gated
  * by absence of data rather than a measurement (r11 verdict item 6).
  * Runs the EXACT SQL shape the federation rule's Sort arm renders
  * (parenthesized ORDER BY with explicit direction and NULLS placement
  * over a derived leg — DialectDump's `sorted_derived` probe) against
  * embedded Derby with enough rows to make accidental order
  * vanishingly unlikely, and asserts the exact row order.
  *
  * Outcome (recorded 2026-08-15, Derby 10.16 in-sandbox): Derby
  * EXECUTES the shape and PRESERVES the order — including DESC NULLS
  * LAST and ASC NULLS FIRST — so [[DerbyDialect.supportsSortedDerivedTable]]
  * flips to true with this spec as the standing evidence. If a Derby
  * upgrade ever scrambles it, this spec fails before the federation
  * rule ships a wrong plan.
  */
class SortedDerivedDerbySpec extends AnyFunSuite {

  test("Derby preserves derived-table ORDER BY (Sort-arm SQL shape, exact order)") {
    val url = s"jdbc:derby:memory:graft_sortder_${System.nanoTime()};create=true"
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("""CREATE TABLE t ("i" INT, "k" BIGINT)""")
      // 4096 rows inserted in a scrambled (multiplicative-permutation)
      // order so the heap order differs from every probe order; spans
      // multiple pages, so "accidentally sorted" reads are implausible
      val ps = c.prepareStatement("""INSERT INTO t ("i", "k") VALUES (?, ?)""")
      val n = 4096
      (0 until n).foreach { r =>
        val v = (r * 2654435761L % n).toInt // permutation of 0..n-1 (n = 2^12)
        ps.setInt(1, v % 7)  // i in 0..6: NULLIF(i, 3) synthesizes NULLs
        ps.setLong(2, v.toLong)
        ps.addBatch()
        if (r % 512 == 511) ps.executeBatch()
      }
      ps.executeBatch()
      ps.close()
      // DialectDump's sorted_derived shape, verbatim modulo table name
      val sql =
        """SELECT "c0", "c1" FROM (""" +
          """SELECT "g0"."c0" AS "c0", "g0"."c1" AS "c1" """ +
          """FROM (SELECT NULLIF("i", 3) AS "c0", "k" AS "c1" FROM t) "g0" """ +
          """ORDER BY "g0"."c0" DESC NULLS LAST, "g0"."c1" ASC NULLS FIRST) "fjs""""
      val rs = st.executeQuery(sql)
      val got = Iterator.continually(rs)
        .takeWhile(_.next())
        .map { r =>
          val c0 = r.getInt(1); val c0n = r.wasNull()
          (if (c0n) None else Some(c0), r.getLong(2))
        }.toVector
      rs.close(); st.close()
      assert(got.size == n)
      // total order: c0 DESC with NULLS LAST (None after every Some),
      // then c1 ASC — the sortWith alone defines it completely
      val expect = (0 until n)
        .map(v => (if (v % 7 == 3) None else Some(v % 7), v.toLong))
        .sortWith { (a, b) =>
          (a._1, b._1) match {
            case (Some(x), Some(y)) => if (x != y) x > y else a._2 < b._2
            case (Some(_), None) => true
            case (None, Some(_)) => false
            case (None, None) => a._2 < b._2
          }
        }.toVector
      assert(got == expect,
        s"Derby scrambled the sorted-derived order: first diff at index " +
          s"${got.zip(expect).indexWhere(p => p._1 != p._2)}")
    } finally c.close()
  }
}
