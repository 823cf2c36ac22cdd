package graft.functions

import graft.SparkFixture
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gramian TypedImperativeAggregate: exact int64 Σ q·qᵀ with O(d²)
  * mergeable state — correctness against a sequential reference,
  * partitioning independence, and loud failure on ragged input.
  */
class GramSpec extends AnyFunSuite with SparkFixture {

  private def brute(vecs: Seq[Array[Long]]): Map[(Int, Int), Long] = {
    val d = vecs.head.length
    (for (i <- 0 until d; j <- 0 until d)
      yield (i, j) -> vecs.map(v => v(i) * v(j)).sum).toMap
  }

  test("gramMatrix equals the sequential Gramian, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Array.fill(5)(rnd.nextInt(201).toLong - 100))
    val want = brute(vecs)
    for (parts <- Seq(1, 7)) {
      val df = vecs.map(v => Tuple1(v.toSeq)).toDF("q").repartition(parts)
      val got = Similarity.gramMatrix(df).collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2)).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("output is the full symmetric matrix with d*d rows") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(1L, 2L, 3L)), Tuple1(Seq(-1L, 0L, 4L))).toDF("q")
    val rows = Similarity.gramMatrix(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.size == 9)
    for (i <- 0L until 3L; j <- 0L until 3L)
      assert(rows((i, j)) == rows((j, i)), s"asymmetric at ($i,$j)")
    assert(rows((0L, 0L)) == 1L * 1L + (-1L) * (-1L))
    assert(rows((0L, 2L)) == 1L * 3L + (-1L) * 4L)
  }

  test("null vectors are skipped; all-null group yields no rows") {
    import spark.implicits._
    val df = Seq(Some(Seq(2L, 3L)), None, Some(Seq(1L, 1L))).toDF("q")
    val rows = Similarity.gramMatrix(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((0L, 1L)) == 2L * 3L + 1L * 1L)
    val empty = Similarity.gramMatrix(
      Seq(Option.empty[Seq[Long]]).toDF("q"))
    assert(empty.count() == 0)
  }

  test("a vector with ANY null component is skipped whole") {
    import spark.implicits._
    // a partial read would treat the null slot as 0 (Unsafe) or NPE
    // (Generic) — the contract is SQL-like: null input rows don't count
    val df = Seq(Some(Seq(Some(2L), Some(3L))), Some(Seq(Some(1L), None)),
      Some(Seq(Some(1L), Some(1L)))).toDF("q")
    val rows = Similarity.gramMatrix(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((0L, 1L)) == 2L * 3L + 1L * 1L, rows)
  }

  test("ARRAY<INT> input widens via implicit cast instead of misreading") {
    import spark.implicits._
    // without declared inputTypes, getLong over 4-byte slots returned
    // plausible garbage; with them the analyzer inserts the array cast
    val df = Seq(Tuple1(Seq(3, 4)), Tuple1(Seq(1, 2))).toDF("q")
    val rows = Similarity.gramMatrix(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows == Map((0L, 0L) -> 10L, (0L, 1L) -> 14L,
      (1L, 0L) -> 14L, (1L, 1L) -> 20L), rows)
  }

  test("non-integral arrays fail analysis loudly (no silent truncation)") {
    import spark.implicits._
    // raw float embeddings passed without quantizing must error, not
    // truncate toward zero into a plausible-looking Gramian
    val df = Seq(Tuple1(Seq(1.5, 2.5))).toDF("q")
    val e = intercept[Exception] {
      Similarity.gramMatrix(df).collect()
    }
    assert(e.getMessage.toLowerCase.contains("integral") ||
      e.getMessage.contains("graft_gram"), e.getMessage)
  }

  test("ragged input fails loudly, not silently") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(1L, 2L)), Tuple1(Seq(1L, 2L, 3L))).toDF("q")
      .coalesce(1)
    val e = intercept[Exception] {
      Similarity.gramMatrix(df).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")), e.getMessage)
  }

  test("covarianceMatrix equals the sequential numerators n·G − s·sᵀ") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(40)(Array.fill(4)(rnd.nextInt(401).toLong - 200))
    val n = vecs.length.toLong
    val s = (0 until 4).map(i => vecs.map(_(i)).sum)
    val g = brute(vecs)
    val want = (for (i <- 0 until 4; j <- 0 until 4)
      yield (i, j) -> BigDecimal(n * g((i, j)) - s(i) * s(j))).toMap
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("q").repartition(5)
    val got = Similarity.covarianceMatrix(df).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
        BigDecimal(r.getDecimal(2))).toMap
    graft.operators.GraftCache.releaseAll()
    assert(got == want)
  }

  test("correlationMatrix normalizes exactly and drops zero-variance dims") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // last dimension CONSTANT → zero variance → dropped, not NaN
    val vecs = Seq.fill(30)(Array.fill(3)(rnd.nextInt(201).toLong - 100) :+ 5L)
    val n = vecs.length.toLong
    val s = (0 until 4).map(i => vecs.map(_(i)).sum)
    val g = brute(vecs)
    def num(i: Int, j: Int): Long = n * g((i, j)) - s(i) * s(j)
    assert(num(3, 3) == 0L, "constant dim must have zero variance")
    val want = (for (i <- 0 until 3; j <- 0 until 3) yield (i, j) ->
      num(i, j).toDouble /
        (math.sqrt(num(i, i).toDouble) * math.sqrt(num(j, j).toDouble))).toMap
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("q").repartition(3)
    val got = Similarity.correlationMatrix(df).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    assert(got == want) // bit-exact: same cast/sqrt/divide shape
  }

  test("standardize matches the sequential z-score on exact numerators") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vecs = Seq.fill(25)(Array.fill(3)(rnd.nextInt(201).toLong - 100))
    val n = vecs.length.toLong
    val s = (0 until 3).map(i => vecs.map(_(i)).sum)
    val g = brute(vecs)
    def v(i: Int): Long = n * g((i, i)) - s(i) * s(i)
    val want = (for ((vec, id) <- vecs.zipWithIndex; i <- 0 until 3) yield
      (id.toLong, i.toLong) ->
        (n * vec(i) - s(i)).toDouble / math.sqrt(v(i).toDouble)).toMap
    val df = vecs.zipWithIndex.map { case (q, id) => (id.toLong, q.toSeq) }
      .toDF("vec_id", "q").repartition(4)
    val got = Similarity.standardize(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == want) // bit-exact: same multiply/cast/sqrt/divide shape
  }

  test("serialization round-trip preserves dimension, count and sums") {
    val agg = GramAgg(org.apache.spark.sql.catalyst.expressions.Literal(null,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    val buf = new GramBuf(3, 5L, Array(1L, 2L, 3L, 4L, 5L, 6L))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.d == 3 && back.n == 5L && back.acc.toSeq == buf.acc.toSeq)
    val empty = agg.deserialize(agg.serialize(agg.createAggregationBuffer()))
    assert(empty.d == -1 && empty.acc == null)
  }
}
