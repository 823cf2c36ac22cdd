package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks of the iterative/distributed algorithms
  * against straightforward sequential reference implementations — the
  * operators whose correctness depends on algorithmic structure
  * (fixpoints, prefix sums), not per-row arithmetic the oracle already
  * pins. Raw ScalaCheck generators with fixed seeds (the scalatest
  * bridge isn't in the offline cache), so failures reproduce exactly.
  */
class AlgorithmPropertySpec extends AnyFunSuite with SparkFixture {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("connectedComponents equals sequential union-find on random graphs") {
    import spark.implicits._
    // total generator (no filters — a filtered Gen can yield None):
    // b = (a + delta) mod n with delta in [1, n-1] guarantees a != b
    val genGraph = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 80)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); d <- Gen.choose(1, n - 1)
      } yield (a.toLong, ((a + d) % n).toLong))
    } yield edges
    for (seed <- 1L to 12L) {
      val edges = sample(genGraph, seed)
      // sequential reference: union-find, then min id per root class
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = verts.groupBy(find).values
        .flatMap(vs => vs.map(_ -> vs.min)).toMap
      // BOTH tiers must equal the reference: the driver union-find fast
      // path (default threshold) and the distributed star-contraction
      // (threshold 0 forces it)
      val gotDriver = Cluster.connectedComponents(edges.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      assert(gotDriver == expected, s"driver tier: seed=$seed edges=$edges")
      if (seed <= 4) { // distributed loop is ~20x slower per graph; 4 seeds suffice
        val gotDist = Cluster.connectedComponents(
            edges.toDF("d1", "d2"), smallGraphThreshold = 0)
          .as[(Long, Long)].collect().toMap
        assert(gotDist == expected, s"distributed tier: seed=$seed edges=$edges")
      }
    }
  }

  test("centrality equals sequential integer power iteration on random graphs") {
    import spark.implicits._
    val genGraph = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); d <- Gen.choose(1, n - 1)
      } yield (a.toLong, ((a + d) % n).toLong))
    } yield edges
    val (iters, damp, scale) = (3, 85L, 1000000000L)
    val base = (100L - damp) * scale / 100L
    for (seed <- 20L to 27L) {
      val edges = sample(genGraph, seed)
      // sequential reference: identical integer arithmetic
      val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val deg = und.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
      var score = deg.keys.map(_ -> scale).toMap
      for (_ <- 1 to iters) {
        val in = und.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (s, _) => score(s) / deg(s) }.sum
        }
        score = in.map { case (v, s) => v -> (base + damp * s / 100L) }
      }
      val got = Cluster.centrality(edges.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      assert(got == score, s"seed=$seed edges=$edges")
    }
  }

  test("dupSpans equals the sequential span-posting reference on random corpora") {
    import spark.implicits._
    // small vocab + short docs force genuine cross-document span hits
    val genCorpus = for {
      nDocs <- Gen.choose(2, 25)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(0, 14)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val k = 3
    for (seed <- 1L to 10L) {
      val corpus = sample(genCorpus, seed)
      // sequential reference: positional k-gram posting lists
      val grams = corpus.map { case (id, t) =>
        val a = t.split(" ", -1).filter(_.nonEmpty)
        id -> (if (a.length >= k) a.sliding(k).map(_.mkString(" ")).toSeq else Seq.empty)
      }.toMap
      val docsPerGram = grams.toSeq
        .flatMap { case (id, gs) => gs.distinct.map(g => (g, id)) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.size }
      val expected = corpus.map { case (id, _) =>
        val gs = grams(id)
        val nDup = gs.count(g => docsPerGram(g) > 1)
        (id, gs.length.toLong, nDup.toLong,
          1000L * nDup / math.max(gs.length, 1))
      }.sortBy(_._1)
      val got = Dedup.dupSpans(corpus.toDF("doc_id", "text"), k = k)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
      assert(got == expected, s"seed=$seed corpus=$corpus")
    }
  }

  test("lmScoreAgainst(df, lmTable(df)) equals the oracled lmScore on random corpora") {
    // the self-LM invariant tying the static-LM surface (streaming
    // gate's scorer) to the DuckDB-oracled q154 form: when the LM is
    // trained on the scored corpus itself, every bigram is
    // in-vocabulary, so the LEFT-join-with-0ppm path must reduce to the
    // inner-join path exactly
    import spark.implicits._
    val genCorpus = for {
      nDocs <- Gen.choose(2, 20)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(0, 12)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for (seed <- 1L to 6L) {
      val corpus = sample(genCorpus, seed).toDF("doc_id", "text")
      val self = TextAnalysis.lmScore(corpus)
        .as[(Long, Long, Long)].collect().toSet
      val against = TextAnalysis.lmScoreAgainst(corpus,
        TextAnalysis.lmTable(corpus))
        .as[(Long, Long, Long)].collect().toSet
      assert(self == against, s"seed=$seed self=$self against=$against")
    }
  }

  test("dupSpanRemoval equals the sequential interval-complement reference on random corpora") {
    import spark.implicits._
    val genCorpus = for {
      nDocs <- Gen.choose(2, 25)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(0, 14)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val k = 3
    for (seed <- 1L to 10L) {
      val corpus = sample(genCorpus, seed)
      // token arrays EXACTLY as Spark's split sees them (no empty-token
      // filter: "" splits to [""], giving n = 1)
      val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val docsOfGram = corpus.flatMap { case (id, _) =>
        val a = toks(id)
        if (a.length >= k) a.sliding(k).map(g => (g.mkString(" "), id)).toSeq
        else Seq.empty
      }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct }
      val expected = corpus.flatMap { case (id, _) =>
        val a = toks(id)
        val n = a.length
        val dupPos =
          if (n < k) Seq.empty
          else (0 to n - k).filter { i =>
            val g = a.slice(i, i + k).mkString(" ")
            docsOfGram(g).exists(_ != id)
          }.map(_ + 1)
        val covered = dupPos.flatMap(i => i until i + k).toSet
        // maximal kept runs of 1..n
        (1 to n).foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
          if (covered(p)) acc
          else acc match {
            case (s, e) :: rest if e == p - 1 => (s, p) :: rest
            case _ => (p, p) :: acc
          }
        }.reverse.map { case (s, e) => (id, s.toLong, e.toLong) }
      }.sortBy(x => (x._1, x._2))
      val got = Dedup.dupSpanRemoval(corpus.toDF("doc_id", "text"), k = k)
        .as[(Long, Long, Long)].collect().sortBy(x => (x._1, x._2)).toList
      assert(got == expected, s"seed=$seed corpus=$corpus")
    }
  }

  test("kmeansAssign equals sequential integer Lloyd on random vector sets") {
    import spark.implicits._
    val genVecs = for {
      n <- Gen.choose(8, 30)
      dims <- Gen.choose(4, 8)
      vecs <- Gen.listOfN(n, Gen.listOfN(dims, Gen.choose(-50L, 50L)))
    } yield vecs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
    def nrm(q: Seq[Long]) = q.map(x => x * x).sum
    for (seed <- 1L to 8L) {
      val vecs = sample(genVecs, seed)
      val (k, iters) = (4, 3)
      // sequential reference of the same integer Lloyd definition
      var cents = vecs.sortBy(_._1).take(k)
        .map { case (id, q) => (id, q, nrm(q)) }
      def assign1(q: Seq[Long]) = cents.map { case (cell, cq, cn) =>
        (nrm(q) - 2 * q.zip(cq).map { case (a, b) => a * b }.sum + cn, cell)
      }.min
      for (_ <- 1 until iters) {
        val byCell = vecs.map { case (_, q) => (assign1(q)._2, q) }.groupBy(_._1)
        cents = cents.map { case (cell, q0, n0) =>
          byCell.get(cell).map { ms =>
            val q1 = q0.indices.map(i => ms.map(_._2(i)).sum / ms.size).toList
            (cell, q1, nrm(q1))
          }.getOrElse((cell, q0, n0))
        }
      }
      val expected = vecs.map { case (id, q) =>
        val (d, c) = assign1(q); id -> ((c, d))
      }.toMap
      val frame = vecs.map { case (id, q) => (id, q.toArray, nrm(q)) }
        .toDF("vec_id", "q", "nrm")
      val got = Similarity.kmeansAssign(frame, k = k, iters = iters)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("pqAdc equals the sequential product-quantization reference on random vector sets") {
    import spark.implicits._
    // the full q158 chain — per-subspace integer Lloyd, positional
    // codes, asymmetric LUT distances, ascending top-k — against a
    // direct sequential implementation of the same definitions
    // (independent of both the Spark expressions and the DuckDB oracle)
    val genVecs = for {
      n <- Gen.choose(8, 26)
      m <- Gen.oneOf(1, 2)
      dsub <- Gen.choose(2, 4)
      vecs <- Gen.listOfN(n, Gen.listOfN(m * dsub, Gen.choose(-50L, 50L)))
    } yield (m, vecs.zipWithIndex.map { case (q, i) => (i.toLong, q) })
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (seed <- 1L to 8L) {
      val (m, vecs) = sample(genVecs, seed)
      val (ksub, iters, k) = (3, 2, 4)
      val dsub = vecs.head._2.length / m
      def sub(q: Seq[Long], s: Int) = q.slice(s * dsub, (s + 1) * dsub)
      // sequential codebooks: seeds = sub-vectors of the ksub smallest
      // ids, positionally coded; one truncating-mean update round
      val books = (0 until m).map { s =>
        var cents: Seq[(Int, Seq[Long])] = vecs.sortBy(_._1).take(ksub)
          .zipWithIndex.map { case ((_, q), c) => (c, sub(q, s)) }
        def assign(q: Seq[Long]): Int =
          cents.map { case (c, cq) => (d2(sub(q, s), cq), c) }.min._2
        for (_ <- 1 until iters) {
          val byCode = vecs.map { case (_, q) => (assign(q), sub(q, s)) }
            .groupBy(_._1)
          cents = cents.map { case (c, q0) =>
            byCode.get(c).map { ms =>
              (c, q0.indices.map(i => ms.map(_._2(i)).sum / ms.size).toList: Seq[Long])
            }.getOrElse((c, q0))
          }
        }
        cents
      }
      def code(q: Seq[Long], s: Int): Int =
        books(s).map { case (c, cq) => (d2(sub(q, s), cq), c) }.min._2
      val cbyId = vecs.map { case (id, q) =>
        id -> (0 until m).map(s => code(q, s))
      }.toMap
      def isQ(id: Long) = id % 3 == 0
      val expected = vecs.filter(v => isQ(v._1)).flatMap { case (qid, qq) =>
        vecs.filter(_._1 != qid).map { case (vid, _) =>
          val adc = (0 until m).map { s =>
            val cq = books(s).find(_._1 == cbyId(vid)(s)).get._2
            d2(sub(qq, s), cq)
          }.sum
          (qid, vid, adc)
        }.sortBy(t => (t._3, t._2)).take(k)
      }.toSet
      val frame = vecs.map { case (id, q) => (id, q.toArray, d2(q, q.map(_ => 0L))) }
        .toDF("vec_id", "q", "nrm")
      val got = Similarity.pqAdc(frame, col("vec_id") % 3 === 0,
        m = m, ksub = ksub, iters = iters, k = k)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed m=$m dsub=$dsub")
    }
  }

  test("simhashPairs pre-collapse equals the per-doc banding reference on duplicate-heavy corpora") {
    import spark.implicits._
    // r17: the signature pre-collapse must be BYTE-identical to per-doc
    // banding including every bucket-cap decision (the census is raw
    // docs, not signatures). Corpora are duplicate-heavy by construction
    // (tiny vocab + explicit copy fanout) and the cap is tiny so both
    // its sides — groups saturating their own buckets, and mixed
    // buckets tipped over the cap by another group's copies — occur.
    val genCorpus = for {
      nBase <- Gen.choose(2, 10)
      bases <- Gen.listOfN(nBase,
        Gen.listOfN(4, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))
      copies <- Gen.listOfN(nBase, Gen.choose(1, 7))
    } yield bases.zip(copies).zipWithIndex.flatMap { case ((t, c), i) =>
      (0 until c).map(j => ((i * 100 + j).toLong, t))
    }
    for (seed <- 1L to 10L) {
      val corpus = sample(genCorpus, seed)
      val cap = 2 + (seed % 4).toInt
      val df = corpus.toDF("doc_id", "text")
      // per-doc reference: signatures from the SAME expression (the
      // pre-collapse under test is the banding structure, not the
      // signature arithmetic — SimHashSpec pins that separately)
      val sig = Dedup.simhashOf(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val chunks = corpus.flatMap { case (id, _) =>
        (0 until 4).map(k => (k, (sig(id) >> (15 * k)) & 32767L, id))
      }
      val surviving = chunks.groupBy(c => (c._1, c._2))
        .filter(_._2.size <= cap).values.flatten.toSeq
      val expected = surviving.groupBy(c => (c._1, c._2)).values.flatMap { ms =>
        for {
          a <- ms; b <- ms if a._3 < b._3
        } yield (a._3, b._3, java.lang.Long.bitCount(sig(a._3) ^ sig(b._3)).toLong)
      }.toSet.filter(_._3 <= 8)
      val got = Dedup.simhashPairs(df, bucketCap = cap)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed cap=$cap corpus=${corpus.size}")
    }
  }

  test("ivfAdc equals the sequential IVFADC reference on random vector sets") {
    import spark.implicits._
    // the full q159 chain — coarse L2 cells, residuals, SHARED residual
    // codebooks, per-probed-cell LUTs, cell-restricted ADC top-k —
    // against a direct sequential implementation of the same definitions
    // (independent of both the Spark expressions and the DuckDB oracle)
    val genVecs = for {
      n <- Gen.choose(10, 26)
      m <- Gen.oneOf(1, 2)
      dsub <- Gen.choose(2, 4)
      vecs <- Gen.listOfN(n, Gen.listOfN(m * dsub, Gen.choose(-50L, 50L)))
    } yield (m, vecs.zipWithIndex.map { case (q, i) => (i.toLong, q) })
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (seed <- 1L to 8L) {
      val (m, vecs) = sample(genVecs, seed)
      val (ksub, iters, k, nprobe) = (3, 2, 4, 2)
      val dsub = vecs.head._2.length / m
      def sub(q: Seq[Long], s: Int) = q.slice(s * dsub, (s + 1) * dsub)
      def isQ(id: Long) = id % 3 == 0
      def isC(id: Long) = id % 4 == 1
      val cents = vecs.filter(v => isC(v._1)).map { case (id, q) => (id, q) }
      // coarse assignment, ties to the smaller cid; residuals exact
      def cellOf(q: Seq[Long]): (Long, Seq[Long]) =
        cents.map { case (cid, cq) => ((d2(q, cq), cid), cq) }.minBy(_._1) match {
          case ((_, cid), cq) => (cid, cq)
        }
      val resById = vecs.map { case (id, q) =>
        val (cid, cq) = cellOf(q)
        id -> ((cid, q.zip(cq).map { case (x, y) => x - y }: Seq[Long]))
      }.toMap
      // shared residual codebooks: seeds = residual sub-vectors of the
      // ksub smallest ids, one truncating-mean update round
      val books = (0 until m).map { s =>
        var bcents: Seq[(Int, Seq[Long])] = vecs.map(_._1).sorted.take(ksub)
          .zipWithIndex.map { case (id, c) => (c, sub(resById(id)._2, s)) }
        def assign(r: Seq[Long]): Int =
          bcents.map { case (c, cq) => (d2(sub(r, s), cq), c) }.min._2
        for (_ <- 1 until iters) {
          val byCode = vecs.map { case (id, _) =>
            (assign(resById(id)._2), sub(resById(id)._2, s)) }.groupBy(_._1)
          bcents = bcents.map { case (c, q0) =>
            byCode.get(c).map { ms =>
              (c, q0.indices.map(i => ms.map(_._2(i)).sum / ms.size).toList: Seq[Long])
            }.getOrElse((c, q0))
          }
        }
        bcents
      }
      def code(r: Seq[Long], s: Int): Int =
        books(s).map { case (c, cq) => (d2(sub(r, s), cq), c) }.min._2
      val expected = vecs.filter(v => isQ(v._1)).flatMap { case (qid, qq) =>
        val probed = cents.map { case (cid, cq) => ((d2(qq, cq), cid), cq) }
          .sortBy(_._1).take(nprobe)
        probed.flatMap { case ((_, cid), cq) =>
          val rq = qq.zip(cq).map { case (x, y) => x - y }
          vecs.filter(v => v._1 != qid && resById(v._1)._1 == cid)
            .map { case (vid, _) =>
              val rv = resById(vid)._2
              val adc = (0 until m).map { s =>
                val bq = books(s).find(_._1 == code(rv, s)).get._2
                d2(sub(rq, s), bq)
              }.sum
              (qid, vid, adc)
            }
        }.sortBy(t => (t._3, t._2)).take(k)
      }.toSet
      val frame = vecs.map { case (id, q) => (id, q.toArray, q.map(x => x * x).sum) }
        .toDF("vec_id", "q", "nrm")
      val got = Similarity.ivfAdc(frame, col("vec_id") % 3 === 0,
        col("vec_id") % 4 === 1, nprobe = nprobe, m = m, ksub = ksub,
        iters = iters, k = k)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed m=$m dsub=$dsub")
      // +R re-rank arm (q161): top-R by the SAME sequential ADC, then
      // exact squared L2 over only those R, ties to the smaller vec_id
      val byId = vecs.toMap
      val r = 2 * k
      val expectedRr = vecs.filter(v => isQ(v._1)).flatMap { case (qid, qq) =>
        val probed = cents.map { case (cid, cq) => ((d2(qq, cq), cid), cq) }
          .sortBy(_._1).take(nprobe)
        val topR = probed.flatMap { case ((_, cid), cq) =>
          val rq = qq.zip(cq).map { case (x, y) => x - y }
          vecs.filter(v => v._1 != qid && resById(v._1)._1 == cid)
            .map { case (vid, _) =>
              val rv = resById(vid)._2
              (qid, vid, (0 until m).map { s =>
                d2(sub(rq, s), books(s).find(_._1 == code(rv, s)).get._2)
              }.sum)
            }
        }.sortBy(t => (t._3, t._2)).take(r)
        topR.map { case (_, vid, _) => (qid, vid, d2(qq, byId(vid))) }
          .sortBy(t => (t._3, t._2)).take(k)
      }.toSet
      val gotRr = Similarity.ivfAdcRerank(frame, col("vec_id") % 3 === 0,
        col("vec_id") % 4 === 1, nprobe = nprobe, m = m, ksub = ksub,
        iters = iters, k = k, rFactor = 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(gotRr == expectedRr, s"rerank: seed=$seed m=$m dsub=$dsub")
    }
  }

  test("ivfTrainCents equals sequential integer Lloyd; the trained chain degenerates to exact search at full probe") {
    import spark.implicits._
    // the r18 first-class-C coarse quantizer (VERDICT r17 #3): training
    // must match an independent sequential Lloyd of the same integer
    // definitions, and the whole trained IVFADC+R chain must collapse to
    // EXACT search when every cell is probed and R covers the corpus —
    // an end-to-end pin that is independent of the training specifics
    val genVecs = for {
      n <- Gen.choose(10, 26)
      vecs <- Gen.listOfN(n, Gen.listOfN(6, Gen.choose(-50L, 50L)))
    } yield vecs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (seed <- 1L to 6L) {
      val vecs = sample(genVecs, seed)
      val (c, iters) = (3, 2)
      // sequential reference: seeds = the c vectors with the smallest
      // (h60(id), id) — the hash-spread sample the operator uses (id
      // order correlates with layout at scale); each round assigns by
      // (d², cid) min and updates by truncating integer mean, empty
      // cells keeping their previous centroid
      def h60(s: String): Long = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)
      var seq: Seq[(Long, Seq[Long])] =
        vecs.sortBy(v => (h60(v._1.toString), v._1)).take(c)
          .map { case (id, q) => (id, q) }
      for (_ <- 1 until iters) {
        val byCell = vecs.groupBy { case (_, q) =>
          seq.map { case (cid, cq) => (d2(q, cq), cid) }.min._2 }
        seq = seq.map { case (cid, q0) =>
          byCell.get(cid).map { ms =>
            (cid, q0.indices.map(i => ms.map(_._2(i)).sum / ms.size).toList: Seq[Long])
          }.getOrElse((cid, q0))
        }
      }
      val expectCents = seq.map { case (cid, cq) =>
        (cid, cq, cq.map(x => x * x).sum) }.toSet
      val frame = vecs.map { case (id, q) => (id, q.toArray, q.map(x => x * x).sum) }
        .toDF("vec_id", "q", "nrm")
      val trained = Similarity.ivfTrainCents(frame, c, iters)
      val got = trained.as[(Long, Array[Long], Long)].collect()
        .map(t => (t._1, t._2.toSeq, t._3)).toSet
      assert(got == expectCents, s"seed=$seed: $got vs $expectCents")
      // full probe + R ≥ corpus ⇒ the compressed scan admits every pair
      // and the exact re-rank returns the true L2 top-k
      val k = 3
      val gotTop = Similarity.ivfAdcRerankWith(frame,
          col("vec_id") % 3 === 0, trained,
          nprobe = c, m = 2, ksub = 4, iters = 1, k = k, rFactor = 16)
        .as[(Long, Long, Long)].collect().toSet
      val expectTop = vecs.filter(_._1 % 3 == 0).flatMap { case (qid, qq) =>
        vecs.filter(_._1 != qid)
          .map { case (vid, vq) => (qid, vid, d2(qq, vq)) }
          .sortBy(t => (t._3, t._2)).take(k)
      }.toSet
      assert(gotTop == expectTop, s"seed=$seed full-probe exactness")
      // semDeDupWith — the corpus-scale SemDeDup form — over the SAME
      // trained centroids: sequential assignment ((d², cid) min), rank
      // (dist desc, id), drop on cosine ≥ thr to ANY earlier-ranked
      // cluster member
      val thr = 0.5
      val gotSd = Similarity.semDeDupWith(frame, trained, thr)
        .as[(Long, Long, Long, Long)].collect().toSet
      val assigned = vecs.map { case (id, q) =>
        val (d, cid) = seq.map { case (cid, cq) => (d2(q, cq), cid) }.min
        (id, cid, d)
      }
      val ordered = assigned.groupBy(_._2).values.flatMap { ms =>
        ms.sortBy(m => (-m._3, m._1)).zipWithIndex
          .map { case ((id, cid, d), i) => (id, cid, d, i + 1) }
      }.toSeq
      val byId = vecs.toMap
      def cosD(a: Seq[Long], b: Seq[Long]): Double =
        a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
          math.sqrt((a.map(x => x * x).sum * b.map(x => x * x).sum).toDouble)
      val expectSd = ordered.map { case (id, cid, d, rnk) =>
        val dup = ordered.exists { case (jid, jcid, _, jrnk) =>
          jcid == cid && jrnk < rnk && cosD(byId(id), byId(jid)) >= thr }
        (id, cid, d, if (dup) 0L else 1L)
      }.toSet
      assert(gotSd == expectSd, s"seed=$seed semDeDupWith")
    }
  }

  test("packSequences equals the sequential prefix sum on random corpora") {
    import spark.implicits._
    val genCorpus = for {
      n <- Gen.choose(1, 120)
      docs <- Gen.listOfN(n, Gen.choose(1, 12))
    } yield docs.zipWithIndex.map { case (toks, i) =>
      (i.toLong, (0 until toks).map(j => s"t$i-$j").mkString(" "))
    }
    for (seed <- 1L to 8L) {
      val corpus = sample(genCorpus, seed)
      val cap = 1 + (seed % 5).toInt * 3
      val out = Curation.packSequences(corpus.toDF("id", "body"),
          "id", "body", capacity = cap, parts = 8)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      assert(out.length == corpus.length, s"seed=$seed")
      // the sequential reference over the SAME deterministic global
      // order the operator defines: (hash bucket, hash, id)
      val keyed = corpus.map { case (id, body) =>
        val h = BigInt(java.security.MessageDigest.getInstance("MD5")
          .digest(body.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
          .take(15), 16).toLong
        (h % 8, h, id, body.split(" ").length.toLong)
      }.sortBy(t => (t._1, t._2, t._3))
      var cum = 0L
      val expected = keyed.map { case (_, _, id, n) =>
        val start = cum; cum += n; id -> ((start / cap, start % cap))
      }.toMap
      out.foreach { case (id, _, bin, off) =>
        assert(expected(id) == ((bin, off)),
          s"seed=$seed doc=$id got=($bin,$off) want=${expected(id)}")
      }
    }
  }

  test("sessionize equals the sequential gap-scan on random event sets") {
    import spark.implicits._
    // ts as LongType NANOS (the events.parquet reading mode); value in
    // exact cents so the DECIMAL sum reference is bit-stable
    val genEvents = for {
      n <- Gen.choose(1, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 4L)
        us <- Gen.choose(0L, 300000000L) // 5 minutes of microseconds
        cents <- Gen.choose(0L, 9999L)
      } yield (u, us, cents))
    } yield evs.zipWithIndex.map { case ((u, us, c), i) =>
      (u, us * 1000L, i.toLong, c / 100.0)
    }
    for (seed <- 1L to 10L) {
      val evs = sample(genEvents, seed)
      val gapMin = 1 + (seed % 3).toInt // 1..3 minutes
      val gapUs = gapMin * 60L * 1000000L
      val got = Sessions.sessionize(
          evs.toDF("user_id", "ts", "event_id", "value"), gapMinutes = gapMin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      // sequential reference: per user, scan (us, id)-sorted events,
      // break when the gap exceeds gapUs, number sessions 1..n
      val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
        val sorted = rows.map(r => (r._2 / 1000L, r._3, r._4)).sortBy(t => (t._1, t._2))
        val sessions = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]]
        var prev = Long.MinValue
        sorted.foreach { e =>
          if (sessions.isEmpty || e._1 - prev > gapUs)
            sessions += scala.collection.mutable.ArrayBuffer(e)
          else sessions.last += e
          prev = e._1
        }
        sessions.zipWithIndex.map { case (s, i) =>
          val sum = s.map(e => BigDecimal(e._3).setScale(2)).sum
          (u, (i + 1).toLong, s.length.toLong, s.head._1, s.last._1, sum.toDouble)
        }
      }.toSet
      assert(got == expected,
        s"seed=$seed gap=$gapMin: only-got=${(got -- expected).take(3)} " +
          s"only-want=${(expected -- got).take(3)}")
    }
  }

  test("funnel equals the sequential first-touch fold on random event sets") {
    import spark.implicits._
    val steps = Seq("s0", "s1", "s2")
    val types = steps :+ "noise"
    val genEvents = for {
      n <- Gen.choose(1, 50)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 5L)
        us <- Gen.choose(0L, 1000L)
        t <- Gen.oneOf(types)
      } yield (u, us * 1000L, t)) // LongType nanos again
    } yield evs
    for (seed <- 1L to 10L) {
      val evs = sample(genEvents, seed)
      val got = Sessions.funnel(evs.toDF("user_id", "ts", "event_type"), steps)
        .select("user_id", "stage")
        .as[(Long, Long)].collect().toMap
      // reference: t_i = min time of step i; stage = longest chain
      // t0 <= t1 <= ... built left to right on first-occurrence times
      val expected = evs.groupBy(_._1).map { case (u, rows) =>
        val firsts = steps.map(s =>
          rows.filter(_._3 == s).map(_._2 / 1000L).minOption)
        var stage = 0L
        var prevT = Long.MinValue
        var open = true
        firsts.foreach { t =>
          if (open) t match {
            case Some(v) if v >= prevT => stage += 1; prevT = v
            case _ => open = false
          }
        }
        u -> stage
      }
      assert(got == expected, s"seed=$seed: got=$got want=$expected evs=$evs")
    }
  }

  test("principalComponents: partitioning-invariant, sign-canonical, PC1-consistent, near-orthogonal") {
    import org.apache.spark.sql.functions.col
    val n0 = EmbeddingLsh.quantized(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select(col("m"), col("i"), col("pc"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val base = rows(Similarity.principalComponents(n0))
    assert(base.map(_._1).distinct == Seq(0L, 1L, 2L, 3L))
    // exact integer pipeline ⇒ the result is INDEPENDENT of input
    // partitioning, bit for bit (the same claim every oracle gate makes
    // cross-engine, here pinned cross-partitioning)
    val reparted = rows(Similarity.principalComponents(n0.repartition(7)))
    assert(reparted == base, "partitioning changed the eigenbasis")
    // sign canonicalization: per component, the largest-|pc| entry
    // (smallest i on ties) is positive
    for (m <- 0L to 3L) {
      val comp = base.filter(_._1 == m)
      val lead = comp.minBy { case (_, i, pc) => (-math.abs(pc), i) }
      assert(lead._3 > 0, s"component $m: leading entry ${lead} not positive")
    }
    // PC1 equals the single-component operator up to the canonical flip
    // (at the SAME round count — components defaults to 6, q149's to 3)
    val pc1 = Similarity.principalComponent(n0, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m0 = base.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    val flip = {
      val i0 = pc1.keys.min
      if (pc1(i0) == 0L || m0(i0) == 0L || pc1(i0).signum == m0(i0).signum) 1L else -1L
    }
    assert(m0 == pc1.map { case (i, v) => i -> v * flip },
      "components(k=4) PC1 diverges from principalComponent")
    // deflation actually removed each component: successive components
    // are near-orthogonal (|cos| small; 3 integer rounds + rounded
    // deflation, so exactly zero is not expected)
    def vec(m: Long): Array[Double] = {
      val mm = base.filter(_._1 == m).sortBy(_._2).map(_._3.toDouble).toArray
      mm
    }
    for (a <- 0 to 3; b <- (a + 1) to 3) {
      val (va, vb) = (vec(a), vec(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val cos = dot / math.sqrt(va.map(x => x * x).sum * vb.map(x => x * x).sum)
      assert(math.abs(cos) < 0.2, f"components $a,$b not orthogonal: cos=$cos%.3f")
    }
  }
}
