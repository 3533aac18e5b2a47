package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Randomized (seeded — reproducible) brute-force equivalence for the
  * exact-join family: on arbitrary random set corpora the prefix-filtered
  * joins must return EXACTLY the brute-force result — the zero-miss
  * theorems hold for every input, not just the crafted fixtures and the
  * testdata the oracle sees. Element distributions are zipf-ish so
  * prefixes actually prune (uniform elements would make every prefix
  * equally rare and hide ordering bugs). */
class ExactJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish random set corpus: n sets of size in [1, maxLen] over a
    * skewed element universe. */
  private def corpus(seed: Long, n: Int, maxLen: Int): Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map { i =>
      val len = 1 + rnd.nextInt(maxLen)
      val els = Iterator.continually {
        // skew: element k drawn with weight ~ 1/(k+1)
        val u = rnd.nextDouble()
        s"e${(math.pow(60.0, u).toInt - 1)}"
      }.take(len * 3).toSeq.distinct.take(len)
      (i.toLong, els)
    }
    // plant exact and one-element-off clones of the widest sets so even
    // tau -> 1 thresholds have qualifying pairs (non-vacuous at every
    // threshold the tests use)
    val wide = base.maxBy(_._2.length)
    base ++ Seq(
      (n.toLong, wide._2),
      (n + 1L, wide._2.drop(1) :+ "planted"))
  }

  private def bruteJaccard(c: Seq[(Long, Seq[String])], num: Int, den: Int) =
    (for {
      (ia, sa0) <- c; (ib, sb0) <- c if ia < ib
      sa = sa0.toSet; sb = sb0.toSet
      inter = (sa & sb).size.toLong
      uni = sa.size.toLong + sb.size - inter
      if inter * den >= uni * num
    } yield (ia, ib, inter, uni)).toSet

  private def bruteCosine(c: Seq[(Long, Seq[String])], num: Int, den: Int) =
    (for {
      (ia, sa0) <- c; (ib, sb0) <- c if ia < ib
      sa = sa0.toSet; sb = sb0.toSet
      ov = (sa & sb).size.toLong
      if ov * ov * den * den >= sa.size.toLong * sb.size * num * num
    } yield (ia, ib, ov)).toSet

  test("SetSimJoin.join equals brute force on random skewed corpora at several thresholds") {
    for ((seed, num, den) <- Seq((1L, 1, 2), (2L, 3, 10), (3L, 9, 10))) {
      val c = corpus(seed, n = 60, maxLen = 12)
      val got = SetSimJoin.join(c.toDF("doc_id", "sh"), "doc_id", "sh",
          num, den)
        .select("id_a", "id_b", "inter", "uni")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = bruteJaccard(c, num, den)
      assert(got == want,
        s"seed=$seed tau=$num/$den: missed ${want -- got}, extra ${got -- want}")
      assert(want.nonEmpty, s"seed=$seed tau=$num/$den: vacuous fixture")
    }
  }

  test("SetSimJoin.joinCapped equals the brute-force capped semantic on random skewed corpora") {
    // capped semantic: jac >= tau AND at least one SHARED element has
    // df <= cap — the brute force computes df over the whole corpus and
    // applies the definition directly, no prefix anywhere
    def bruteCapped(c: Seq[(Long, Seq[String])], num: Int, den: Int,
                    cap: Long) = {
      val df = c.flatMap(_._2.distinct).groupBy(identity)
        .map { case (e, xs) => e -> xs.size.toLong }
      (for {
        (ia, sa0) <- c; (ib, sb0) <- c if ia < ib
        sa = sa0.toSet; sb = sb0.toSet
        shared = sa & sb
        inter = shared.size.toLong
        uni = sa.size.toLong + sb.size - inter
        if inter * den >= uni * num
        if shared.exists(df(_) <= cap)
      } yield (ia, ib, inter, uni)).toSet
    }
    for ((seed, cap) <- Seq((11L, 2L), (12L, 3L), (13L, 4L))) {
      // the corpus already plants a wide clone pair whose every shared
      // element has df >= 3 (base + two clones) — excluded at cap=2; add
      // a pair sharing only UNIQUE elements (df = 2) so the capped
      // result is non-vacuous at every cap >= 2
      val c = corpus(seed, n = 60, maxLen = 12) ++ Seq(
        (200L, Seq("rp_a", "rp_b", "rp_c")),
        (201L, Seq("rp_a", "rp_b", "rp_d")))
      val got = SetSimJoin.joinCapped(c.toDF("doc_id", "sh"), "doc_id", "sh",
          1, 2, dfCap = cap)
        .select("id_a", "id_b", "inter", "uni")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = bruteCapped(c, 1, 2, cap)
      assert(got == want,
        s"seed=$seed cap=$cap: missed ${want -- got}, extra ${got -- want}")
      val uncapped = bruteJaccard(c, 1, 2)
      assert(want.contains((200L, 201L, 2L, 4L)),
        s"seed=$seed cap=$cap: rare-evidence pair must survive")
      assert((uncapped -- want).nonEmpty || cap >= 3,
        s"seed=$seed cap=$cap: the cap never excluded a pair — fixture " +
          "does not exercise governance")
      spark.catalog.clearCache()
    }
  }

  test("SetSimJoin.cosineJoin equals brute force on random skewed corpora at several thresholds") {
    for ((seed, num, den) <- Seq((4L, 4, 5), (5L, 1, 2), (6L, 19, 20))) {
      val c = corpus(seed, n = 60, maxLen = 12)
      val got = SetSimJoin.cosineJoin(c.toDF("doc_id", "sh"), "doc_id", "sh",
          num, den)
        .select("id_a", "id_b", "inter")
        .as[(Long, Long, Long)].collect().toSet
      val want = bruteCosine(c, num, den)
      assert(got == want,
        s"seed=$seed tau=$num/$den: missed ${want -- got}, extra ${got -- want}")
      assert(want.nonEmpty, s"seed=$seed tau=$num/$den: vacuous fixture")
    }
  }

  test("ContainmentJoin.join equals brute force on random skewed corpora") {
    for (seed <- Seq(7L, 8L)) {
      val c = corpus(seed, n = 50, maxLen = 10)
      val df = c.toDF("doc_id", "sh")
      // self-pairs are trivially contained when probes == corpus; compare
      // on the ia != ib pairs, both directions (equal sets contain both
      // ways)
      val got = ContainmentJoin.join(df, df, "doc_id", "sh")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        .filterNot(p => p._1 == p._2)
      val want = (for {
        (ia, sa0) <- c; (ib, sb0) <- c if ia != ib
        sa = sa0.toSet; sb = sb0.toSet
        if sa.nonEmpty && sa.subsetOf(sb)
      } yield (ia, ib)).toSet
      assert(got == want,
        s"seed=$seed: missed ${want -- got}, extra ${got -- want}")
      assert(want.nonEmpty, s"seed=$seed: vacuous containment fixture")
    }
  }

  test("EditDistanceJoin equals brute force on random strings with planted edits") {
    for (seed <- Seq(11L, 12L)) {
      val rnd = new scala.util.Random(seed)
      val alpha = "abcdef"
      def randStr(len: Int) =
        (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val corpus = (0 until 40).map(i => (i.toLong, randStr(8 + rnd.nextInt(6))))
      // probes: random edits of corpus strings (0-3 char substitutions /
      // deletions) plus fresh noise — guarantees pairs at 0, 1, 2 and
      // just-outside-threshold distances
      val probes = (0 until 30).map { i =>
        val (_, base) = corpus(rnd.nextInt(corpus.length))
        val nEdits = rnd.nextInt(4)
        val edited = (0 until nEdits).foldLeft(base) { (st, _) =>
          val p = rnd.nextInt(st.length)
          if (rnd.nextBoolean() && st.length > 4) st.take(p) + st.drop(p + 1)
          else st.take(p) + alpha(rnd.nextInt(alpha.length)) + st.drop(p + 1)
        }
        (100L + i, edited)
      }
      val got = EditDistanceJoin.join(
          probes.toDF("did", "dn"), corpus.toDF("cid", "cn"),
          "did", "dn", "cid", "cn", k = 2, q = 2)
        .select("did", "cid", "lev")
        .as[(Long, Long, Int)].collect().toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for {
        (pi, ps) <- probes; (ci, cs) <- corpus
        l = lev(ps, cs) if l <= 2
      } yield (pi, ci, l)).toSet
      assert(got == want,
        s"seed=$seed: missed ${want -- got}, extra ${got -- want}")
      assert(want.exists(_._3 == 2), s"seed=$seed: no distance-2 pair")
    }
  }

  test("simhashNearDupsFromHash equals brute force on random 32-bit signatures") {
    import spark.implicits._
    for (seed <- Seq(21L, 22L)) {
      val rnd = new scala.util.Random(seed)
      // half uniform noise, half clustered around a few centers so the
      // radius actually fires
      val centers = Seq.fill(4)(rnd.nextLong() & 0xffffffffL)
      val sigs = (0 until 100).map { i =>
        val v = if (i % 2 == 0) rnd.nextLong() & 0xffffffffL
        else {
          var c = centers(rnd.nextInt(centers.length))
          (0 until rnd.nextInt(5)).foreach(_ => c ^= 1L << rnd.nextInt(32))
          c
        }
        (i.toLong, v)
      }
      val got = DedupOperators
        .simhashNearDupsFromHash(sigs.toDF("_id", "_sh"), bits = 32,
          radius = 3)
        .select("id_a", "id_b", "hamming")
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        hd = java.lang.Long.bitCount(sa ^ sb) if hd <= 3
      } yield (ia, ib, hd)).toSet
      assert(got == want,
        s"seed=$seed: missed ${want -- got}, extra ${got -- want}")
      assert(want.exists(_._3 == 3), s"seed=$seed: radius edge unexercised")
    }
  }

  test("clusterPairs labels equal brute-force connected components on random graphs") {
    import spark.implicits._
    for (seed <- Seq(31L, 32L)) {
      val rnd = new scala.util.Random(seed)
      val n = 80
      // sparse random graph + a long planted chain (exercises pointer
      // jumping past trivial diameters)
      val edges = (0 until 60).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2) ++
        (100L until 130L).map(i => (i, i + 1))
      val got = DedupOperators
        .clusterPairs(edges.toDF("id_a", "id_b"), maxIters = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical min-id label per component
      val comp = nodes.groupBy(find).flatMap { case (_, ns) =>
        val m = ns.min; ns.map(_ -> m) }
      assert(got == comp,
        s"seed=$seed: ${got.toSet -- comp.toSet} vs ${comp.toSet -- got.toSet}")
    }
  }
}
