package graft.operators

import graft.SparkSpec
import graft.ops.CacheScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized invariants of NN-Descent (the banded-MinHash /
  * KMeansPropertySpec reference-equivalence device): on seeded random
  * corpora, every round's neighbor list must be SOUND (each edge's cosine
  * is the true cosine; ranks ordered by the pinned tie-break) and must
  * IMPROVE MONOTONICALLY (candidates ⊇ current neighbors, so the sorted
  * cosine vector of round r+1 weakly dominates round r — the paper's
  * convergence argument, checked node by node). */
class NnDescentPropertySpec extends SparkSpec {
  import spark.implicits._
  implicit val scope: CacheScope = CacheScope.session

  private def corpus(seed: Long, n: Int, dims: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Seq.fill(dims)(rnd.nextInt(2001).toDouble / 1000.0 - 1.0)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, (i % 5).toLong, v, nrm)
    }.toDF("vec_id", "cell", "v", "nrm")
  }

  private def cosRef(a: Seq[Double], b: Seq[Double]): Double = {
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
  }

  private def edgeMap(g: DataFrame): Map[Long, Seq[(Long, Long, Double)]] =
    g.select(col("u"), col("rn").cast("long"), col("w"), col("cos"))
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
      .map { case (u, rs) =>
        u -> rs.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq }

  test("edges are sound: true cosines, pinned rank order, no self loops, no duplicates") {
    for (seed <- Seq(7L, 21L)) {
      val sn = corpus(seed, n = 60, dims = 12)
      val pts = sn.select("vec_id", "v").as[(Long, Seq[Double])]
        .collect().toMap
      val g = edgeMap(NnDescent.build(sn, kg = 4, rounds = 2, mixBuckets = 3))
      g.foreach { case (u, nbrs) =>
        assert(nbrs.map(_._2).distinct.size == nbrs.size, s"dup nbr at $u")
        assert(!nbrs.exists(_._2 == u), s"self loop at $u")
        assert(nbrs.map(_._1) == (1L to nbrs.size), s"rank gap at $u")
        // cosines are the true cosines of the cited pairs
        nbrs.foreach { case (_, w, c) =>
          assert(math.abs(c - cosRef(pts(u), pts(w))) < 5e-5, s"($u,$w)")
        }
        // rank order follows (cos desc, id asc)
        nbrs.sliding(2).foreach {
          case Seq((_, w1, c1), (_, w2, c2)) =>
            assert(c1 > c2 || (c1 == c2 && w1 < w2), s"order at $u")
          case _ =>
        }
      }
    }
  }

  test("each round weakly improves every node's neighbor list (the convergence invariant)") {
    val sn = corpus(seed = 33L, n = 80, dims = 10)
    val byRound = (0 to 3).map(r =>
      edgeMap(NnDescent.build(sn, kg = 3, rounds = r, mixBuckets = 4)))
    for (r <- 0 until 3; (u, prev) <- byRound(r)) {
      val next = byRound(r + 1).getOrElse(u, Seq.empty)
      // rounds=0 now truncates to kg like every other round (uniform
      // contract); comparing the kg-prefix stays valid either way:
      // candidates of round r+1 include round r's list, so the i-th best
      // cosine can only rise and the list can only lengthen toward kg
      val prevK = prev.take(3)
      assert(next.size >= prevK.size, s"round ${r + 1} shrank $u")
      prevK.zip(next).foreach { case ((_, _, cPrev), (_, _, cNext)) =>
        assert(cNext >= cPrev - 1e-12,
          s"round ${r + 1} worsened rank at $u: $cPrev -> $cNext")
      }
    }
    // and improvement actually happens somewhere (not vacuous)
    val gained = byRound(0).keys.count { u =>
      val a = byRound(0)(u).map(_._3).sum
      val b = byRound(3).getOrElse(u, Seq.empty).map(_._3).sum
      b > a + 1e-9
    }
    assert(gained > 10, s"only $gained nodes improved — fixture too easy")
  }
}
