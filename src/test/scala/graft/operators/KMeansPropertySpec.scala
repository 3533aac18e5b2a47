package graft.operators

import graft.SparkSpec

/** Randomized equivalence: [[KMeansDet]] (either argmin form) against a
  * straight-line pure-Scala Lloyd's implementing the documented contract
  * — id-rank init, dist = dot(v,v) − 2·dot(v,c) + dot(c,c) with
  * sequential folds, (dist, cell) tie-break, 6-dp-rounded means,
  * empty-cell carry-over. The same device as the banded-MinHash reference
  * spec: the distributed operator must match a reference small enough to
  * be obviously correct, across random corpora and both sides of the
  * literal/join form threshold. */
class KMeansPropertySpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference fit+assign: returns (centroids, assignment by id). */
  private def reference(pts: Seq[(Long, Array[Double])], k: Int, iters: Int)
      : (Array[Array[Double]], Map[Long, Int]) = {
    var cents = pts.sortBy(_._1).take(k).map(_._2.clone).toArray
    def assign(): Map[Long, Int] =
      pts.map { case (id, v) =>
        val dv = dot(v, v)
        var best = -1; var bd = Double.MaxValue
        for (c <- cents.indices) {
          val d = dv - 2.0 * dot(v, cents(c)) + dot(cents(c), cents(c))
          if (d < bd) { bd = d; best = c } // strict < keeps the min cell id
        }
        id -> best
      }.toMap
    for (_ <- 1 to iters) {
      val a = assign()
      val byCell = pts.groupBy(p => a(p._1))
      cents = cents.indices.map { c =>
        byCell.get(c) match {
          case Some(members) =>
            val d = members.head._2.length
            Array.tabulate(d) { j =>
              round6(members.map(_._2(j)).sum / members.size)
            }
          case None => cents(c)
        }
      }.toArray
    }
    (cents, assign())
  }

  test("fit+assign matches the pure-Scala reference on random corpora, both argmin forms") {
    val rnd = new scala.util.Random(20260815L)
    for ((n, dims, k, iters) <- Seq((60, 6, 4, 2),   // literal form
                                    (45, 3, 7, 3),   // literal form, deep
                                    (80, 5, 20, 2))) { // join form (k > 16)
      val pts = (0L until n.toLong).map { id =>
        id -> Array.fill(dims)((rnd.nextInt(13) - 6) / 4.0)
      }
      // float-cast input like the real table; reference sees the same
      // widened values
      val df = pts.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
        .toDF("vec_id", "embedding")
      val widened = pts.map { case (id, v) =>
        id -> v.map(x => x.toFloat.toDouble)
      }
      val (refC, refA) = reference(widened, k, iters)
      val m = KMeansDet.fit(df, k, iters)
      assert(m.centroids.map(_.toSeq).toSeq == refC.map(_.toSeq).toSeq,
        s"centroids diverged at n=$n k=$k")
      val asg = KMeansDet.assign(df, m).collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(asg == refA, s"assignment diverged at n=$n k=$k")
    }
  }
}
