package graft.operators

import graft.SparkSpec
import graft.ops.CacheScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NN-Descent against brute-force exact kNN on planted geometry, plus the
  * two structural contracts: cross-cell discovery through the mixing ring
  * (a cell-only init provably cannot find a mis-celled neighbor) and
  * partition invariance of every edge decision. */
class NnDescentSpec extends SparkSpec {
  import spark.implicits._
  implicit val scope: CacheScope = CacheScope.session

  /** Two tight, well-separated direction clusters in 4-d. Within-cluster
    * cosines ~1, cross-cluster ~0, so the exact kNN graph stays within
    * clusters and NN-Descent must reproduce it exactly. */
  private def fixture(cellOf: Long => Long): DataFrame = {
    val pts = // cluster A around +x (ids 0-5), cluster B around +y (10-15)
      (0L to 5L).map(i => (i, Seq(100.0, i.toDouble, 2.0 * i, 1.0))) ++
      (10L to 15L).map(i => (i, Seq((i - 10).toDouble, 100.0, 1.0, i - 9.0)))
    pts.map { case (id, v) =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (id, cellOf(id), v, nrm)
    }.toDF("vec_id", "cell", "v", "nrm")
  }

  private def cosRef(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  /** Brute-force exact top-k with the operator's tie-breaks. */
  private def exactKnn(sn: DataFrame, k: Int): Set[(Long, Long, Long)] = {
    val pts = sn.select("vec_id", "v").as[(Long, Seq[Double])].collect()
    pts.flatMap { case (u, vu) =>
      pts.filter(_._1 != u)
        .map { case (w, vw) => (w, cosRef(vu, vw)) }
        .sortBy { case (w, c) => (-c, w) }
        .take(k).zipWithIndex
        .map { case ((w, _), i) => (u, (i + 1).toLong, w) }
    }.toSet
  }

  private def edges(g: DataFrame): Set[(Long, Long, Long)] =
    g.select(col("u"), col("rn").cast("long"), col("w"))
      .as[(Long, Long, Long)].collect().toSet

  test("converges to the exact kNN graph on separated clusters") {
    val sn = fixture(id => if (id < 6) 0L else 1L)
    val g = NnDescent.build(sn, kg = 3, rounds = 2)
    assert(edges(g) == exactKnn(sn, 3))
  }

  test("mixing ring rescues a node assigned to the wrong cell; cell-only init cannot") {
    // id 5 (cluster A) mis-assigned to cell 1: with a cell-only init its
    // candidates are forever cluster-B nodes — its true neighbors are
    // unreachable no matter how many rounds run
    val sn = fixture(id => if (id < 5) 0L else 1L)
    val exact = exactKnn(sn, 3)
    val cellOnly = NnDescent.build(sn, kg = 3, rounds = 4)
    val ours5 = edges(cellOnly).filter(_._1 == 5L).map(_._3)
    assert(ours5.forall(_ >= 10L), s"cell-only init should trap id 5: $ours5")
    // one global mixing ring (mixBuckets = 1) restores discovery
    val mixed = NnDescent.build(sn, kg = 3, rounds = 4, mixBuckets = 1)
    assert(edges(mixed) == exact)
  }

  test("edge decisions are partition-invariant") {
    val sn = fixture(id => if (id < 6) 0L else 1L)
    val a = edges(NnDescent.build(sn, 3, 2, mixBuckets = 2))
    val b = edges(NnDescent.build(sn.repartition(7), 3, 2, mixBuckets = 2))
    assert(a == b)
  }

  test("rounds = 0 returns the scored init ring (contract shape holds)") {
    val sn = fixture(id => if (id < 6) 0L else 1L)
    val g = NnDescent.build(sn, kg = 2, rounds = 0)
    val out = edges(g)
    // ring init: each node points only forward within its cell
    assert(out.nonEmpty && out.forall { case (u, _, w) =>
      (u < 6) == (w < 6) && w > u })
  }

  test("fails loud on bad arguments") {
    val sn = fixture(_ => 0L)
    intercept[IllegalArgumentException](NnDescent.build(sn, 0, 2))
    intercept[IllegalArgumentException](NnDescent.build(sn, 3, 9))
    intercept[IllegalArgumentException](NnDescent.build(sn, 3, 2, -1))
  }
}
