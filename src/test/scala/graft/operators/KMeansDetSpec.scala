package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic-kmeans contract tests: hand-computed assignment on a
  * separable fixture, tie-break to the smallest cell id, emptied-cell
  * carry-over, and partition-invariance of the final assignment. */
class KMeansDetSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("separable 2-cluster fixture converges to the hand assignment") {
    // ids 0,1 near the origin; ids 2..5 near (10,10). init c0=(0,0),
    // c1=(0.4,0): after one mean update c0=(0,0) [only p0], c1=mean of
    // {p1..p5}; iteration 2 re-splits into the true clusters.
    val e = df(
      0L -> Seq(0f, 0f), 1L -> Seq(0.4f, 0f),
      2L -> Seq(10f, 10f), 3L -> Seq(10f, 10.5f),
      4L -> Seq(9.5f, 10f), 5L -> Seq(10.2f, 9.8f))
    val m = KMeansDet.fit(e, k = 2, iters = 2)
    val asg = KMeansDet.assign(e, m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg(0L) == 0 && asg(1L) == 0)
    assert(Set(2L, 3L, 4L, 5L).forall(asg(_) == 1))
    // final centroid of cell 1 is the rounded mean of the far points
    assert(m.centroids(1).map(x => math.rint(x * 10) / 10).toSeq
      == Seq(9.9, 10.1))
  }

  test("equidistant point goes to the smallest cell id") {
    // p2 sits exactly between the two init centroids; one iteration, no
    // update drift on the others matters — assignment must pick cell 0.
    val e = df(0L -> Seq(0f, 0f), 1L -> Seq(2f, 0f), 2L -> Seq(1f, 0f))
    val m = KMeansDet.Model(Array(Array(0.0, 0.0), Array(2.0, 0.0)))
    val asg = KMeansDet.assign(e, m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg(2L) == 0)
  }

  test("all-identical corpus: cell 1 empties and keeps its init centroid") {
    val e = df((0L to 5L).map(i => i -> Seq(1f, 1f)): _*)
    val m = KMeansDet.fit(e, k = 2, iters = 2)
    // every row ties to cell 0; cell 1 never receives members, so its
    // centroid must survive unchanged (never NaN)
    assert(m.centroids(1).toSeq == Seq(1.0, 1.0))
    assert(m.centroids(0).forall(!_.isNaN))
    val asg = KMeansDet.assign(e, m).collect()
    assert(asg.forall(_.getLong(1) == 0L))
  }

  test("assignment is invariant under repartitioning") {
    val base = (0L until 40L)
      .map(i => i -> Seq((i % 7).toFloat, (i % 11).toFloat, i.toFloat / 40))
    val e1 = base.toDF("vec_id", "embedding")
    val e2 = base.toDF("vec_id", "embedding").repartition(7)
    val m1 = KMeansDet.fit(e1, k = 4, iters = 2)
    val m2 = KMeansDet.fit(e2, k = 4, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    val a1 = KMeansDet.assign(e1, m1).orderBy(col("vec_id")).collect()
    val a2 = KMeansDet.assign(e2, m2).orderBy(col("vec_id")).collect()
    assert(a1.map(_.toSeq).toSeq == a2.map(_.toSeq).toSeq)
  }

  test("literal and join argmin forms are value-identical across the k threshold") {
    // the k<=16 literal projection and the large-k broadcast-join form
    // must agree on every assignment, including ties — same distance
    // expression, same (dist, cell) tie-break
    import org.apache.spark.sql.functions.col
    val pts = (0L until 60L)
      .map(i => i -> Seq((i % 5).toFloat, (i % 9).toFloat, (i % 2).toFloat))
    val e = pts.toDF("vec_id", "embedding")
      .select(col("vec_id").as("_id"),
              graft.functions.VectorFunctions.toDouble(col("embedding")).as("_v"))
    // duplicate points guarantee exact distance ties hit the tie-break
    val m = KMeansDet.Model(
      (0 until 20).map(i => Array((i % 5).toDouble, (i % 9).toDouble,
                                  (i % 2).toDouble)).toArray)
    val lit = KMeansDet.assignPassLiteral(e, m)
      .select("_id", "_cell").collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1).toSeq
    val join = KMeansDet.assignPassJoin(e, m)
      .select("_id", "_cell").collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1).toSeq
    assert(lit == join)
  }

  test("fit fails loud when the corpus has fewer rows than k") {
    val e = df(0L -> Seq(0f), 1L -> Seq(1f))
    val err = intercept[IllegalArgumentException] {
      KMeansDet.fit(e, k = 3, iters = 1)
    }
    assert(err.getMessage.contains("init needs"))
  }
}
