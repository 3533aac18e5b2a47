package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Hand-planted DBSCAN fixture (eps=10, minPts=3) exercising every
  * semantic branch: a 3-point core clump, a border point one cell over,
  * a sub-minPts pair that stays noise DESPITE having neighbors, an
  * isolated noise singleton, and a negative-coordinate clump (floor-div
  * cells must agree with the oracle's `//` on negatives). */
class DbscanGridSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 10L
  private val minPts = 3L

  // (id, x, y)
  private val pts = Seq(
    (1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 4L), // clump A: mutual d = 3,4,5
    (4L, 12L, 0L),               // within 9 of id 2 only -> border of A
    (5L, 50L, 50L),              // isolated -> noise
    (6L, 100L, 100L), (7L, 103L, 104L), // d=5 pair, n=2 < minPts -> noise
    (8L, -101L, -101L), (9L, -104L, -102L), (10L, -101L, -106L) // clump B
  )

  private lazy val out: Map[Long, Row] =
    DbscanGrid.cluster(pts.toDF("id", "x", "y"), eps, minPts)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("cores, border, and noise are classified and labeled exactly") {
    def role(id: Long) = out(id).getAs[String]("role")
    def label(id: Long) = Option(out(id).getAs[java.lang.Long]("label"))
      .map(_.longValue)
    assert(out.size == 10)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(role(id) == "core", s"id $id")
      assert(label(id).contains(1L), s"id $id")
    }
    // border attaches across a cell boundary (cell (1,0) vs clump (0,0))
    assert(role(4L) == "border")
    assert(label(4L).contains(1L))
    // sub-minPts density stays noise even with neighbors present
    Seq(5L, 6L, 7L).foreach { id =>
      assert(role(id) == "noise", s"id $id")
      assert(label(id).isEmpty, s"id $id")
    }
    // negative-coordinate clump: own cluster, labeled by its min id
    Seq(8L, 9L, 10L).foreach { id =>
      assert(role(id) == "core", s"id $id")
      assert(label(id).contains(8L), s"id $id")
    }
  }

  test("n_eps counts include the point itself and exactly its eps-ball") {
    def n(id: Long) = out(id).getAs[Long]("n_eps")
    assert(n(1L) == 3L) // 1,2,3 (id 4 at d=12 is outside)
    assert(n(2L) == 4L) // 1,2,3 + border id 4 at d=9
    assert(n(4L) == 2L) // itself + id 2
    assert(n(5L) == 1L)
    assert(n(6L) == 2L && n(7L) == 2L)
  }

  test("the two clusters never merge and isolated cores self-label") {
    val labels = out.values
      .flatMap(r => Option(r.getAs[java.lang.Long]("label"))).toSet
    assert(labels == Set(1L, 8L))
    // a lone dense triple IS a cluster even with no external edges: drop
    // clump B's two partners so id 8 keeps >= minPts only via a tighter
    // planted trio around it
    val solo = Seq((8L, -101L, -101L), (9L, -100L, -101L),
                   (10L, -101L, -100L))
    val r = DbscanGrid.cluster(solo.toDF("id", "x", "y"), eps, minPts)
      .collect().map(x => x.getLong(0) -> x.getAs[java.lang.Long]("label"))
      .toMap
    assert(r.values.forall(_ == 8L))
  }

  test("fails loud on non-positive eps or minPts") {
    val df = pts.toDF("id", "x", "y")
    intercept[IllegalArgumentException](DbscanGrid.cluster(df, 0L, 3L))
    intercept[IllegalArgumentException](DbscanGrid.cluster(df, 10L, 0L))
  }
}
