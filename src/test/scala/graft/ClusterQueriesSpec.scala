package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Planted-fixture end-to-end tests for the x125/x126/x127 cluster suite:
  * 8 orthogonal unit axes seed the 8 init centroids; ids 8..11 are scaled
  * copies of axes 0..3 (cosine exactly 1 with their partner), so the
  * k-means blocks, the SemDeDup drop set, and the kept-id evidence are all
  * hand-predictable. */
class ClusterQueriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_cluster_fixture").toString
    val axes = (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(8)(j => if (j == i) 1f else 0f))
    }
    val copies = (0 until 4).map { i =>
      ((8 + i).toLong, Seq.tabulate(8)(j => if (j == i) 1.01f else 0f))
    }
    (axes ++ copies).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("x125: copies land in their partner axis's cell") {
    val asg = ClusterQueries.queries("x125_kmeans_embed")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg.size == 12)
    (0 until 4).foreach { i => assert(asg((8 + i).toLong) == asg(i.toLong)) }
    // the 8 originals occupy 8 distinct cells (init = their own vectors)
    assert((0 until 8).map(i => asg(i.toLong)).toSet.size == 8)
  }

  test("x126: each copy is dropped with its axis as the kept evidence") {
    val rows = ClusterQueries.queries("x126_semantic_dedup")(spark, dir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 9L, 10L, 11L))
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_id") == r.getLong(0) - 8)
      assert(r.getAs[Double]("max_cos") == 1.0)
    }
  }

  test("x128: only batch ids are screened, against frozen corpus cells") {
    // split: corpus = vec_id % 10 < 8 → {0..7, 10, 11}; batch = {8, 9}.
    // ids 10/11 are near-dups INSIDE the corpus — they must not appear in
    // the output (corpus-internal pairs were adjudicated at ingest).
    val rows = ClusterQueries.queries("x128_semantic_incremental")(spark, dir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 9L))
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_id") == r.getLong(0) - 8)
      assert(r.getAs[Double]("max_cos") == 1.0)
    }
  }

  test("x127: one recall row per query, hits within [0, 3]") {
    val rows = ClusterQueries.queries("x127_ivf_recall")(spark, dir)
      .collect()
    assert(rows.length == 12)
    assert(rows.forall { r =>
      val h = r.getAs[Long]("hits"); h >= 0 && h <= 3
    })
    // a copy's exact top-1 is its partner, which shares its cell — the
    // probed-cell search can never miss it, so every copy has hits >= 1
    val hits = rows.map(r => r.getLong(0) -> r.getAs[Long]("hits")).toMap
    (8 to 11).foreach { i => assert(hits(i.toLong) >= 1) }
  }

  test("x147: batch nodes get edges from frozen cells + one hop; corpus never re-descended") {
    // corpus = {0..7, 10, 11}, batch = {8, 9} (the % 10 split); copy 8's
    // frozen cell holds axis 0 -> rank-1 neighbor is 0 at cos 1; same
    // for 9 and axis 1. Only batch ids appear as sources.
    val rows = ClusterQueries.queries("x147_knn_incremental")(spark, dir)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == Set(8L, 9L))
    val top = rows.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(top(8L) == ((0L, 1.0)))
    assert(top(9L) == ((1L, 1.0)))
    // every cited neighbor is a corpus id (the batch is never an edge
    // target — its internal pairs are tomorrow's corpus build)
    assert(rows.forall { r =>
      val n = r.getLong(2); n % 10 < 8 })
  }

  /** Same geometry but with LABELS: axis i carries label i, the four
    * scaled copies carry label 99 — so each copy's hardest same-cell
    * different-label negative is exactly its axis partner at cos 1. */
  private lazy val ldir: String = {
    val d = Files.createTempDirectory("graft_cluster_lab_fixture").toString
    val axes = (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(8)(j => if (j == i) 1f else 0f), i)
    }
    val copies = (0 until 4).map { i =>
      ((8 + i).toLong, Seq.tabulate(8)(j => if (j == i) 1.01f else 0f), 99)
    }
    (axes ++ copies).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("x145: each copy's hardest negative is its axis partner; same-label pairs excluded") {
    val rows = ClusterQueries.queries("x145_hard_negatives")(spark, ldir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    (0 until 4).foreach { i =>
      // anchor = copy 8+i: rank-1 negative is axis i (different label, cos 1)
      assert(rows((8L + i, 1)) == ((i.toLong, 99L, i.toLong, 1.0)))
      // anchor = axis i: rank-1 negative is its copy (label 99, cos 1)
      assert(rows((i.toLong, 1)) == ((8L + i, i.toLong, 99L, 1.0)))
    }
    // never a same-label pair anywhere
    assert(rows.values.forall { case (_, la, lb, _) => la != lb })
    // axes 4..7 are alone in their cells: no candidates, absent
    (4 to 7).foreach { i => assert(!rows.contains((i.toLong, 1))) }
  }

  test("x146: quota keeps the most central vector per cell — exactly one from every cell") {
    val rows = ClusterQueries.queries("x146_cell_downsample")(spark, ldir)
      .collect()
    // 8 cells, sizes {2,2,2,2,1,1,1,1} -> ceil(n/4) = 1 kept per cell
    assert(rows.length == 8)
    assert(rows.forall(_.getInt(2) == 1))
    // singleton cells keep their only member; in the 2-member cells the
    // COPY wins on distance, not tie-break: 1.01f widens to the double
    // 1.00999999…, the 6-dp-rounded centroid coordinate is 1.005, and
    // |1.00999999… − 1.005| < |1 − 1.005| by ~1e-9 — float-to-double
    // widening is part of the pinned arithmetic (the oracle agrees, so
    // this is semantics, not noise)
    assert(rows.map(_.getLong(0)).toSet ==
      Set(4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L))
  }
}
