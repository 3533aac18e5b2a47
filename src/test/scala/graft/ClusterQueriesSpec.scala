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
}
