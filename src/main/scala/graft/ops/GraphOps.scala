package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph traversal primitives.
  *
  * Level-synchronous BFS: each level is ONE equi-join of the current
  * frontier against the edge list plus one anti join against the visited
  * set, so the job-DAG depth equals the traversal depth — never the row
  * count — and every level is fully parallel. The anti join makes
  * first-visit = minimum-hop by construction.
  *
  * At 100 TB the edge list is the big side: it stays partitioned by `src`
  * across levels (one shuffle, reused), while the frontier — bounded by
  * the reachable node set — is the probe side. Frontiers are persisted
  * per level because each is consumed twice (join + union).
  */
object GraphOps {

  /** Minimum-hop distances from `seeds` over directed `edges`.
    *
    * @param edges   DataFrame with `src` and `dst` columns (directed; pass
    *                both directions for an undirected graph)
    * @param seeds   DataFrame with a `node` column (distance 0)
    * @param maxDepth levels to expand (bounds state and DAG depth)
    * @return (node, dist) — one row per reached node, dist = min hops ≤ maxDepth
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
    var frontier = visited
    for (d <- 1 to maxDepth) {
      frontier = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(d.toLong))
        .persist()
      visited = visited.unionAll(frontier)
    }
    visited
  }
}
