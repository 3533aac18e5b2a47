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
  * the reachable node set — is the probe side.
  *
  * Each level's frontier and visited set are lazily `localCheckpoint`ed
  * (the pattern of
  * [[graft.operators.DedupOperators.clusterPairsWithStatus]]): one count
  * job per level materializes both, truncating lineage so the logical
  * plan — and Catalyst analysis time — stays O(1) per level instead of
  * growing with the union chain, and superseded intermediates are
  * unpersisted immediately rather than leaking for the JVM lifetime.
  */
object GraphOps {

  /** Minimum-hop distances from `seeds` over directed `edges`.
    *
    * @param edges   DataFrame with `src` and `dst` columns (directed; pass
    *                both directions for an undirected graph)
    * @param seeds   DataFrame with a `node` column (distance 0)
    * @param maxDepth levels to expand (bounds state and DAG depth; the loop
    *                 exits early once a frontier drains)
    * @return (node, dist) — one row per reached node, dist = min hops ≤ maxDepth
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(false)
    var frontier = visited
    var visitedCount = visited.count()
    var d = 1
    var exhausted = false
    while (d <= maxDepth && !exhausted) {
      val prevFrontier = frontier
      val prevVisited = visited
      frontier = prevFrontier.join(e, prevFrontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(prevVisited, Seq("node"), "left_anti")
        .withColumn("dist", lit(d.toLong))
        .localCheckpoint(false)
      visited = prevVisited.unionAll(frontier).localCheckpoint(false)
      // ONE job per level: counting the new visited set materializes both
      // checkpoints (frontier is its dependency) and doubles as the
      // early-exit test — an unchanged count means the frontier drained
      val newCount = visited.count()
      exhausted = newCount == visitedCount
      visitedCount = newCount
      // the superseded frontier/visited are never read again (the new
      // visited is materialized above, so nothing recomputes through them)
      if (prevFrontier ne prevVisited) prevFrontier.unpersist()
      prevVisited.unpersist()
      d += 1
    }
    if (frontier ne visited) frontier.unpersist() // maxDepth=0: same df
    e.unpersist()
    visited
  }
}
