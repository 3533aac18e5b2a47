package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CacheScope

/** Deterministic grid-blocked DBSCAN over 2-D integer points — the
  * density-based complement to [[KMeansDet]] (which always produces k
  * cells regardless of structure, DBSCAN discovers the cluster count and
  * isolates noise; reference has no clustering at all — this extends the
  * engine's curation toolkit the same way x102/x123 extended linkage).
  *
  * Semantics (classic DBSCAN, Ester et al. 1996, with every
  * implementation-defined choice pinned):
  *   - N_eps(p) = points within L2 distance `eps` of p, INCLUDING p
  *     itself (the standard |N_eps(p)| >= minPts core test);
  *   - core points connected within eps form one cluster, labeled by the
  *     SMALLEST core id in the component (min-label components — the
  *     same contract as [[DedupOperators.clusterPairs]]);
  *   - a border point (non-core within eps of >= 1 core) takes the
  *     MINIMUM label among its core neighbors' clusters — classic DBSCAN
  *     leaves border assignment scan-order-dependent; this pins it;
  *   - noise points get a null label and role 'noise'.
  *
  * Candidate generation is the q29 gap-cell device in 2-D: each point
  * lands in grid cell (floor(x/eps), floor(y/eps)); any two points
  * within eps are at most one cell apart on each axis, so the 9-offset
  * equi-join over (cx, cy) finds EVERY eps-pair while probing nothing
  * beyond the 3x3 neighborhood. All arithmetic is integer (squared L2 vs
  * eps² — no sqrt, no FP), so every decision is restatable in the oracle.
  *
  * Scale shape (100 TB): pair count is bounded by 9·Σ|cell|² — the true
  * eps-neighborhood workload, governed by cell occupancy exactly like
  * x123's block cap governs linkage (a dense region IS quadratic in its
  * own population; occupancy-cap purging is the production defense and
  * composes here unchanged). Everything downstream touches only
  * materialized pairs: the neighbor count is one keyed agg, core-core
  * component labeling runs [[DedupOperators.clusterPairs]] (O(log
  * diameter) pointer-jumping rounds over core edges only), border
  * attachment is one more keyed agg. No cartesian products, no
  * broadcast of data-sized frames.
  */
object DbscanGrid {

  /** Cluster `pts` — columns (id: long, x: long, y: long) — returning
    * (id, x, y, n_eps, role, label) with role in {core, border, noise}
    * and label = min id of the cluster (null for noise). Coordinates may
    * be negative (floor-division cells agree with the oracle's `//`);
    * |x|, |y| must stay below ~2^31 so the squared distances fit a Long.
    */
  def cluster(pts: DataFrame, eps: Long, minPts: Long)
             (implicit scope: CacheScope): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(minPts > 0, s"minPts must be positive, got $minPts")
    val eps2 = eps * eps
    val cells = pts.select(col("id"), col("x"), col("y"),
      floor(col("x") / eps.toDouble).cast("long").as("cx"),
      floor(col("y") / eps.toDouble).cast("long").as("cy"))
    val offsets = for { dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L) }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val a = cells
      .withColumn("_o", explode(array(offsets: _*)))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
              (col("cx") + col("_o.dx")).as("cx"),
              (col("cy") + col("_o.dy")).as("cy"))
    val b = cells.select(col("id").as("id_b"), col("x").as("xb"),
                         col("y").as("yb"), col("cx"), col("cy"))
    // ordered pairs, both directions, self included (dist 0): each
    // ordered (a, b) matches exactly one offset — no dedup needed
    val pairs = scope.persist(
      a.join(b, Seq("cx", "cy"))
        .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
                (col("ya") - col("yb")) * (col("ya") - col("yb")) <= eps2)
        .select(col("id_a"), col("id_b")))
    // eager: three downstream joins read this frame — lazily cached it
    // races its own first materialization (the x114/x128 lesson)
    pairs.count()
    val neigh = pairs.groupBy(col("id_a")).agg(count(lit(1)).as("n_eps"))
      .select(col("id_a").as("id"), col("n_eps"))
    val coreSet = neigh.filter(col("n_eps") >= minPts).select(col("id"))
    val coreEdges = pairs
      .join(coreSet.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(coreSet.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
      .filter(col("id_a") < col("id_b"))
    // isolated cores (no core neighbor) label themselves via coalesce
    val labels = DedupOperators.clusterPairs(coreEdges)
    val coreLab = coreSet.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    val borderLab = pairs
      .join(coreSet.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .join(coreLab.select(col("id").as("id_b"), col("label")), Seq("id_b"))
      .groupBy(col("id_a")).agg(min(col("label")).as("label"))
      .select(col("id_a").as("id"), col("label"))
    pts.select(col("id"), col("x"), col("y"))
      .join(neigh, Seq("id"))
      .join(coreLab.withColumnRenamed("label", "_cl"), Seq("id"), "left")
      .join(borderLab.withColumnRenamed("label", "_bl"), Seq("id"), "left")
      .select(col("id"), col("x"), col("y"), col("n_eps"),
        when(col("_cl").isNotNull, lit("core"))
          .when(col("_bl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("_cl"), col("_bl")).as("label"))
  }
}
