package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CheckpointOps.free

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
    * @param smallFrontier when true (default), each level broadcasts the
    *                 materialized frontier and visited set against the
    *                 once-cached edge list — ZERO per-level shuffle or sort
    *                 of the edges, the right plan whenever the reachable
    *                 set fits an executor (a checkpointed frontier scans as
    *                 an RDD with unknown stats, so Catalyst would never
    *                 pick this broadcast on its own). Set false for
    *                 traversals whose frontier itself is cluster-scale:
    *                 the edge list is then hash-partitioned by `src` once
    *                 and every level reuses that exchange, shuffling only
    *                 the frontier.
    * @return (node, dist) — one row per reached node, dist = min hops ≤ maxDepth
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxDepth: Int,
          smallFrontier: Boolean = true): DataFrame = {
    // hash-partition the edge list by the join key BEFORE caching: the
    // cached InMemoryRelation keeps that outputPartitioning, so every
    // level's frontier join reuses it and only the (small) frontier side
    // shuffles — the edge list crosses the wire once, not once per level
    val e0 = edges.select(col("src"), col("dst"))
    val e = (if (smallFrontier) e0 else e0.repartition(col("src"))).persist()
    val seed = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(false)
    seed.count()
    // levels(i) = the checkpointed frontier of depth i — visited at any
    // point is the flat union of these leaves (≤ maxDepth+1 branches, no
    // growing join/union lineage to re-analyze)
    var levels = Vector(seed)
    var frontier = seed
    var d = 1
    var exhausted = false
    while (d <= maxDepth && !exhausted) {
      val visited = levels.reduce(_ unionAll _)
      val expanded =
        if (smallFrontier)
          // cached edges scan + broadcast-hash probe: the 1-row-per-edge
          // pass is map-side; nothing about the edge list moves or sorts
          e.join(broadcast(frontier), frontier("node") === e("src"))
        else
          frontier.join(e, frontier("node") === e("src"))
      frontier = expanded
        .select(col("dst").as("node")).distinct()
        .join(if (smallFrontier) broadcast(visited) else visited,
              Seq("node"), "left_anti")
        .withColumn("dist", lit(d.toLong))
        .localCheckpoint(false)
      // ONE job per level: the count materializes the new frontier's
      // checkpoint and drives the early exit the moment it drains
      exhausted = frontier.count() == 0L
      if (!exhausted) levels :+= frontier
      d += 1
    }
    // consolidate into a single checkpointed result so exactly ONE cached
    // block set survives the call — then free every per-level leaf
    val result = levels.reduce(_ unionAll _).localCheckpoint(false)
    result.count()
    levels.foreach(free)
    if (exhausted) free(frontier) // the drained, non-kept frontier
    e.unpersist()
    result
  }

  /** Integer-quantized PageRank: ranks live as longs scaled by `scale`
    * (1e9 = rank 1.0), so every step is integer arithmetic — `DIV` for
    * the out-degree split, `(s*85) DIV 100` for the damping — and the
    * result is bit-identical on any engine and any aggregation order
    * (long sums commute; double sums do not). The truncation the
    * quantization introduces is ≤ outdeg ulps per node per round —
    * irrelevant for ranking, essential for a cross-engine hash check.
    *
    * One shuffle-heavy join per iteration is inherent to PageRank; what
    * must NOT grow per iteration is plan lineage or cached state. The
    * per-edge state (u, v, outdeg) is built in a single pass — an
    * unordered count window rides the same exchange that keys the edges
    * by `u` — and stays persisted as the one cached frame; each round's
    * ranks are `localCheckpoint`ed (one job, flat lineage) and the
    * superseded round is freed immediately ([[CheckpointOps.free]]).
    *
    * Dangling nodes: callers pass a symmetrized edge list (every node
    * has out-degree ≥ 1), so no mass-leak redistribution is needed.
    *
    * @param edges directed (u, v) pairs
    * @param iters fixed iteration count (the oracle unrolls the same)
    * @param smallRanks when true (default), each round broadcasts the
    *                 checkpointed rank table against the cached edge
    *                 list — zero per-round shuffle or sort of the edges
    *                 (ranks are node-sized, edges edge-sized; for most
    *                 graphs |V| ≪ |E| and the rank row is 16 bytes).
    *                 Set false when the node set itself is cluster-scale:
    *                 rounds then shuffle ranks into an ordinary keyed
    *                 join against the once-cached edges.
    * @return (node, rank_q) — rank scaled by `scale`, all nodes
    */
  def pageRank(edges: DataFrame, iters: Int,
               scale: Long = 1000000000L,
               smallRanks: Boolean = true): DataFrame = {
    // (u, v, d) — the static per-edge state every round probes. Degrees
    // come from ONE pass over the edges (an unordered count window =
    // partial + final agg fused into the same shuffle that keys the
    // frame by u) instead of a separate groupBy + self-join — one
    // materialization, one cached frame, no second exchange.
    val linked = edges.select(col("u"), col("v"))
      .withColumn("d", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("u"))))
      .persist()
    var ranks = linked.select(col("u").as("node")).distinct()
      .withColumn("r", lit(scale))
      .localCheckpoint(false)
    ranks.count()
    val teleport = scale * 15 / 100
    for (_ <- 1 to iters) {
      val next = linked
        .join(if (smallRanks) broadcast(ranks) else ranks,
              linked("u") === ranks("node"))
        .select(col("v"), expr("r DIV d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
        .select(col("v").as("node"),
                (lit(teleport) + expr("(s * 85) DIV 100")).as("r"))
        .localCheckpoint(false)
      next.count()
      free(ranks)
      ranks = next
    }
    linked.unpersist()
    ranks
  }

  /** Single-source shortest paths with NON-NEGATIVE integer weights —
    * the weighted upgrade of [[bfs]] (min-plus semiring instead of hop
    * counting). Bellman-Ford rounds: each round relaxes every edge once
    * via ONE keyed equi-join of the edge list against the current
    * distance frame and re-minimizes per node — converging in ≤
    * shortest-path-hop-diameter rounds, each fully parallel, with the
    * same localCheckpoint + free lineage hygiene as [[pageRank]]. Early
    * exit on the (reached-count, Σdist) fixpoint: both are monotone
    * (reach grows, distances only shrink), so equality means no edge
    * can relax further. Distances flow src ← dst: `dist(u) =
    * min over edges (u,v,w) of w + dist(v)` — pass reversed edges for
    * the source-outward orientation.
    *
    * @param edges (src, dst, w) with w >= 0 (negative weights violate
    *              the early-exit argument and are the caller's bug)
    * @param seeds (node) rows at distance 0
    * @return (node, dist) for every node that reaches a seed */
  def shortestPaths(edges: DataFrame, seeds: DataFrame,
                    maxIters: Int = 30): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w")).persist()
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(false)
    def stats(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum(col("dist")), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var cur = stats(dist)
    var done = cur._1 == 0L
    var i = 0
    while (i < maxIters && !done) {
      val relaxed = e.join(dist, e("dst") === dist("node"))
        .select(e("src").as("node"), (col("w") + col("dist")).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
      val s = stats(next)
      free(dist)
      dist = next
      done = s == cur
      cur = s
      i += 1
    }
    e.unpersist()
    // converged ⇔ one full round changed nothing; returning a partially
    // relaxed frame would be silently wrong distances
    require(done, s"shortestPaths: not converged after $maxIters rounds " +
      "— raise maxIters (hop diameter exceeds it) or check edge weights")
    dist
  }

  /** Root and depth for every node of a FOREST, given exactly one
    * `(node, parent)` row per node (`parent` NULL ⇒ root). Every
    * non-null parent must itself appear as a node — a dangling parent
    * is the caller's bug and FAILS LOUD (row-loss check per round)
    * instead of silently dropping its subtree.
    *
    * Pointer doubling: state(node) = (anc, d) where anc is the
    * 2^i-hop ancestor clamped at the root and d the hop count to it.
    * Each round joins the state against itself — anc := anc's anc,
    * d := d + anc's d — so a height-h hierarchy resolves in ⌈log₂ h⌉
    * keyed equi-joins: the job-DAG depth is LOGARITHMIC in the
    * hierarchy height, never linear like row-at-a-time recursion, and
    * no round depends on frontier size (the BFS alternative serializes
    * on depth and loses root attribution). Rounds are
    * `localCheckpoint`ed flat and the superseded round freed (the
    * pageRank pattern); one agg job per round drives both the
    * early-exit fixpoint (Σd stops growing ⇔ every anc is a root) and
    * the row-conservation check. */
  def rootAndDepth(parents: DataFrame, maxIters: Int = 20): DataFrame = {
    var state = parents.select(col("node"),
        coalesce(col("parent"), col("node")).as("anc"),
        when(col("parent").isNull, 0L).otherwise(1L).as("d"))
      .localCheckpoint(false)
    def stats(df: DataFrame): (Long, Long) = {
      val r = df.agg(coalesce(sum(col("d")), lit(0L)),
                     count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var (total, n0) = stats(state)
    var done = n0 == 0L
    var i = 0
    while (i < maxIters && !done) {
      val m = state.select(col("node").as("_n"), col("anc").as("_a"),
                           col("d").as("_d"))
      val next = state.join(m, state("anc") === m("_n"))
        .select(state("node"), col("_a").as("anc"),
                (state("d") + col("_d")).as("d"))
        .localCheckpoint(false)
      val (t, n) = stats(next)
      require(n == n0,
        s"rootAndDepth: dangling parent dropped ${n0 - n} nodes in round $i")
      free(state)
      state = next
      done = t == total
      total = t
      i += 1
    }
    // a forest of height ≤ 2^maxIters always converges; a CYCLE never
    // does (d grows every round) — fail loud, never return wrong roots
    require(done,
      s"rootAndDepth: no fixpoint after $maxIters doubling rounds — " +
        "cycle in the parent relation?")
    state.select(col("node"), col("anc").as("root"), col("d").as("depth"))
  }

  /** K-CORE of an undirected graph: the maximal subgraph in which every
    * node keeps degree ≥ k — the degeneracy peel that separates dense
    * community structure from pendant trees and chains (web-graph spam
    * filtering, co-purchase community mining). Iterative peeling: each
    * round recomputes degrees over the REMAINING edges (one keyed agg)
    * and drops every node below k via two semi joins; the edge frame
    * shrinks monotonically, each round is ONE Spark job (lazy
    * localCheckpoint materialized by the fixpoint count — the
    * [[shortestPaths]]/clusterPairs loop hygiene, previous round's
    * blocks freed eagerly), and the fixpoint test is "edge count
    * unchanged" — monotone, so equality proves no node can fall below k
    * anymore. Converges in ≤ peel-depth rounds (how many onion layers
    * the graph has), NOT diameter; fails loud if `maxRounds` is
    * exhausted rather than returning a half-peeled subgraph.
    *
    * @param edges (src, dst) undirected pairs, either orientation, dups
    *              tolerated (symmetrized + distinct internally)
    * @return (node, degree) for every k-core member, degree counted
    *         within the core */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 32): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1, got $k")
    // self-loops are dropped: a (v,v) edge survives symmetrize+distinct as
    // ONE row, silently adding 1 to v's degree — enough to keep a node in
    // the core on the strength of a loop (ADVICE r10)
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
    var cur = sym.localCheckpoint(false)
    var n = cur.count()
    var rounds = 0
    var done = n == 0L
    while (!done && rounds < maxRounds) {
      val next = kCoreRound(cur, k).localCheckpoint(false)
      val m = next.count()
      free(cur)
      cur = next
      done = m == n || m == 0L
      n = m
      rounds += 1
    }
    require(done, s"kCore: no fixpoint within $maxRounds rounds — the " +
      "peel depth exceeds the bound; raise maxRounds")
    cur.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** One [[kCore]] peel round over the surviving edge frame: keyed degree
    * agg, then both endpoints must survive via two semi joins. `keep` is
    * node-sized (data-sized at scale) — pinned shuffle_hash like the other
    * stats-less loop joins so the strategy never flips round-to-round.
    * `private[graft]` so PlanShapeSpec pins exactly the plan the loop
    * executes. */
  private[graft] def kCoreRound(cur: DataFrame, k: Int): DataFrame = {
    val deg = cur.groupBy(col("src")).agg(count(lit(1)).as("_n"))
    val keep = deg.filter(col("_n") >= k).select(col("src"))
    cur
      .join(keep.hint("shuffle_hash"), Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("src", "dst").hint("shuffle_hash"),
            Seq("dst"), "left_semi")
  }
}
