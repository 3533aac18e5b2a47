package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}
import graft.ops.CacheScope

/** k-NN graph construction by NN-Descent (Dong, Moses & Li, WWW 2011) —
  * the graph-based member of the ANN family. Exact kNN is O(N²); NN-Descent
  * converges to a near-exact graph in a few rounds of "a neighbor of my
  * neighbor is probably my neighbor", with every round a keyed equi-join:
  *
  *   init:  up to `kg` ring-successors within each coarse cell (a lead()
  *          window — linear, no join; cell-mates are already likely
  *          neighbors, so the descent starts warm)
  *   round: candidates(u) = current(u) ∪ reversed(u) ∪ {w : w ∈ und(v),
  *          v ∈ und(u)}; keep the top-`kg` by (cos DESC NULLS LAST, id ASC)
  *
  * Candidates per round are O(N·kg²) — the property that makes graph
  * construction feasible at 100 TB. Everything is deterministic (window
  * init, pinned tie-breaks), so the finished graph is hash-checkable
  * against an independent engine — which MLlib's ANN paths cannot offer.
  *
  * Semantics notes, pinned: a node alone in its cell starts with no
  * out-edges; it acquires candidates through REVERSE edges in round 1 if
  * anything points at it, and stays absent from the graph only when fully
  * isolated (singleton cell, no in-edges). Zero-norm vectors rank last
  * (cos = NULL) and are kept only when a node has fewer than `kg`
  * non-degenerate candidates.
  */
object NnDescent {

  /** cos(a, b) with the zero-norm → null guard (the x126 convention). */
  private def cosAB =
    when(col("na") === 0.0 || col("nb") === 0.0, lit(null).cast("double"))
      .otherwise(V.dot(col("va"), col("vb")) / (col("na") * col("nb")))

  /** One ring-init edge set: up to `kg` lead() successors within each
    * group given by `grp` — linear, partitioned, no join. */
  private def ringInit(sn: DataFrame, kg: Int,
                       grp: org.apache.spark.sql.Column): DataFrame = {
    val wc = Window.partitionBy(grp).orderBy(col("vec_id"))
    sn.select(
      col("vec_id").as("u") +:
        (1 to kg).map(i => lead(col("vec_id"), i).over(wc).as(s"w$i")): _*)
      .select(col("u"),
              explode(array((1 to kg).map(i => col(s"w$i")): _*)).as("w"))
      .filter(col("w").isNotNull)
  }

  /** Build the graph over `sn` — columns (vec_id, cell, v: array<double>,
    * nrm: double), e.g. [[KMeansDet.assignWithVec]] output. Returns
    * (u, w, cos, rn): for each node u, its `rn`-th best neighbor w, with
    * rn <= kg on EVERY path — rounds = 0 returns the scored init ring
    * truncated to the same degree bound (not the raw up-to-2·kg union of
    * cell ring and mixing ring).
    *
    * Candidates propagate only along existing edges, so a cell-confined
    * init would freeze each cell into a closed component — true neighbors
    * across a cell boundary would be unreachable forever (the role random
    * init plays in the paper). `mixBuckets > 0` adds a second ring over
    * the hash-ish grouping vec_id % mixBuckets, whose members cut across
    * cells; the union is an expander-ish start that lets the descent
    * discover cross-cell neighbors while staying all-window, all-linear.
    *
    * Each round's undirected edge set is persisted under `scope` (it is
    * read three times) and the round count is a small constant — the
    * x14/x120 iteration hygiene. */
  def build(sn: DataFrame, kg: Int, rounds: Int, mixBuckets: Int = 0)
           (implicit scope: CacheScope): DataFrame = {
    require(kg > 0, s"graph degree must be positive, got $kg")
    require(rounds >= 0 && rounds <= 8,
      s"rounds must be in [0, 8] (each is a full candidate sweep), got $rounds")
    require(mixBuckets >= 0, s"mixBuckets must be >= 0, got $mixBuckets")
    val cellRing = ringInit(sn, kg, col("cell"))
    var g: DataFrame =
      if (mixBuckets == 0) cellRing
      else cellRing
        .union(ringInit(sn, kg, pmod(col("vec_id"), lit(mixBuckets.toLong))))
        .distinct()
    val va = sn.select(col("vec_id").as("u"), col("v").as("va"),
                       col("nrm").as("na"))
    val vb = sn.select(col("vec_id").as("w"), col("v").as("vb"),
                       col("nrm").as("nb"))
    for (_ <- 1 to rounds) {
      // symmetrize in ONE pass over g (explode both directions) — a
      // union of g with its own swap would evaluate g's scoring join +
      // window twice per round
      val und = scope.persist(
        g.select(explode(array(
            struct(col("u").as("a"), col("w").as("b")),
            struct(col("w").as("a"), col("u").as("b")))).as("e"))
          .select(col("e.a").as("u"), col("e.b").as("w"))
          .distinct())
      und.count() // eager: read three times below (the x114 lesson)
      val nn = und.toDF("u", "mid").join(und.toDF("mid", "w"), "mid")
        .select(col("u"), col("w")).filter(col("w") =!= col("u"))
      val cand = nn.union(und.select(col("u"), col("w"))).distinct()
      val wq = Window.partitionBy(col("u"))
        .orderBy(col("cos").desc_nulls_last, col("w").asc)
      g = cand.join(va, "u").join(vb, "w")
        .withColumn("cos", cosAB)
        .withColumn("rn", row_number().over(wq)).filter(col("rn") <= kg)
        .select(col("u"), col("w"), col("cos"), col("rn"))
    }
    if (rounds == 0) {
      // score + rank + truncate the init edges so the (u, w, cos,
      // rn <= kg) contract is UNIFORM across round counts — with
      // mixBuckets > 0 the raw init union holds up to 2·kg edges per
      // node (cell ring ∪ mixing ring), and returning more than kg from
      // this path only would be a silent contract exception
      val wq = Window.partitionBy(col("u"))
        .orderBy(col("cos").desc_nulls_last, col("w").asc)
      g = g.join(va, "u").join(vb, "w")
        .withColumn("cos", cosAB)
        .withColumn("rn", row_number().over(wq)).filter(col("rn") <= kg)
        .select(col("u"), col("w"), col("cos"), col("rn"))
    }
    g
  }
}
