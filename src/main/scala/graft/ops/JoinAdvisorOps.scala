package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based join-order advisor — x106's pairwise size ranking and
  * b07's greedy consumption of it, extracted as a reusable `ops` API so
  * user pipelines can consult the same stats a cost-based optimizer
  * would, without moving data.
  *
  * Contract: [[sketch]] collapses a relation's join-key column to an
  * O(d·w)-cell CMS frame (d=4 rows of w=512 buckets — 2048 cells
  * regardless of relation size; persist it, or write it at rest next to
  * the table as a stats artifact). [[advise]] joins sketches cell-wise
  * to estimate every pairwise inner-join cardinality (min over rows of
  * the bucket-count inner products — the CMS upper-bound estimator) and
  * collects them in ONE union → ONE job: N(N−1)/2 rows, certified small
  * by construction (the b05 probe / b07 decision precedent — this is
  * the stats CONSULTATION, not data movement). [[JoinAdvice.greedyOrder]]
  * is the pairwise-heuristic order: cheapest estimated pair first, then
  * ascending cheapest-link extension — the greedy a Selinger-style
  * optimizer would seed with, honest about being pairwise (it never
  * sketches intermediates).
  *
  * Estimates are upper bounds with md5-uniform buckets; collisions only
  * ever INFLATE an estimate, and both the estimate and the tie-break
  * (est, then name) are deterministic, so the advised order is stable
  * across runs and engines. b07 executes the advice end-to-end and
  * audits estimate vs exact first-join size per round.
  */
object JoinAdvisorOps {

  final case class PairEstimate(a: String, b: String, est: Long) {
    def label: String = s"$a-$b"
    def touches(n: String): Boolean = n == a || n == b
  }

  /** All pairwise estimates. Order of construction does not matter: the
    * (est, a, b) ascending invariant bestPair/greedyOrder depend on is
    * enforced HERE, not assumed of the caller (ADVICE r10 — a directly
    * constructed advice with unsorted pairs silently picked a wrong
    * opening pair). */
  final case class JoinAdvice(pairs: Seq[PairEstimate]) {
    private val ordered: Seq[PairEstimate] =
      pairs.sortBy(p => (p.est, p.a, p.b))
    def bestPair: PairEstimate = ordered.head
    def worstPair: PairEstimate = ordered.last

    /** Greedy join order over `names`: the cheapest pair opens, then the
      * relation with the cheapest pairwise estimate against ANY joined
      * relation is appended (ties by name — fully deterministic). */
    def greedyOrder(names: Seq[String]): Seq[String] = {
      require(names.toSet.size == names.size, "duplicate relation names")
      val first = ordered.filter(p => names.contains(p.a) && names.contains(p.b))
      require(first.nonEmpty, "no estimate covers the requested relations")
      val order = scala.collection.mutable.ArrayBuffer(first.head.a,
                                                       first.head.b)
      val remaining = scala.collection.mutable.SortedSet(
        names.filterNot(order.contains): _*)
      while (remaining.nonEmpty) {
        val next = remaining.minBy { n =>
          val link = first.collect {
            case p if p.touches(n) && order.exists(p.touches) => p.est
          }
          (if (link.isEmpty) Long.MaxValue else link.min, n)
        }
        order += next
        remaining -= next
      }
      order.toSeq
    }
  }

  private val Depth = 4
  private val Width = 512

  private def bucket(r: Int, k: Column): Column =
    conv(substring(md5(concat_ws(":", lit(r), k)), 1, 8), 16, 10)
      .cast("long") % Width

  private def probes(k: Column): Column =
    explode(array((0 until Depth).map(r =>
      struct(lit(r.toLong).as("r"), bucket(r, k).as("b"))): _*))

  /** The 2048-cell CMS stats frame of `rel`'s join key. Data is touched
    * exactly once; estimates read only this. Persist (or store at rest)
    * when more than one estimate will consult it. */
  def sketch(rel: DataFrame, keyCol: String): DataFrame =
    rel.select(probes(col(keyCol).cast("string")).as("p"))
      .groupBy(col("p.r").as("r"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** One edge of a join GRAPH: relations `a` and `b` joined on
    * `a.keyA = b.keyB`. The keys may differ per edge — the heterogeneous
    * chain [[advise]]'s shared-key clique cannot express. */
  final case class JoinEdge(a: String, keyA: String, b: String, keyB: String) {
    def touches(n: String): Boolean = n == a || n == b
    def other(n: String): String = if (n == a) b else a
  }

  /** [[advise]] generalized to an arbitrary-key join graph: each EDGE is
    * estimated from sketches of its two endpoints on that edge's own key
    * (a relation joined on two attributes is sketched once per
    * attribute). Non-edges get no estimate, which [[JoinAdvice
    * .greedyOrder]] treats as an infinite link — on a connected graph the
    * greedy extension therefore always appends a relation that HAS an
    * edge into the joined set, so the advised order is executable as a
    * left-deep chain ([[executeChain]]). Same certified-small contract
    * as [[advise]]: one union of |edges| single-row aggregates, one
    * collect. */
  def adviseGraph(rels: Map[String, DataFrame],
                  edges: Seq[JoinEdge]): JoinAdvice = {
    require(edges.nonEmpty, "adviseGraph needs at least one edge")
    val need = edges.flatMap(e => Seq(e.a -> e.keyA, e.b -> e.keyB)).distinct
    val sk: Map[(String, String), DataFrame] = need.map { case (n, k) =>
      (n, k) -> sketch(rels(n), k)
    }.toMap
    val estFrame = edges.map { e =>
      sk((e.a, e.keyA)).withColumnRenamed("c", "ca")
        .join(sk((e.b, e.keyB)).withColumnRenamed("c", "cb"), Seq("r", "b"))
        .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip"))
        .agg(when(count(lit(1)) < Depth, lit(0L))
               .otherwise(min(col("ip"))).as("est"))
        .select(lit(e.a).as("a"), lit(e.b).as("b"), col("est"))
    }.reduce(_ unionAll _)
    val pairs = estFrame.collect()
      .map(r => PairEstimate(r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(p => (p.est, p.a, p.b))
    JoinAdvice(pairs)
  }

  /** Execute a left-deep inner-join chain in `order`, joining each
    * appended relation on its graph edge into the already-joined set.
    * Column names must be globally unique across `rels` (the TPC-H
    * prefix convention). Joins are pinned shuffle_hash so the physical
    * chain shape never flips with stats — the b09 loop-join discipline;
    * callers wanting broadcast dims keep their hand-built join. Fails
    * loud if `order` asks for a relation with no edge into the joined
    * prefix (a disconnected graph — [[JoinAdvice.greedyOrder]] never
    * produces this on a connected one). */
  def executeChain(rels: Map[String, DataFrame], edges: Seq[JoinEdge],
                   order: Seq[String]): DataFrame = {
    require(order.nonEmpty && order.forall(rels.contains),
      s"order $order must name relations")
    var df = rels(order.head)
    val joined = scala.collection.mutable.Set(order.head)
    order.tail.foreach { n =>
      val e = edges.find(e => e.touches(n) && joined(e.other(n)))
        .getOrElse(sys.error(
          s"no edge connects '$n' to the joined prefix $joined"))
      val (kIn, kNew) = if (n == e.b) (e.keyA, e.keyB) else (e.keyB, e.keyA)
      df = df.hint("shuffle_hash").join(rels(n), col(kIn) === rels(n)(kNew))
      joined += n
    }
    df
  }

  /** Estimate every pairwise inner-join size from per-relation sketches.
    * One union of N(N−1)/2 single-row aggregates, one collect. */
  def advise(sketches: Map[String, DataFrame]): JoinAdvice = {
    val names = sketches.keys.toSeq.sorted
    require(names.size >= 2, "advise needs at least two relations")
    val estFrame = (for { a <- names; b <- names if a < b } yield
      sketches(a).withColumnRenamed("c", "ca")
        .join(sketches(b).withColumnRenamed("c", "cb"), Seq("r", "b"))
        .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip"))
        // a depth row whose buckets are fully disjoint contributes inner
        // product 0 — but the inner join on (r, b) simply DROPS it. Reading
        // the min over the surviving rows alone would overstate a provably
        // empty join (ADVICE r10): any missing r means some row proved 0,
        // so the true CMS min is 0. count < Depth also covers the
        // all-rows-missing case (count 0 < Depth).
        .agg(when(count(lit(1)) < Depth, lit(0L))
               .otherwise(min(col("ip"))).as("est"))
        .select(lit(a).as("a"), lit(b).as("b"), col("est"))
      ).reduce(_ unionAll _)
    val pairs = estFrame.collect()
      .map(r => PairEstimate(r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sortBy(p => (p.est, p.a, p.b))
    JoinAdvice(pairs)
  }
}
