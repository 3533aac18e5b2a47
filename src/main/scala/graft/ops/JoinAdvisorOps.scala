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
