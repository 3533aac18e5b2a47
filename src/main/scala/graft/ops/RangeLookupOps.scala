package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.expr.SortedLowerBound

/** Broadcast interval lookup: classify fact rows into the buckets of a
  * SMALL sorted interval dimension with NO join at all.
  *
  * The textbook plan for `fact JOIN dim ON v >= lo AND v < hi` is a
  * BroadcastNestedLoopJoin — every fact row probes every dim row, O(|dim|)
  * comparisons per row and a join node the optimizer can't simplify
  * (compare q29's cell trick, which needs equi-joinable cells). When the
  * dimension is certified tiny (rate cards, price tiers, SLA bands — tens
  * to thousands of rows), the scale-correct shape is: collect the sorted
  * lower bounds ONCE at plan time, embed them as a literal array (Spark
  * ships task binaries to every executor — a free broadcast), and
  * binary-search per row with the native codegen'd
  * [[graft.functions.expr.SortedLowerBound]] — O(log |dim|) per row, pure
  * map-side projection, zero exchanges, zero join nodes
  * (plan-asserted in PlanShapeSpec). Reference behavior: the payroll
  * pipeline's dict-map lookups (etl_payroll_pipeline.py:210-214) are the
  * degenerate point-interval case of the same certified-small contract.
  *
  * Interval semantics: `tiers` are (lo, name) with ascending, distinct
  * `lo`; tier i covers [lo_i, lo_{i+1}), the last tier is open-ended.
  * Values below `tiers.head._1` miss the dimension: tier_id/tier are
  * NULL (the left-join contract — never silently clamped into tier 0).
  * Unsorted or duplicate bounds fail fast at plan time.
  */
object RangeLookupOps {

  /** Adds `tier_id` (0-based long), `tier` (name), `tier_lo` (inclusive
    * lower bound) to `facts`, classifying `v` (bigint) by binary search. */
  def intervalLookup(facts: DataFrame, v: Column,
                     tiers: Seq[(Long, String)]): DataFrame = {
    require(tiers.nonEmpty, "intervalLookup: empty tier dimension")
    require(tiers.sliding(2).forall {
        case Seq((a, _), (b, _)) => a < b
        case _                   => true },
      s"intervalLookup: tier bounds must be strictly ascending, got " +
        tiers.map(_._1).mkString("[", ",", "]"))
    val bounds = array(tiers.map(t => lit(t._1)): _*)
    val names  = array(tiers.map(t => lit(t._2)): _*)
    // lower_bound counts bounds strictly below v+1 == bounds <= v, so the
    // covering tier is that count − 1; 0 ⇒ v below every bound ⇒ miss.
    // v = Long.MaxValue would wrap the +1 probe to Long.MinValue and
    // misclassify the row as a miss — but MaxValue is >= every possible
    // long bound, so its count is |tiers| by definition; branch there
    // instead of probing (the CaseWhen evaluates v+1 only when safe).
    val n = when(v === lit(Long.MaxValue), lit(tiers.length.toLong))
      .otherwise(SortedLowerBound(bounds, v + lit(1L)).cast("long"))
    facts
      .withColumn("tier_id", when(n > 0, n - lit(1L)))
      .withColumn("tier", when(n > 0, element_at(names, n.cast("int"))))
      .withColumn("tier_lo", when(n > 0, element_at(bounds, n.cast("int"))))
  }
}
