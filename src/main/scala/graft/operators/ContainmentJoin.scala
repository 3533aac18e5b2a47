package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-CONTAINMENT join: all (a, b) where set_a ⊆ set_b — the
  * subsumption member of the near-dup family ("is this 'new' document
  * just a clip of one we already have?"). [[SetSimJoin]] finds pairs
  * that are mutually similar; containment is deliberately asymmetric —
  * a 10-shingle excerpt of a 10 000-shingle page has Jaccard ≈ 0.001
  * and NO similarity threshold finds it, yet it carries zero new
  * information. This is the dedup mode that catches quotations,
  * boilerplate clips, and chunk-of-existing-doc resubmissions.
  *
  * Pruning theorem (the containment special case of prefix filtering):
  * A ⊆ B requires EVERY element of A in B, so in particular A's single
  * RAREST element (by the global (corpus df, element) order) must
  * appear in B. Candidates are therefore one equi-join of (probe,
  * rarest element) against the corpus postings — fan-out Σ_a df(rarest
  * element of a), the minimum possible under any single-element filter,
  * with zero misses by construction. A probe whose rarest element has
  * NO corpus posting is contained in nothing and generates NO
  * candidates (df coalesced to 0 sorts first and the join drops it) —
  * the cheapest possible rejection.
  *
  * Dataflow at scale: one element-keyed agg (corpus df), one keyed join
  * to attach df to probe elements, one probe-keyed min(struct) agg
  * (partial-aggregable — no window), the candidate equi-join, and two
  * keyed set fetches for the exact verify (`|A ∩ B| = |A|`, integer).
  * Nothing is all-pairs; the |A| ≤ |B| length filter prunes before the
  * intersection is computed.
  *
  * Empty probe sets are excluded (vacuous containment in everything is
  * never the question being asked).
  */
object ContainmentJoin {

  /** @param probes one row per candidate-contained set:
    *               (`idCol` bigint, `setCol` array<string>, DISTINCT
    *               elements)
    * @param corpus one row per potential container, same shape
    * @return (id_a, id_b, n_a, n_b) for every probe a and corpus doc b
    *         with set_a ⊆ set_b and |set_a| > 0. */
  def join(probes: DataFrame, corpus: DataFrame,
           idCol: String, setCol: String): DataFrame = {
    val ea = probes
      .select(col(idCol).as("id_a"), explode(col(setCol)).as("g"))
    val eb = corpus
      .select(col(idCol).as("id_b"), explode(col(setCol)).as("g"))
    val dfb = eb.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // rarest element per probe under the CORPUS order — absent elements
    // coalesce to df 0, sort first, and kill the probe at the join
    val rarest = ea.join(dfb, Seq("g"), "left")
      .select(col("id_a"), coalesce(col("df"), lit(0L)).as("df"), col("g"))
      .groupBy(col("id_a"))
      .agg(min(struct(col("df"), col("g"))).as("m"))
      .select(col("id_a"), col("m.g").as("g"))
    val cand = rarest.join(eb, Seq("g"))
      .select(col("id_a"), col("id_b"))
    val pa = probes.select(col(idCol).as("id_a"), col(setCol).as("sh_a"))
    val cb = corpus.select(col(idCol).as("id_b"), col(setCol).as("sh_b"))
    cand
      .join(pa, Seq("id_a"))
      .join(cb, Seq("id_b"))
      .withColumn("n_a", size(col("sh_a")).cast("long"))
      .withColumn("n_b", size(col("sh_b")).cast("long"))
      .filter(col("n_a") > 0 && col("n_a") <= col("n_b"))
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))) === col("n_a"))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
  }
}
