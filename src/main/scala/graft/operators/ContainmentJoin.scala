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
  * (partial-aggregable — no window), the candidate equi-join, and a
  * RELATIONAL verify: candidate pairs fan back out to their probe
  * elements and equi-join the corpus postings on (doc, element), so
  * `|A ∩ B| = |A|` is a keyed count — the set ARRAYS never cross the
  * wire (an array-fetch verify measured 10× slower at sf0.1: two
  * broadcasts of every corpus shingle array vs one join of a
  * candidates×|A| stream against the postings already exploded for the
  * df count). Nothing is all-pairs.
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
           idCol: String, setCol: String)
          (implicit scope: graft.ops.CacheScope): DataFrame = {
    val ea = probes
      .select(col(idCol).as("id_a"), explode(col(setCol)).as("g"))
    // the postings feed THREE consumers (df count, candidate join,
    // verify join) — persist the exploded form once instead of paying
    // the array explode per branch (the same economics as SetSimJoin's
    // persisted element stream)
    val eb = scope.persist(corpus
      .select(col(idCol).as("id_b"), explode(col(setCol)).as("g")))
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
    // verify |A ∩ B| = |A| relationally: fan each candidate pair back
    // out to A's elements and count hits against the postings — only
    // (id, id, element) keys move, never the arrays
    val inter = cand.join(ea, Seq("id_a"))
      .join(eb, Seq("id_b", "g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    val na = probes
      .select(col(idCol).as("id_a"), size(col(setCol)).cast("long").as("n_a"))
    val nb = corpus
      .select(col(idCol).as("id_b"), size(col(setCol)).cast("long").as("n_b"))
    inter.join(na, Seq("id_a")).join(nb, Seq("id_b"))
      .filter(col("inter") === col("n_a"))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
  }

  /** τ-PARTIAL containment: all (a, b) with |A ∩ B| / |A| ≥ τ — the
    * edit-tolerant generalization of [[join]] ("this doc is ≥ 80% a
    * clip of that one"), which strict subsumption misses the moment one
    * shingle is edited. Pruning is the pigeonhole form of the prefix
    * theorem: missing ALL of A's ⌊(1−τ)|A|⌋ + 1 rarest elements means
    * more than (1−τ)|A| of A is outside B, i.e. containment < τ — so
    * candidates come from the PREFIX of rarest elements joined against
    * the postings, zero-miss. τ = 1 degenerates to exactly [[join]]'s
    * single-rarest-element candidates. The per-probe rarity rank is a
    * window partitioned by probe (state bounded by set width — the
    * SetSimJoin prefix device); verify is the same relational hit
    * count, thresholded as the exact rational inter·den ≥ num·|A|.
    *
    * @param tauNum/tauDen the threshold as an exact rational, e.g. 4/5.
    * @return (id_a, id_b, inter, n_a, n_b) for every qualifying pair. */
  def joinPartial(probes: DataFrame, corpus: DataFrame,
                  idCol: String, setCol: String,
                  tauNum: Int, tauDen: Int)
                 (implicit scope: graft.ops.CacheScope): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen,
      s"tau must be in (0, 1], got $tauNum/$tauDen")
    val ea = probes
      .select(col(idCol).as("id_a"), explode(col(setCol)).as("g"))
    val eb = scope.persist(corpus
      .select(col(idCol).as("id_b"), explode(col(setCol)).as("g")))
    val dfb = eb.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val na = probes
      .select(col(idCol).as("id_a"), size(col(setCol)).cast("long").as("n_a"))
    // prefix = the floor((1-tau)*n_a) + 1 rarest elements of each probe
    // under the corpus (df, g) order; rank is per-probe, bounded by the
    // probe's own width
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("df"), col("g"))
    val prefix = ea.join(dfb, Seq("g"), "left")
      .select(col("id_a"), coalesce(col("df"), lit(0L)).as("df"), col("g"))
      .withColumn("rk", row_number().over(byRarity))
      .join(na, Seq("id_a"))
      .filter(col("rk") <=
        col("n_a") - expr(s"($tauNum * n_a + ${tauDen - 1}) DIV $tauDen")
          + lit(1L))
      .select(col("id_a"), col("g"))
    val cand = prefix.join(eb, Seq("g"))
      .select(col("id_a"), col("id_b")).distinct()
    val inter = cand.join(ea, Seq("id_a"))
      .join(eb, Seq("id_b", "g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    val nb = corpus
      .select(col(idCol).as("id_b"), size(col(setCol)).cast("long").as("n_b"))
    inter.join(na, Seq("id_a")).join(nb, Seq("id_b"))
      .filter(col("inter") * tauDen >= col("n_a") * tauNum)
      .select(col("id_a"), col("id_b"), col("inter"),
              col("n_a"), col("n_b"))
  }
}
