package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Compaction
import graft.ops.{PrefixSumOps, ZOrderOps}
import graft.operators.MarketBasket

/** Round-6 layout & linkage operators: Z-order multi-dimensional
  * clustering (q95), blocked fuzzy entity resolution (q96), bitmap-index
  * distinct counting (q97), content-defined chunk dedup (x62),
  * strict-adjacency sequence-pattern matching (q100), sliding distinct
  * actives (q101), market-basket association rules (q102), and
  * time-weighted averages (q103).
  *
  * Cross-engine determinism: the z-interleave is pure integer bit
  * arithmetic (the oracle gets the identical formula via
  * [[graft.ops.ZOrderOps.zvalueSql]]); entity resolution corrupts names
  * positionally from the key (no randomness) and both engines run the
  * same `levenshtein`; chunk boundaries come from md5 of fixed 8-char
  * windows (md5-over-UTF-8 is engine-independent).
  *
  * Scale notes: q95 is map-side arithmetic plus one keyed agg; q96 joins
  * only within blocking buckets (first3+last3 of the name — never a
  * cross join; bucket fan-in is bounded by name-suffix cardinality);
  * q97's two-level bitmap agg ships one fixed-size bitmap per
  * (group, 32k-key bucket) instead of every raw key — the partial-
  * aggregatable form of COUNT(DISTINCT) for high-cardinality keys; x62
  * fans out per-doc (constant work per char, no shuffle) and reduces by
  * chunk hash.
  */
object LayoutQueries {

  private val Z_BITS = 16

  /** q95 dims: both non-negative, < 2^16. `y` folds the signed cent
    * balance into [0, 65536). */
  private val zx = "c_custkey % 65536"
  private val zy = "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) % 65536"

  /** q96: deterministic single-char deletion at position 10 + key%5 —
    * inside the digit run of `Customer#NNNNNNNNN`, so the blocking key
    * (first 3 + last 3 chars) survives the corruption by construction. */
  private val dirtySql =
    "concat(substring(c_name, 1, 9 + c_custkey % 5), " +
    "substring(c_name, 11 + c_custkey % 5, 30))"

  private def blockKey(nm: String): String =
    s"concat(substring($nm, 1, 3), substring($nm, -3, 3))"

  /** x123's block-size purge cap — shared by the Spark query and its
    * oracle SQL (interpolated) so the two sides cannot drift. Calibrated
    * so the oracle gates exercise all three regimes: no purge at
    * sf0.001, partial purge at sf0.01, full purge at sf0.1. */
  private val X123Cap = 4L

  /** x62: boundary positions = p ≥ 2 where md5 of the 8-char window at p
    * hits 0 mod 32 (expected chunk length ≈ 32 chars). This composed
    * form is the REFERENCE the native one-pass
    * [[graft.functions.expr.CdcBounds]] is spec-verified bit-identical
    * to (`CdcBoundsSpec`); the query runs the native expression —
    * `filter`'s lambda is interpreted per character position, the
    * native loop is one precompiled method per row (3.0 s → ~1 s at
    * bench SF). */
  private[graft] val boundsSql =
    """concat(array(1),
         if(_n >= 9,
            filter(sequence(2, _n - 7),
              p -> cast(conv(substr(md5(cast(substring(text, p, 8)
                     as binary)), 1, 6), 16, 10) as bigint) % 32 = 0),
            array()),
         array(_n + 1))"""

  /** q103 dataflow over any (user_id, ts, event_id, value) frame — each
    * observation holds until the next one, so its weight is the
    * microsecond gap to the successor (the last observation carries no
    * weight). One lead window per user; all integer (cents × µs stays
    * far under 2^63 at any realistic event density). Factored so the
    * degenerate-fixture spec can feed a synthetic frame. */
  private[graft] def twap(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
              round(col("value") * 100).cast("long").as("cents"))
      .withColumn("dt",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("dt").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_holds"),
           sum(col("dt")).as("span_us"),
           expr("sum(cents * dt) DIV sum(dt)").as("twap_cents"))
      // degenerate users whose events all share one timestamp have
      // sum(dt)=0: Spark's DIV yields null but DuckDB's // raises, so
      // BOTH sides drop them identically (HAVING sum(dt) > 0)
      .filter(col("span_us") > 0)
      .orderBy(col("user_id"))
  }

  /** x102/x103 record fixture: three deterministic variants per
    * customer — original, name-corrupted with missing balance,
    * conflicting balance with missing segment — plus the blocking key. */
  private def goldenRecords(c: DataFrame): DataFrame = {
    def rec(variant: Int, nm: Column, bal: Column, seg: Column) =
      c.select((col("c_custkey") * 10 + variant).as("rid"),
               nm.as("nm"), bal.as("bal"), seg.as("seg"))
    rec(0, col("c_name"),
        round(col("c_acctbal") * 100).cast("long"), col("c_mktsegment"))
      .unionByName(rec(1, expr(dirtySql),
        lit(null).cast("long"), col("c_mktsegment")))
      .unionByName(rec(2, col("c_name"),
        (round(col("c_acctbal") * 100) + col("c_custkey") % 7)
          .cast("long"), lit(null).cast("string")))
      .withColumn("bk", expr(blockKey("nm")))
  }

  /** Blocked lev≤2 linkage edges a×b, normalized to id_a < id_b.
    * The block join is pinned shuffle_hash (r17): both sides are
    * record-sized — at scale neither is broadcastable, and at bench SF
    * Catalyst's broadcast of the persisted (small-stats) side ran the
    * whole levenshtein fan-out inside the cache's own 3 partitions
    * (profiled: 2.9 s in 3 tasks, the single hottest x102 stage). A
    * bk-keyed shuffle spreads the verify across post-shuffle
    * partitions at every SF. */
  private def linkPairs(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bk"), col("rid").as("id_a"), col("nm").as("nm_a"))
      .join(b.select(col("bk"), col("rid").as("id_b"),
                     col("nm").as("nm_b")).hint("shuffle_hash"), Seq("bk"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("lev", levenshtein(col("nm_a"), col("nm_b"), 2))
      .filter(col("lev") >= 0 && col("lev") <= 2)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
              greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()

  /** Field-wise survivorship partials over labeled records — merge-closed
    * (count sums, max(struct)/max/min re-reduce), which is what makes the
    * x103 incremental path sound. */
  private def survivorPartials(labeled: DataFrame): DataFrame =
    labeled.groupBy(col("label"))
      .agg(count(lit(1)).as("n_records"),
           max(struct(length(col("nm")).as("l"), col("nm").as("nm")))
             .as("m"),
           max(col("bal")).as("bal_cents"),
           min(col("seg")).as("segment"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q95 — Z-order clustering kernel: interleave (custkey, balance)
    // into a Morton code, bucket by the curve's high bits, and profile
    // each bucket's bounding box. The per-bucket (max−min) spans are
    // tight in BOTH dims — the property that makes a z-range-partitioned
    // layout prunable by two-dimensional predicates (ZOrderSpec asserts
    // the layout side; this query hash-checks the kernel itself).
    "q95_zorder_locality" -> ((s, dir) => {
      val d = Tables(s, dir, "customer")
        .select(expr(zx).as("x"), expr(zy).as("y"))
      d.withColumn("z", ZOrderOps.zvalue(col("x"), col("y"), Z_BITS))
        .groupBy(expr("z DIV 4194304").as("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("x")).as("min_x"), max(col("x")).as("max_x"),
             min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("bucket"))
    }),

    // Q96 — blocked fuzzy entity resolution: resolve deterministically
    // corrupted names back to the master list. Candidates come from an
    // equality join on the blocking key (never all-pairs), are verified
    // with edit distance ≤ 2, and survivorship keeps the (min distance,
    // min key) match — the block/verify/survive shape of record linkage
    // at corpus scale.
    "q96_entity_resolution" -> ((s, dir) => {
      val clean = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
                expr(blockKey("c_name")).as("bk"))
      val dirty = Tables(s, dir, "customer")
        .select(col("c_custkey").as("d_id"), expr(dirtySql).as("d_name"))
        .withColumn("bk", expr(blockKey("d_name")))
      // bounded edit distance: the threshold form early-exits the DP for
      // far pairs (returns -1 past the bound) — at corpus scale most
      // candidates are far, so the scan cost per pair is O(len·k), not
      // O(len²). Kept rows carry the same distance the oracle computes.
      val cand = dirty.join(clean, Seq("bk"))
        .withColumn("lev", levenshtein(col("d_name"), col("c_name"), 2))
        .filter(col("lev") >= 0 && col("lev") <= 2)
      val byBest = Window.partitionBy(col("d_id"))
        .orderBy(col("lev"), col("c_custkey"))
      cand
        .withColumn("rn", row_number().over(byBest))
        .withColumn("n_cands",
          count(lit(1)).over(Window.partitionBy(col("d_id"))))
        .filter(col("rn") === 1)
        .select(col("d_id"), col("c_custkey").as("matched"),
                col("lev"), col("n_cands"))
        .orderBy(col("d_id"))
    }),

    // Q97 — bitmap-index COUNT(DISTINCT): keys are bucketed into fixed
    // 32k-bit bitmaps, OR-merged by partial aggregation, and counted.
    // X85 — Jaro-Winkler entity matching: q96's blocked-resolution
    // dataflow with the record-linkage scorer Spark lacks, as a native
    // codegen'd expression ([[graft.functions.expr.JaroWinkler]],
    // bit-identical to DuckDB's jaro_winkler_similarity — the oracle
    // compares the DOUBLES, not buckets). Where q96 hard-filters at
    // edit distance ≤ 2, JW RANKS every in-block candidate, so the
    // best-match step is the operator: per dirty record, argmax by
    // (jw desc, key asc) — computed as min(struct(-jw, key)), which is
    // a partial-aggregable keyed agg (map-side combine), NOT a window
    // sort over the candidate fan-out. At 100 TB the only exchanges are
    // the block-key join and that combining agg; block width bounds the
    // fan-out exactly as in q96.
    "x85_jw_entity_match" -> ((s, dir) => {
      val clean = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
                expr(blockKey("c_name")).as("bk"))
      val dirty = Tables(s, dir, "customer")
        .select(col("c_custkey").as("d_id"), expr(dirtySql).as("d_name"))
        .withColumn("bk", expr(blockKey("d_name")))
      dirty.join(clean, Seq("bk"))
        .withColumn("jw", graft.functions.expr.JaroWinkler(
          col("d_name"), col("c_name")))
        .groupBy(col("d_id"))
        .agg(min(struct((-col("jw")).as("njw"),
                        col("c_custkey").as("cid"),
                        col("jw").as("jw"))).as("m"))
        .select(col("d_id"), col("m.cid").as("matched"),
                col("m.jw").as("jw"))
        .orderBy(col("d_id"))
    }),

    // X102 — GOLDEN-RECORD consolidation, end-to-end MDM: duplicate
    // customer records (three deterministic variants per customer — the
    // original, a name-corrupted copy with a missing balance, a
    // conflicting-balance copy with a missing segment) are blocked,
    // matched (lev ≤ 2), clustered (connected components — the x14
    // label-propagation kernel on linkage edges), and each cluster is
    // collapsed to ONE canonical record by FIELD-WISE survivorship
    // rules: name = longest (ties → lexicographically greatest — one
    // max(struct)), balance = greatest non-null, segment = first
    // non-null by sort. Every rule is a partial-aggregable agg, so
    // consolidation is one keyed pass over cluster labels; the whole
    // dataflow (block → verify → cluster → survive) is the ER twin of
    // x17's dedup-corpus pipeline and is oracled end-to-end with a
    // recursive-CTE closure. Blocks can legitimately merge different
    // source customers whose names sit within the threshold (dense key
    // space) — n_records > 3 rows audit exactly that over-merge.
    "x102_golden_record" -> ((s, dir) => {
      val recs = goldenRecords(Tables(s, dir, "customer")).persist()
      val labels = graft.operators.DedupOperators
        .clusterPairs(linkPairs(recs, recs))
      // LEFT join + coalesce(label, rid): cluster labels only cover ids
      // that appear in a linkage edge — a record with no lev<=2 in-block
      // neighbor must survive as its own one-record cluster, not vanish
      // from the consolidated table (record loss the oracle could never
      // catch if it shared the inner-join blind spot)
      survivorPartials(
        recs.join(labels, recs("rid") === labels("id"), "left")
          .withColumn("label", coalesce(col("label"), col("rid"))))
        .select(col("label"), col("n_records"), col("m.nm").as("name"),
                col("bal_cents"), col("segment"))
        .orderBy(col("label"))
    }),

    // X103 — INCREMENTAL golden record: maintain x102's consolidated
    // table under a 10% batch of newly arriving customers WITHOUT
    // re-scanning history. Three persisted artifacts do all the work:
    // yesterday's labels (collapsed to star edges — x92's device, which
    // preserves connectivity and the min-root), yesterday's per-cluster
    // SURVIVORSHIP PARTIALS (merge-closed: counts sum, max(struct)/max/
    // min re-reduce), and the batch records. New linkage edges touch
    // only batch×all blocks; pointer jumping runs over |V_old| + |ΔE|;
    // old partials are re-keyed through the label map (old label → its
    // new label, identity for untouched clusters) and re-aggregated with
    // the batch partials. The oracle is x102's FULL-RECOMPUTE closure
    // over all records, so hash parity IS the incremental ≡ recompute
    // proof — including batch records that merge two old clusters.
    "x103_golden_incremental" -> ((s, dir) => {
      import graft.operators.DedupOperators
      val recs = goldenRecords(Tables(s, dir, "customer")).persist()
      val isBatch = expr("rid div 10 % 10 = 3")
      val batch = recs.filter(isBatch)
      // Yesterday's consolidated state is a PAY-ONCE artifact (the
      // b04/b08 steady-state economics): the old labels collapsed to
      // star edges and the merge-closed survivorship partials, written
      // once per dataset fingerprint. "Maintain WITHOUT re-scanning
      // history" has to include not re-CLUSTERING history — the r10
      // profile showed the recomputed labelsOld loop was half of x103's
      // 52 jobs/run. Steady state pays only batch×all linkage + ONE
      // pointer-jumping propagation over |V_old| star edges + |ΔE|.
      val path = Scratch.dir("gold", dir)
      if (!new java.io.File(s"$path/hist_partials", "_SUCCESS").exists()) {
        val hist = recs.filter(!isBatch)
        val labelsOld = DedupOperators.clusterPairs(
          linkPairs(hist, hist), maxIters = 30).persist()
        labelsOld.filter(col("id") =!= col("label"))
          .select(col("id").as("id_a"), col("label").as("id_b"))
          .write.mode("overwrite").parquet(s"$path/star_edges")
        // singletons (no edge ever) label themselves — x102's left join
        survivorPartials(
          hist.join(labelsOld, hist("rid") === labelsOld("id"), "left")
            .withColumn("label", coalesce(col("label"), col("rid"))))
          .write.mode("overwrite").parquet(s"$path/hist_partials")
        labelsOld.unpersist()
      }
      val starEdges = s.read.parquet(s"$path/star_edges")
      val oldPart = s.read.parquet(s"$path/hist_partials")
      val labelsNew = DedupOperators.clusterPairs(
        starEdges.unionByName(linkPairs(batch, recs)), maxIters = 30)
        .persist()
      // old label → new label; clusters untouched by the batch keep
      // their label (their root never entered the new edge set)
      val relabel = labelsNew
        .select(col("id").as("label"), col("label").as("_nl"))
      val oldMapped = oldPart.join(relabel, Seq("label"), "left")
        .withColumn("label", coalesce(col("_nl"), col("label")))
        .drop("_nl")
      val batchPart = survivorPartials(
        batch.join(labelsNew, batch("rid") === labelsNew("id"), "left")
          .withColumn("label", coalesce(col("label"), col("rid"))))
      oldMapped.unionByName(batchPart)
        .groupBy(col("label"))
        .agg(sum(col("n_records")).as("n_records"),
             max(col("m")).as("m"),
             max(col("bal_cents")).as("bal_cents"),
             min(col("segment")).as("segment"))
        .select(col("label"), col("n_records"), col("m.nm").as("name"),
                col("bal_cents"), col("segment"))
        .orderBy(col("label"))
    }),

    // X123 — BLOCK-PURGED linkage: candidate-generation GOVERNANCE as a
    // first-class, audited operator. The r11 sf1 probe measured x102 at
    // exponent 1.65: its 6-char blocking key has only 1000 values on
    // key-derived names, so Σ|block|² — the TRUE candidate count, which
    // no result-preserving join scheme can beat — grows quadratically.
    // The ER-literature defense is block purging: blocks larger than
    // `cap` are excluded from linkage entirely (their records
    // consolidate as singletons), bounding candidate cost at cap·N
    // whatever the key distribution does — and the purge is AUDITED per
    // output row (`purged` = this cluster's records all sit in over-cap
    // blocks), never silent. cap = X123Cap (one shared constant — the
    // oracle SQL interpolates the same value, so the two sides cannot
    // drift), calibrated to the fixture: no purge at sf0.001 (the result
    // equals x102's consolidation), PARTIAL purge at sf0.01
    // (two-customer suffix blocks purge, one-customer blocks link — the
    // oracle gate exercises both paths), full purge on the saturated
    // sf0.1/sf1 key space (bounded cost is the demonstration — see
    // SCALING.md round 11).
    "x123_purged_linkage" -> ((s, dir) => {
      val cap = X123Cap
      val recs = goldenRecords(Tables(s, dir, "customer")).persist()
      val bs = recs.groupBy(col("bk")).agg(count(lit(1)).as("_bn"))
      val withSize = recs.join(bs, Seq("bk"))
      val kept = withSize.filter(col("_bn") <= cap)
      val labels = graft.operators.DedupOperators
        .clusterPairs(linkPairs(kept, kept))
      val labeled = withSize
        .join(labels, withSize("rid") === labels("id"), "left")
        .withColumn("label", coalesce(col("label"), col("rid")))
      labeled.groupBy(col("label"))
        .agg(count(lit(1)).as("n_records"),
             max(struct(length(col("nm")).as("l"), col("nm").as("nm")))
               .as("m"),
             max(col("bal")).as("bal_cents"),
             min(col("seg")).as("segment"),
             min(when(col("_bn") > cap, 1L).otherwise(0L)).as("_allover"))
        .select(col("label"), col("n_records"), col("m.nm").as("name"),
                col("bal_cents"), col("segment"),
                (col("_allover") === 1L).as("purged"))
        .orderBy(col("label"))
    }),

    // X100 — RECIPROCAL best match (mutual nearest neighbor): the
    // high-confidence tier of entity resolution — keep a (dirty, clean)
    // pair only when each side is the other's argmax. One-directional
    // best match (x85) happily pairs a record with a hub that is
    // "everyone's best"; requiring agreement in both directions is the
    // classic reciprocal-best-hit filter (bioinformatics orthologs, MNN
    // batch alignment) and costs exactly one more partial-aggregable
    // argmax over the SAME candidate frame — the in-block JW scores are
    // computed once, and both argmaxes are min(struct) keyed aggs with
    // map-side combine, never a window over the candidate fan-out.
    "x100_reciprocal_match" -> ((s, dir) => {
      val clean = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
                expr(blockKey("c_name")).as("bk"))
      val dirty = Tables(s, dir, "customer")
        .select(col("c_custkey").as("d_id"), expr(dirtySql).as("d_name"))
        .withColumn("bk", expr(blockKey("d_name")))
      val cand = dirty.join(clean, Seq("bk"))
        .withColumn("jw", graft.functions.expr.JaroWinkler(
          col("d_name"), col("c_name")))
        .persist()
      val bestD = cand.groupBy(col("d_id"))
        .agg(min(struct((-col("jw")).as("njw"),
                        col("c_custkey").as("cid"),
                        col("jw").as("jw"))).as("m"))
        .select(col("d_id"), col("m.cid").as("cid"), col("m.jw").as("jw"))
      val bestC = cand.groupBy(col("c_custkey"))
        .agg(min(struct((-col("jw")).as("njw"),
                        col("d_id").as("did"))).as("m"))
        .select(col("c_custkey").as("cid"), col("m.did").as("back"))
      bestD.join(bestC, Seq("cid"))
        .filter(col("back") === col("d_id"))
        .select(col("d_id"), col("cid").as("matched"), col("jw"))
        .orderBy(col("d_id"))
    }),

    // X95 — SORTED-NEIGHBORHOOD blocking: the record-linkage blocking
    // strategy for when key-based blocks (q96/x85's first-3+last-3 key)
    // can't survive the corruption — sort BOTH record lists on a pass
    // key and pair every record with its w−1 sort neighbors. The pass
    // key here is the REVERSED name (multi-pass SN's classic second
    // pass): the deletion corrupts the name's leading zero-run, so a
    // forward sort scatters true pairs (measured: 1/1500 in-window),
    // while reversing puts the stable significant digits first and the
    // same window captures 1322/1500 — the `hit` column audits exactly
    // this. Candidate fan-out is exactly (w−1)·N — DATA-INDEPENDENT,
    // so no block-size skew can blow up a task (the failure mode of
    // key blocking on a hot block). The global sort rank comes from
    // [[graft.ops.DedupOps.withIngestOrdinalFrom]] (range-split prefix
    // sums — no single-partition sort, rank a pure function of the key),
    // and neighbor pairs come from a BANDED EQUI-JOIN: the lower side
    // explodes to rank-bands ⌊rn/(w−1)⌋ and +1, the higher side joins on
    // its own band, so |rn_b − rn_a| ≤ w−1 pairs meet without any
    // inequality join. Cross-side pairs are JW-scored (native codegen'd
    // expression) and survivorship is the same partial-aggregable
    // min(struct(−jw, key)) as x85; `hit` audits whether the sort
    // neighborhood actually contained the true match.
    "x95_sorted_neighborhood" -> ((s, dir) => {
      val w = 4 // neighborhood width: pair ranks within distance ≤ 3
      val clean = Tables(s, dir, "customer")
        .select(col("c_name").as("nm"), lit(0).as("side"),
                col("c_custkey").as("id"))
      val dirty = Tables(s, dir, "customer")
        .select(expr(dirtySql).as("nm"), lit(1).as("side"),
                col("c_custkey").as("id"))
      val ord = graft.ops.DedupOps.withIngestOrdinalFrom(
          clean.unionByName(dirty),
          Seq(reverse(col("nm")), col("side"), col("id")))
        .withColumnRenamed(graft.ops.DedupOps.OrdinalCol, "rn")
        .persist()
      val lo = ord.select(col("rn").as("rn_a"), col("nm").as("nm_a"),
                          col("side").as("side_a"), col("id").as("id_a"))
        .withColumn("blk", explode(array(expr(s"rn_a div ${w - 1}"),
                                         expr(s"rn_a div ${w - 1} + 1"))))
      val hi = ord.select(col("rn").as("rn_b"), col("nm").as("nm_b"),
                          col("side").as("side_b"), col("id").as("id_b"))
        .withColumn("blk", expr(s"rn_b div ${w - 1}"))
      lo.join(hi, Seq("blk"))
        .filter((col("rn_b") - col("rn_a")).between(1, w - 1) &&
                col("side_a") =!= col("side_b"))
        .select(
          when(col("side_a") === 1, col("id_a")).otherwise(col("id_b"))
            .as("d_id"),
          when(col("side_a") === 1, col("nm_a")).otherwise(col("nm_b"))
            .as("d_name"),
          when(col("side_a") === 1, col("id_b")).otherwise(col("id_a"))
            .as("cid"),
          when(col("side_a") === 1, col("nm_b")).otherwise(col("nm_a"))
            .as("c_name"))
        .withColumn("jw", graft.functions.expr.JaroWinkler(
          col("d_name"), col("c_name")))
        .groupBy(col("d_id"))
        .agg(min(struct((-col("jw")).as("njw"),
                        col("cid").as("cid"),
                        col("jw").as("jw"))).as("m"))
        .select(col("d_id"), col("m.cid").as("matched"), col("m.jw").as("jw"),
                (col("m.cid") === col("d_id")).as("hit"))
        .orderBy(col("d_id"))
    }),

    // X99 — EXACT edit-distance JOIN (threshold ed ≤ 2) via q-gram
    // prefix filtering, in the BATCH-vs-CORPUS shape: a 1% incoming
    // batch of corrupted records matched against the full master list —
    // the zero-miss member of the string-matching family, where q96/x95
    // are recall heuristics. Each name's q=2-grams are ranked by global
    // document frequency and only the 5 rarest (q·k+1 — the Ed-Join
    // prefix bound) enter the candidate join, so the constant
    // "Customer#" stopgrams shared by EVERY row never pair anything.
    // The batch framing is deliberate: on THIS fixture every record has
    // ~85 true ed≤2 neighbors (sequential ids make the name space
    // dense), so the symmetric all-pairs join's OUTPUT is quadratic —
    // measured minutes at bench SF with one skew-bound gram task — while
    // the batch form is the shape production runs daily (new records →
    // master list) and stays linear in the batch. The length filter
    // (||a|−|b|| ≤ k) prunes before the bounded levenshtein(·,·,2)
    // verify, which early-exits the DP for far pairs. The oracle
    // brute-forces every (batch, clean) pair, so each hash-green run
    // re-proves the prefix pruning dropped no qualifying pair.
    "x99_editdist_join" -> ((s, dir) => {
      val clean = Tables(s, dir, "customer")
        .select(col("c_custkey").as("cid"), col("c_name").as("cn"))
      val dirty = Tables(s, dir, "customer")
        .filter(col("c_custkey") % 100 === 7)
        .select(col("c_custkey").as("did"), expr(dirtySql).as("dn"))
      graft.operators.EditDistanceJoin
        .join(dirty, clean, "did", "dn", "cid", "cn", k = 2, q = 2)
        .orderBy(col("did"), col("cid"))
    }),

    // Each (group, bucket) ships ONE 4 KB bitmap through the shuffle
    // regardless of how many raw keys an executor saw — the scalable
    // form of exact distinct counting over high-cardinality keys
    // (contrast q33's expand-based count_distinct, which shuffles every
    // key).
    "q97_bitmap_distinct" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
                 expr("bitmap_bucket_number(l_orderkey)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_orderkey))")
               .as("bm"),
             count(lit(1)).as("rows_"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_orders"),
             sum(col("rows_")).as("n_rows"))
        .orderBy(col("l_returnflag"))),

    // X62 — content-defined chunking dedup (the storage-dedup/CDC trick
    // applied to corpus text): chunk boundaries are picked by content
    // (rolling window hash ≡ 0 mod 32), so an insertion near the head of
    // a near-duplicate document shifts ONE chunk instead of re-aligning
    // every fixed-width block — shared tails still hash to identical
    // chunks. Emits the most-duplicated chunks across the corpus.
    "x62_cdc_chunks" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
                length(col("text")).as("_n"))
        .withColumn("_bounds",
          graft.functions.expr.CdcBounds(col("text"), 8, 32))
        .withColumn("c", explode(expr(
          """zip_with(slice(_bounds, 1, size(_bounds) - 1),
                      slice(_bounds, 2, size(_bounds) - 1),
                      (a, b) -> named_struct(
                        'h', md5(cast(substring(text, cast(a as int),
                                      cast(b - a as int)) as binary)),
                        'l', b - a))""")))
        .groupBy(col("c.h").as("chunk_md5"))
        .agg(count(lit(1)).as("cnt"),
             count_distinct(col("doc_id")).as("n_docs"),
             max(col("c.l")).as("chunk_len"))
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("chunk_md5"))
        .limit(100)),

    // Q100 — strict-adjacency sequence patterns (the MATCH_RECOGNIZE
    // shape): find view→click→purchase runs of IMMEDIATELY consecutive
    // events per user. Two lag windows over one per-user shuffle+sort —
    // row-pattern matching compiles to windows, never a per-row scan of
    // the user's history. Contrast q85's funnel, which matches first
    // occurrences within a time bound rather than strict adjacency.
    "q100_seq_pattern" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type"))
        .withColumn("p1", lag(col("event_type"), 1).over(w))
        .withColumn("p2", lag(col("event_type"), 2).over(w))
        .filter(col("event_type") === "purchase" &&
                col("p1") === "click" && col("p2") === "view")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matches"),
             min(col("ts")).as("first_match_ts"))
        .orderBy(col("user_id"))
    }),

    // Q101 — 7-day rolling distinct active users (the WAU-per-day
    // metric). Sliding COUNT(DISTINCT) can't ride a window frame at
    // scale (per-frame sets); the scalable form dedupes to (user, day)
    // FIRST, fans each activity day out to the ≤ 7 window-ends it
    // contributes to (constant fan-out, map-side), and runs ONE distinct
    // agg keyed by window-end — work is O(active-pairs × 7), never
    // O(days × history).
    "q101_sliding_distinct" -> ((s, dir) => {
      val ud = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val maxd = ud.agg(max(col("day")).as("maxd"))
      ud.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6)))
            .as("wday"))
        .crossJoin(broadcast(maxd))
        .filter(col("wday") <= col("maxd"))
        .groupBy(col("wday"))
        .agg(count_distinct(col("user_id")).as("wau_7d"))
        .select(col("wday").cast("string").as("wday"), col("wau_7d"))
        .orderBy(col("wday"))
    }),

    // X107 — sliding-window distinct actives from MERGED DAILY SKETCHES:
    // q101's sketch twin. The exact path must fan every (user, day) pair
    // into its 7 windows — at 100 TB that is 7× the distinct-pair volume
    // through a count_distinct expand; here the raw events collapse ONCE
    // into |days| HLL partials (the persisted artifact, b04 economics)
    // and each window merges 7 sketch rows — the fan-out is 7·|days|
    // sketch structs, data-volume-independent. Estimates aren't
    // ANSI-oracle-able, so the output brackets them (x15/b04 device):
    // the exact WAU twin rides along and the documented 3σ bound for
    // lgK=12 (rsd ≈ 1.6%) is asserted in-engine as `hll_ok`, which the
    // oracle states as a literal — a drifting sketch turns the row red.
    "x107_sliding_hll" -> ((s, dir) => {
      val ud = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val daily = ud.groupBy(col("day"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("hs"))
      val maxd = daily.agg(max(col("day")).as("maxd"))
      val est = daily
        .select(explode(sequence(col("day"), date_add(col("day"), 6)))
                  .as("wday"), col("hs"))
        .crossJoin(broadcast(maxd))
        .filter(col("wday") <= col("maxd"))
        .groupBy(col("wday"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(hs))").as("est"))
      val exact = ud.distinct()
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6)))
            .as("wday"))
        .groupBy(col("wday"))
        .agg(count_distinct(col("user_id")).as("wau_7d"))
      est.join(exact, Seq("wday"))
        .select(col("wday").cast("string").as("wday"), col("wau_7d"),
          (abs(col("est") - col("wau_7d")) <= col("wau_7d") * lit(0.05))
            .as("hll_ok"))
        .orderBy(col("wday"))
    }),

    // Q102 — market-basket association rules (a-priori's pair stage):
    // support from one keyed pair-count (the self-join fan-out is
    // Σ basket-size², bounded by basket width, never catalog²),
    // confidence and lift in integer thousandths; the a-priori prune
    // drops sub-minsup items BEFORE pairing, so a pathological
    // mega-basket of one-off items can never explode the expansion
    // (dataflow + mega-basket spec: operators/MarketBasket.scala).
    "q102_market_basket" -> ((s, dir) =>
      MarketBasket.rules(
          Tables(s, dir, "lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")),
          minSup = 2)
        .orderBy(col("sup_ab").desc, col("conf_x1000").desc,
                 col("ante"), col("cons"))
        .limit(200)),

    // Q103 — time-weighted average (TWAP): each observation holds until
    // the next one, so its weight is the microsecond gap to the
    // successor (the last observation carries no weight). One lead
    // window per user — the irregular-time-series mean without
    // resampling. All integer: cents × µs products stay far under 2^63
    // at any realistic event density.
    "q103_time_weighted_avg" -> ((s, dir) => twap(Tables(s, dir, "events"))),

    // Q104 — equi-depth histogram (the optimizer-statistics form: equal
    // ROW mass per bucket, unlike q58's fixed-width buckets): collapse
    // to the (flag, value) domain first; a value with cumulative count
    // cum lands in bucket (cum−1)·B DIV total — pure integer arithmetic
    // over exact order statistics. The cumulative column itself is never
    // materialized: bucket b begins at the value whose cum first reaches
    // ceil(b·tot/B)+1, so the B−1 boundary VALUES come from rank
    // selection (PrefixSumOps.selectRanks — only boundary-carrying
    // sketch ranges are shuffled), and every domain value's bucket is
    // #{boundaries ≤ v}, a broadcast O(log B) binary search. Duplicate
    // boundaries (one heavy value spanning buckets) repeat in the sorted
    // list, which is exactly what makes the count skip empty buckets the
    // way the cum arithmetic does. v+1 in the probe turns the kernel's
    // strict < into ≤; cents are < 2⁴⁰ so the increment cannot overflow.
    "q104_equidepth_hist" -> ((s, dir) => {
      val B = 10
      val vc = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
                round(col("l_extendedprice") * 100).cast("long").as("v"))
        .groupBy(col("flag"), col("v")).agg(count(lit(1)).as("c"))
        .persist()
      val bnd = PrefixSumOps.selectRanks(vc, Seq("flag"), "v", "c",
          transform(sequence(lit(1), lit(B - 1)),
            b => call_function("div",
              b.cast("long") * col("_tot") + lit(B - 1), lit(B.toLong))
              + lit(1L)))
        .groupBy(col("flag"))
        .agg(sort_array(collect_list(col("v"))).as("_sb"))
      // left join: a degenerate group too small to reach ANY boundary
      // rank (tot < ~B) has no bnd row — every value sits in bucket 0,
      // exactly what the cum arithmetic would have said
      vc.join(broadcast(bnd), Seq("flag"), "left")
        .withColumn("bucket",
          graft.functions.expr.SortedLowerBound(
            coalesce(col("_sb"), array().cast("array<long>")),
            col("v") + lit(1L)).cast("long"))
        .groupBy(col("flag"), col("bucket"))
        .agg(min(col("v")).as("lo_cents"), max(col("v")).as("hi_cents"),
             sum(col("c")).as("n_rows"))
        .orderBy(col("flag"), col("bucket"))
    }),

    // Q106 — EXACT grouped quantiles at scale (P50/P90/P99): Spark's
    // exact `percentile` aggregate collects every value of a group into
    // one buffer — the same single-task funnel q104 shed. The
    // quantile-q answer is the smallest domain value whose cumulative
    // count reaches ⌈q·tot/100⌉ (the lower order statistic) — a
    // three-rank SELECTION (PrefixSumOps.selectRanks): only the three
    // rank-carrying sketch ranges are ever shuffled or windowed, exact
    // integer arithmetic end to end, sketches nowhere in the answer
    // path (the percentile_approx inside selectRanks only places range
    // cuts, never values).
    "q106_exact_quantiles" -> ((s, dir) => {
      val vc = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
                round(col("l_extendedprice") * 100).cast("long").as("v"))
        .groupBy(col("flag"), col("v")).agg(count(lit(1)).as("c"))
      PrefixSumOps.selectRanks(vc, Seq("flag"), "v", "c",
          array(expr("(_tot * 50 + 99) DIV 100"),
                expr("(_tot * 90 + 99) DIV 100"),
                expr("(_tot * 99 + 99) DIV 100")))
        .groupBy(col("flag"))
        .agg(
          min(when(col("_ri") === 0, col("v"))).as("p50_cents"),
          min(when(col("_ri") === 1, col("v"))).as("p90_cents"),
          min(when(col("_ri") === 2, col("v"))).as("p99_cents"),
          max(col("_tot")).as("n_rows"))
        .orderBy(col("flag"))
    }),

    // Q107 — zone-map-pruned range scan: io/Compaction's maintenance path
    // on the oracled surface. Pay-once, a per-SF scratch layout compacts
    // `documents` range-clustered on n_chars (the b03 ensure-once shape);
    // each run then builds the per-file zone manifest — ONE narrow scan
    // producing |files| rows — and answers the range aggregate reading
    // only files whose [min,max] zone intersects [100,200]. On the
    // clustered layout that is O(matching files) of I/O; correctness
    // never depends on the manifest because the predicate is re-applied
    // row-level, and the oracle reads the RAW table — layout must not
    // change results (CompactionSpec asserts the file-count drop; at
    // 100 TB this is the difference between opening every file of a
    // table and opening the two files a point lookup needs).
    "q107_zonemap_prune" -> ((s, dir) => {
      val out = Scratch.dir("zm", dir)
      if (!new java.io.File(out, "_SUCCESS").isFile) {
        val src = s"$dir/documents.parquet"
        val total = Compaction.dataFiles(s, src).map(_._2).sum
        Compaction.compact(s, src, out, math.max(1L, total / 8),
          sortCols = Seq("n_chars"))
      }
      val zm = Compaction.zoneMap(s, out, Seq("n_chars"))
      Compaction.readPruned(s, out, zm, "n_chars", lit(100L), lit(200L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("sum_chars"),
             min(col("n_chars")).as("min_chars"),
             max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q95_zorder_locality" -> {
      val z = ZOrderOps.zvalueSql("x", "y", Z_BITS)
      s"""WITH d AS (SELECT $zx AS x, $zy AS y FROM customer),
         z AS (SELECT x, y, $z AS z FROM d)
         SELECT z // 4194304 AS bucket, count(*) AS n,
           min(x) AS min_x, max(x) AS max_x,
           min(y) AS min_y, max(y) AS max_y
         FROM z GROUP BY 1 ORDER BY 1"""
    },

    "q96_entity_resolution" ->
      s"""WITH clean AS (SELECT c_custkey, c_name,
             ${blockKey("c_name")} AS bk FROM customer),
         dirty AS (SELECT c_custkey AS d_id, $dirtySql AS d_name,
             ${blockKey(dirtySql)} AS bk FROM customer),
         cand AS (SELECT d.d_id, c.c_custkey,
             levenshtein(d.d_name, c.c_name) AS lev
           FROM dirty d JOIN clean c USING (bk)
           WHERE levenshtein(d.d_name, c.c_name) <= 2),
         best AS (SELECT *,
             row_number() OVER (PARTITION BY d_id
                                ORDER BY lev, c_custkey) AS rn,
             count(*) OVER (PARTITION BY d_id) AS n_cands
           FROM cand)
         SELECT d_id, c_custkey AS matched, lev, n_cands
         FROM best WHERE rn = 1 ORDER BY d_id""",

    "x85_jw_entity_match" ->
      s"""WITH clean AS (SELECT c_custkey, c_name,
             ${blockKey("c_name")} AS bk FROM customer),
         dirty AS (SELECT c_custkey AS d_id, $dirtySql AS d_name,
             ${blockKey(dirtySql)} AS bk FROM customer),
         j AS (SELECT d.d_id, c.c_custkey,
             jaro_winkler_similarity(d.d_name, c.c_name) AS jw
           FROM dirty d JOIN clean c USING (bk)),
         r AS (SELECT d_id, c_custkey, jw,
             row_number() OVER (PARTITION BY d_id
                                ORDER BY jw DESC, c_custkey) AS rn
           FROM j)
         SELECT d_id, c_custkey AS matched, jw
         FROM r WHERE rn = 1 ORDER BY d_id""",

    "x95_sorted_neighborhood" ->
      s"""WITH clean AS (SELECT c_name AS nm, 0 AS side, c_custkey AS id
                         FROM customer),
          dirty AS (SELECT $dirtySql AS nm, 1 AS side, c_custkey AS id
                    FROM customer),
          u AS (SELECT nm, side, id,
                  row_number() OVER (ORDER BY reverse(nm), side, id) AS rn
                FROM (SELECT * FROM clean UNION ALL SELECT * FROM dirty)),
          p AS (SELECT
                  CASE WHEN a.side = 1 THEN a.id ELSE b.id END AS d_id,
                  CASE WHEN a.side = 1 THEN a.nm ELSE b.nm END AS d_name,
                  CASE WHEN a.side = 1 THEN b.id ELSE a.id END AS cid,
                  CASE WHEN a.side = 1 THEN b.nm ELSE a.nm END AS c_name
                FROM u a JOIN u b
                  ON b.rn - a.rn BETWEEN 1 AND 3 AND a.side <> b.side),
          sc AS (SELECT d_id, cid,
                   jaro_winkler_similarity(d_name, c_name) AS jw
                 FROM p),
          best AS (SELECT d_id, cid, jw,
                     row_number() OVER (PARTITION BY d_id
                                        ORDER BY jw DESC, cid) AS r
                   FROM sc)
          SELECT d_id, cid AS matched, jw, (cid = d_id) AS hit
          FROM best WHERE r = 1 ORDER BY d_id""",

    "x102_golden_record" ->
      s"""WITH RECURSIVE
          recs AS (
            SELECT c_custkey * 10 AS rid, c_name AS nm,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
                   c_mktsegment AS seg
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 1, $dirtySql, NULL, c_mktsegment
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 2, c_name,
                   CAST(round(c_acctbal * 100) AS BIGINT) + c_custkey % 7,
                   NULL
            FROM customer),
          bkd AS (SELECT rid, nm, ${blockKey("nm")} AS bk FROM recs),
          pairs AS (SELECT a.rid AS src, b.rid AS dst
                    FROM bkd a JOIN bkd b
                      ON a.bk = b.bk AND a.rid < b.rid
                     AND levenshtein(a.nm, b.nm) <= 2),
          edges AS (SELECT src, dst FROM pairs
                    UNION SELECT dst, src FROM pairs),
          comp(id, lbl) AS (
            SELECT DISTINCT src, src FROM edges
            UNION
            SELECT e.dst, c.lbl FROM comp c JOIN edges e ON e.src = c.id),
          lab AS (SELECT id, min(lbl) AS label FROM comp GROUP BY id),
          j AS (SELECT coalesce(lab.label, r.rid) AS label,
                       r.nm, r.bal, r.seg
                FROM recs r LEFT JOIN lab ON lab.id = r.rid),
          g AS (SELECT label, count(*)::BIGINT AS n_records,
                  max(bal)::BIGINT AS bal_cents, min(seg) AS segment
                FROM j GROUP BY label),
          best AS (SELECT label, nm,
                     row_number() OVER (PARTITION BY label
                       ORDER BY length(nm) DESC, nm DESC) AS rn
                   FROM j)
          SELECT g.label, g.n_records, best.nm AS name,
                 g.bal_cents, g.segment
          FROM g JOIN best ON best.label = g.label AND best.rn = 1
          ORDER BY g.label""",

    // x102's closure restricted to blocks of size ≤ cap; purged blocks'
    // records consolidate as singletons and the purged flag is part of
    // the hash — governance is audited, never silent
    "x123_purged_linkage" ->
      s"""WITH RECURSIVE
          recs AS (
            SELECT c_custkey * 10 AS rid, c_name AS nm,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
                   c_mktsegment AS seg
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 1, $dirtySql, NULL, c_mktsegment
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 2, c_name,
                   CAST(round(c_acctbal * 100) AS BIGINT) + c_custkey % 7,
                   NULL
            FROM customer),
          bkd AS (SELECT rid, nm, ${blockKey("nm")} AS bk FROM recs),
          bsz AS (SELECT bk, count(*)::BIGINT AS bn FROM bkd GROUP BY bk),
          kept AS (SELECT bkd.rid, bkd.nm, bkd.bk
                   FROM bkd JOIN bsz USING (bk) WHERE bn <= $X123Cap),
          pairs AS (SELECT a.rid AS src, b.rid AS dst
                    FROM kept a JOIN kept b
                      ON a.bk = b.bk AND a.rid < b.rid
                     AND levenshtein(a.nm, b.nm) <= 2),
          edges AS (SELECT src, dst FROM pairs
                    UNION SELECT dst, src FROM pairs),
          comp(id, lbl) AS (
            SELECT DISTINCT src, src FROM edges
            UNION
            SELECT e.dst, c.lbl FROM comp c JOIN edges e ON e.src = c.id),
          lab AS (SELECT id, min(lbl) AS label FROM comp GROUP BY id),
          j AS (SELECT coalesce(lab.label, r.rid) AS label,
                       r.nm, r.bal, r.seg, bsz.bn
                FROM recs r
                JOIN bkd ON bkd.rid = r.rid
                JOIN bsz ON bsz.bk = bkd.bk
                LEFT JOIN lab ON lab.id = r.rid),
          g AS (SELECT label, count(*)::BIGINT AS n_records,
                  max(bal)::BIGINT AS bal_cents, min(seg) AS segment,
                  min(CASE WHEN bn > $X123Cap THEN 1 ELSE 0 END) AS allover
                FROM j GROUP BY label),
          best AS (SELECT label, nm,
                     row_number() OVER (PARTITION BY label
                       ORDER BY length(nm) DESC, nm DESC) AS rn
                   FROM j)
          SELECT g.label, g.n_records, best.nm AS name,
                 g.bal_cents, g.segment, (g.allover = 1) AS purged
          FROM g JOIN best ON best.label = g.label AND best.rn = 1
          ORDER BY g.label""",

        // incremental ≡ recompute: the oracle is the identical full closure
    "x103_golden_incremental" ->
      s"""WITH RECURSIVE
          recs AS (
            SELECT c_custkey * 10 AS rid, c_name AS nm,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
                   c_mktsegment AS seg
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 1, $dirtySql, NULL, c_mktsegment
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 2, c_name,
                   CAST(round(c_acctbal * 100) AS BIGINT) + c_custkey % 7,
                   NULL
            FROM customer),
          bkd AS (SELECT rid, nm, ${blockKey("nm")} AS bk FROM recs),
          pairs AS (SELECT a.rid AS src, b.rid AS dst
                    FROM bkd a JOIN bkd b
                      ON a.bk = b.bk AND a.rid < b.rid
                     AND levenshtein(a.nm, b.nm) <= 2),
          edges AS (SELECT src, dst FROM pairs
                    UNION SELECT dst, src FROM pairs),
          comp(id, lbl) AS (
            SELECT DISTINCT src, src FROM edges
            UNION
            SELECT e.dst, c.lbl FROM comp c JOIN edges e ON e.src = c.id),
          lab AS (SELECT id, min(lbl) AS label FROM comp GROUP BY id),
          j AS (SELECT coalesce(lab.label, r.rid) AS label,
                       r.nm, r.bal, r.seg
                FROM recs r LEFT JOIN lab ON lab.id = r.rid),
          g AS (SELECT label, count(*)::BIGINT AS n_records,
                  max(bal)::BIGINT AS bal_cents, min(seg) AS segment
                FROM j GROUP BY label),
          best AS (SELECT label, nm,
                     row_number() OVER (PARTITION BY label
                       ORDER BY length(nm) DESC, nm DESC) AS rn
                   FROM j)
          SELECT g.label, g.n_records, best.nm AS name,
                 g.bal_cents, g.segment
          FROM g JOIN best ON best.label = g.label AND best.rn = 1
          ORDER BY g.label""",

    "x100_reciprocal_match" ->
      s"""WITH clean AS (SELECT c_custkey, c_name,
             ${blockKey("c_name")} AS bk FROM customer),
          dirty AS (SELECT c_custkey AS d_id, $dirtySql AS d_name,
             ${blockKey(dirtySql)} AS bk FROM customer),
          j AS (SELECT d.d_id, c.c_custkey,
              jaro_winkler_similarity(d.d_name, c.c_name) AS jw
            FROM dirty d JOIN clean c USING (bk)),
          bd AS (SELECT d_id, c_custkey AS cid, jw,
              row_number() OVER (PARTITION BY d_id
                                 ORDER BY jw DESC, c_custkey) AS rn
            FROM j),
          bc AS (SELECT c_custkey AS cid, d_id AS back,
              row_number() OVER (PARTITION BY c_custkey
                                 ORDER BY jw DESC, d_id) AS rn
            FROM j)
          SELECT bd.d_id, bd.cid AS matched, bd.jw
          FROM bd JOIN bc ON bc.cid = bd.cid
          WHERE bd.rn = 1 AND bc.rn = 1 AND bc.back = bd.d_id
          ORDER BY bd.d_id""",

    "x99_editdist_join" ->
      s"""WITH cl AS (SELECT c_custkey AS cid, c_name AS cn FROM customer),
          dr AS (SELECT c_custkey AS did, $dirtySql AS dn FROM customer
                 WHERE c_custkey % 100 = 7)
          SELECT d.did, c.cid, levenshtein(d.dn, c.cn)::INT AS lev
          FROM dr d JOIN cl c
            ON abs(length(d.dn) - length(c.cn)) <= 2
          WHERE levenshtein(d.dn, c.cn) <= 2
          ORDER BY did, cid""",

    "q97_bitmap_distinct" ->
      """SELECT l_returnflag,
           count(DISTINCT l_orderkey)::BIGINT AS n_orders,
           count(*)::BIGINT AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "x62_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
         b AS (SELECT doc_id, text,
             list_concat(list_concat([1],
               CASE WHEN n >= 9 THEN
                 list_filter(range(2, n - 6),
                   p -> ('0x' || substr(md5(substr(text, p::INT, 8)),
                                        1, 6))::BIGINT % 32 = 0)
               ELSE []::BIGINT[] END), [n + 1]) AS bs
           FROM d),
         c AS (SELECT doc_id,
             unnest(list_transform(range(1, len(bs)),
               i -> struct_pack(
                 h := md5(substr(text, bs[i::INT]::INT,
                                 (bs[(i+1)::INT] - bs[i::INT])::INT)),
                 l := bs[(i+1)::INT] - bs[i::INT]))) AS ch
           FROM b)
         SELECT ch.h AS chunk_md5, count(*) AS cnt,
           count(DISTINCT doc_id) AS n_docs, max(ch.l) AS chunk_len
         FROM c GROUP BY 1 HAVING count(*) >= 2
         ORDER BY cnt DESC, chunk_md5 LIMIT 100""",

    "q100_seq_pattern" ->
      """WITH g AS (SELECT user_id, ts, event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, count(*) AS n_matches,
           min(ts) AS first_match_ts
         FROM g
         WHERE event_type = 'purchase' AND p1 = 'click' AND p2 = 'view'
         GROUP BY 1 ORDER BY 1""",

    "q101_sliding_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
         c AS (SELECT user_id,
             (day + INTERVAL (i) DAY)::DATE AS wday
           FROM ud, unnest(range(0, 7)) AS t(i))
         SELECT wday::VARCHAR AS wday,
           count(DISTINCT user_id)::BIGINT AS wau_7d
         FROM c WHERE wday <= (SELECT max(day) FROM ud)
         GROUP BY 1 ORDER BY 1""",

    // exact twin + the in-engine-asserted bound flag as a literal —
    // the sketch values never cross engines (x15/b04 device)
    "x107_sliding_hll" ->
      """WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
         c AS (SELECT user_id,
             (day + INTERVAL (i) DAY)::DATE AS wday
           FROM ud, unnest(range(0, 7)) AS t(i))
         SELECT wday::VARCHAR AS wday,
           count(DISTINCT user_id)::BIGINT AS wau_7d,
           TRUE AS hll_ok
         FROM c WHERE wday <= (SELECT max(day) FROM ud)
         GROUP BY 1 ORDER BY 1""",

    "q102_market_basket" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
         n AS (SELECT count(DISTINCT ok)::BIGINT AS n_orders FROM it),
         si AS (SELECT p, count(*)::BIGINT AS sup_i FROM it GROUP BY 1),
         sp AS (SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS sup_ab
                FROM it a JOIN it b ON a.ok = b.ok AND a.p < b.p
                GROUP BY 1, 2 HAVING count(*) >= 2),
         r AS (SELECT pa AS ante, pb AS cons, sup_ab FROM sp
               UNION ALL
               SELECT pb AS ante, pa AS cons, sup_ab FROM sp)
         SELECT ante, cons, sup_ab,
           (1000 * sup_ab) // sa.sup_i AS conf_x1000,
           (1000 * sup_ab * n.n_orders) // (sa.sup_i * sc.sup_i)
             AS lift_x1000
         FROM r JOIN si sa ON r.ante = sa.p
                JOIN si sc ON r.cons = sc.p
                CROSS JOIN n
         ORDER BY sup_ab DESC, conf_x1000 DESC, ante, cons LIMIT 200""",

    "q103_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         d AS (SELECT user_id, cents,
             epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id))
               - epoch_us(ts) AS dt
           FROM e)
         SELECT user_id, count(*) AS n_holds,
           sum(dt)::BIGINT AS span_us,
           sum(cents * dt)::BIGINT // sum(dt)::BIGINT AS twap_cents
         FROM d WHERE dt IS NOT NULL
         GROUP BY 1 HAVING sum(dt) > 0 ORDER BY 1""",

    "q104_equidepth_hist" ->
      """WITH vc AS (SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             count(*)::BIGINT AS c
           FROM lineitem GROUP BY 1, 2),
         cw AS (SELECT flag, v, c,
             sum(c) OVER (PARTITION BY flag ORDER BY v
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
             sum(c) OVER (PARTITION BY flag)::BIGINT AS tot
           FROM vc)
         SELECT flag, ((cum - 1) * 10) // tot AS bucket,
           min(v) AS lo_cents, max(v) AS hi_cents,
           sum(c)::BIGINT AS n_rows
         FROM cw GROUP BY 1, 2 ORDER BY 1, 2""",

    // same explicit rank definition as the Spark side — quantile-q is the
    // least v whose cumulative count reaches q·n (no engine quantile
    // built-in, whose interpolation rules differ)
    "q106_exact_quantiles" ->
      """WITH vc AS (SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             count(*)::BIGINT AS c
           FROM lineitem GROUP BY 1, 2),
         cw AS (SELECT flag, v, c,
             sum(c) OVER (PARTITION BY flag ORDER BY v
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
             sum(c) OVER (PARTITION BY flag)::BIGINT AS tot
           FROM vc)
         SELECT flag,
           min(CASE WHEN 100 * cum >= 50 * tot THEN v END) AS p50_cents,
           min(CASE WHEN 100 * cum >= 90 * tot THEN v END) AS p90_cents,
           min(CASE WHEN 100 * cum >= 99 * tot THEN v END) AS p99_cents,
           max(tot) AS n_rows
         FROM cw GROUP BY 1 ORDER BY 1""",

    // the oracle reads the RAW table: compaction + zone-map pruning must
    // be invisible to results
    "q107_zonemap_prune" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS sum_chars,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents WHERE n_chars BETWEEN 100 AND 200
         GROUP BY lang ORDER BY lang"""
  )
}
