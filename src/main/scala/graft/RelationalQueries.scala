package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import graft.functions.{TextFunctions => T}
import graft.operators.SetSimJoin
import graft.ops.RangeLookupOps

/** Relational-surface completion: subquery decorrelation (EXISTS /
  * NOT EXISTS), LATERAL correlated subqueries, bloom-prefiltered semi
  * joins, and the map-typed / array-set / listagg function families.
  *
  * Scale notes:
  *  - q72/q73: Catalyst decorrelates both into joins (EXISTS → left-semi,
  *    NOT EXISTS → left-anti, LATERAL top-k → window-limited join) — no
  *    per-row subquery execution ever happens, so these hold at any SF.
  *  - q74: the bloom prefilter drops non-matching fact rows MAP-SIDE
  *    before the semi join's shuffle — see [[graft.ops.BloomOps]].
  *  - q75/q76: pure per-row map/array expressions plus one keyed hash agg.
  *  - q77: listagg groups are region-sized (bounded); the global ORDER BY
  *    is over 5 rows.
  */
object RelationalQueries {

  /** q110 price tiers in cents: ascending inclusive lower bounds; the
    * last tier is open-ended. A certified-small dimension — the
    * RangeLookupOps contract. */
  private val PriceTiers = Seq(
    0L -> "t0_micro", 5000000L -> "t1_small", 10000000L -> "t2_mid",
    20000000L -> "t3_large", 30000000L -> "t4_xl", 40000000L -> "t5_jumbo")

  private val wordsSql = "regexp_split_to_array(trim(text), '\\s+')"
  /** q111: word 3-gram shingles — the same basis as x08/x06. */
  private val shinglesSql =
    s"""list_transform(generate_series(1, len($wordsSql) - 2),
        i -> $wordsSql[i] || ' ' || $wordsSql[i+1] || ' ' || $wordsSql[i+2])"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q72 — EXISTS / NOT EXISTS subqueries: customers with at least one
    // big order and no small finished order. Catalyst decorrelates to a
    // left-semi + left-anti join pair (no correlated re-execution).
    "q72_exists_subquery" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer_q72")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_q72")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_q72 c
        WHERE EXISTS (SELECT 1 FROM orders_q72 o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
          AND NOT EXISTS (SELECT 1 FROM orders_q72 o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < 50000)
        ORDER BY c_custkey""")
    }),

    // Q73 — LATERAL correlated subquery with per-row ORDER BY + LIMIT:
    // the two highest-quantity lineitems of each expensive order.
    // Catalyst plans the lateral top-k as a join + per-key window limit,
    // not a per-order subquery loop.
    "q73_lateral_topk" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_q73")
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q73")
      s.sql("""
        SELECT o.o_orderkey, t.l_linenumber, t.qty
        FROM orders_q73 o, LATERAL (
          SELECT l_linenumber, CAST(round(l_quantity) AS BIGINT) AS qty
          FROM lineitem_q73 WHERE l_orderkey = o.o_orderkey
          ORDER BY l_quantity DESC, l_linenumber LIMIT 2) t
        WHERE o.o_totalprice > 300000
        ORDER BY o_orderkey, l_linenumber, qty DESC""")
    }),

    // Q74 — bloom-prefiltered semi join (exact result; the bloom only
    // cuts shuffled volume — false positives are removed by the semi
    // join). Oracle = the plain IN-subquery semi join.
    "q74_bloom_semi" -> ((s, dir) =>
      graft.ops.BloomOps.bloomPrefilterSemiJoin(
          Tables(s, dir, "customer"),
          Tables(s, dir, "orders").filter(col("o_totalprice") > 250000),
          "c_custkey", "o_custkey", expectedItems = 100000L)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // Q75 — map-typed column battery: parse → map_concat a constructed
    // entry → map_keys / map_values / map_filter / HOF-aggregate, all
    // map-side; one row per event.
    "q75_map_funcs" -> ((s, dir) => {
      val m = from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
      Tables(s, dir, "events")
        .select(col("event_id"),
          map_concat(m, map(lit("evt"), col("event_id") % 100)).as("_m"))
        .select(col("event_id"),
          size(col("_m")).cast("long").as("n_keys"),
          array_join(array_sort(map_keys(col("_m"))), ",").as("keys_sorted"),
          aggregate(map_values(col("_m")), lit(0L), _ + _).as("sum_v"),
          size(map_filter(col("_m"), (_, v) => v > 50))
            .cast("long").as("n_big"))
        .orderBy(col("event_id"))
    }),

    // Q76 — array set operations per group: per order, the lineitem
    // numbers matching two predicates, intersected / unioned / differenced
    // (collect_list drops the when()'s nulls; every output is sorted so
    // the result is partition-order-independent). The arrays are emitted
    // as ','-joined strings (q52's pattern): the driver's checker loads
    // results into pandas, whose sort can't hash raw array cells.
    "q76_array_setops" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          sort_array(collect_list(
            when(col("l_quantity") > 25, col("l_linenumber")))).as("_a"),
          sort_array(collect_list(
            when(col("l_discount") > 0.05, col("l_linenumber")))).as("_b"))
        .select(col("l_orderkey"),
          array_join(array_sort(array_intersect(col("_a"), col("_b"))), ",")
            .as("ln_both"),
          array_join(array_sort(array_union(col("_a"), col("_b"))), ",")
            .as("ln_any"),
          array_join(array_sort(array_except(col("_a"), col("_b"))), ",")
            .as("ln_only_a"))
        .orderBy(col("l_orderkey"))),

    // Q77 — listagg / string_agg (SQL:2023 ordered-set aggregate) with
    // WITHIN GROUP ordering — deterministic by construction.
    "q77_listagg" -> ((s, dir) => {
      Tables(s, dir, "nation").createOrReplaceTempView("nation_q77")
      Tables(s, dir, "region").createOrReplaceTempView("region_q77")
      s.sql("""
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                 AS nations
        FROM nation_q77 n JOIN region_q77 r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name""")
    }),

    // Q78 — custom typed-Aggregator UDAF (deterministic mode): the
    // engine's user-defined-aggregate surface. Same semantics as q18's
    // composed form, exercised through ObjectHashAggregate with map-side
    // partial buffers instead of a count+window.
    "q78_mode_udaf" -> ((s, dir) => {
      val modeU = udaf(graft.functions.ModeAggregator)
      Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(modeU(col("c_mktsegment")).as("seg_mode"))
        .orderBy(col("c_nationkey"))
    }),

    // Q79 — IGNORE NULLS window battery: last-observation-carried-forward
    // (the canonical sparse-sensor fill), previous non-null, and first
    // non-null per partition — one shuffle on user_id, one sort.
    "q79_ignore_nulls" -> ((s, dir) => {
      val v = when(col("event_type") === "click",
        round(col("value") * 100).cast("long"))
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val upToHere = ord.rowsBetween(Window.unboundedPreceding,
                                     Window.currentRow)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), v.as("_v"))
        .select(col("user_id"), col("event_id"),
          last(col("_v"), ignoreNulls = true).over(upToHere).as("carried"),
          lag(col("_v"), 1, null, ignoreNulls = true).over(ord).as("prev_v"),
          first(col("_v"), ignoreNulls = true).over(upToHere).as("first_v"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Q80 — DYNAMIC pivot (no explicit value list): Spark first runs a
    // distinct job to discover the pivot columns, then pivots — the
    // runtime-schema variant of q31. Missing (group, value) combos are
    // zero-filled to match SQL PIVOT's count semantics. The value domain
    // is contractually small (a categorical column); the distinct job is
    // a partial-agg over that domain.
    "q80_dynamic_pivot" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .pivot("c_mktsegment")
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy(col("c_nationkey"))),

    // Q81 — RECURSIVE CTE (hierarchy traversal): ancestor chains over the
    // derived parent edge k → k÷2, with a JOIN back to the table in the
    // recursive step. Spark 4 executes this as an iterative union loop
    // (one distributed join per level, ~log₂(maxkey) levels) — the DAG
    // depth is the HIERARCHY depth, never the row count, and each level
    // is a fully parallel equi-join.
    "q81_recursive_cte" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer_q81")
      s.sql("""
        WITH RECURSIVE anc(start_k, k, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer_q81
          WHERE c_custkey % 100 = 0 AND c_custkey > 0
          UNION ALL
          SELECT a.start_k, c.c_custkey, a.depth + 1
          FROM anc a JOIN customer_q81 c ON c.c_custkey = a.k DIV 2
          WHERE a.k > 1)
        SELECT start_k, k, depth FROM anc
        ORDER BY start_k, depth""")
    }),

    // Q82 — linear-regression aggregates (regr_slope / intercept / r²)
    // from EXACT integer moments, the q51 pattern: one map-side partial
    // agg accumulates n, Σx, Σx², Σy, Σy², Σxy (long where a long can
    // never overflow — x ≤ 50 so Σx² ≤ 2500·n — decimal(38,0) where it
    // can), then ONE double computation per group at the end. Native
    // regr_* aggregates accumulate doubles in partition order and are
    // not bit-reproducible across cluster sizes; the moment form is.
    "q82_regr_agg" -> ((s, dir) => {
      val x = round(col("l_quantity")).cast("long")
      val y = round(col("l_extendedprice") * 100).cast("long")
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val g = Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(x).as("sx"), sum(x * x).as("sxx"),
             sum(y).as("sy"),
             sum((y * y).cast(dec)).as("syy"),
             sum((x * y).cast(dec)).as("sxy"))
      val nD = col("n").cast("double")
      val sx = col("sx").cast("double");  val sxx = col("sxx").cast("double")
      val sy = col("sy").cast("double");  val syy = col("syy").cast("double")
      val sxy = col("sxy").cast("double")
      val covN = nD * sxy - sx * sy          // n·cov numerator
      val varXN = nD * sxx - sx * sx         // n·var(x) numerator
      val varYN = nD * syy - sy * sy
      g.select(col("l_returnflag"), col("n"),
          (round(covN / varXN, 6) + lit(0.0d)).as("slope"),
          (round((sy * sxx - sx * sxy) / varXN, 4) + lit(0.0d)).as("intercept"),
          (round(covN * covN / (varXN * varYN), 6) + lit(0.0d)).as("r2"))
        .orderBy(col("l_returnflag"))
    }),

    // Q83 — BFS / shortest-hop graph traversal over the order↔supplier
    // bipartite graph (distinct lineitem (orderkey, suppkey) pairs are the
    // edges). Level-synchronous frontier expansion: each level is ONE
    // distributed equi-join on the frontier plus an anti join against the
    // visited set — job-DAG depth = traversal depth (4), never row count.
    // The anti join guarantees first-visit = min-hop, so the result equals
    // the oracle's min-over-all-paths recursive CTE.
    "q83_graph_bfs" -> ((s, dir) => {
      // nodes travel as packed longs (supplier = su·2, order = o·2+1):
      // every per-level hash, shuffle, and broadcast handles an 8-byte
      // key instead of a string; the labels the oracle compares against
      // are reconstructed once, over the final 1-row-per-node result
      val e = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("su"))
        .distinct()
      val sId = (col("su") * 2).cast("long")
      val oId = (col("o") * 2 + 1).cast("long")
      val edges = e.select(sId.as("src"), oId.as("dst"))
        .unionAll(e.select(oId.as("src"), sId.as("dst")))
      val seeds = e.filter(col("su") % 50 === 1).select(sId.as("node"))
      graft.ops.GraphOps.bfs(edges, seeds, maxDepth = 4)
        .select(when(col("node") % 2 === 0,
                  concat(lit("S"), (col("node") / 2).cast("long")))
                .otherwise(concat(lit("O"), ((col("node") - 1) / 2)
                  .cast("long"))).as("node"),
                col("dist"))
        .orderBy(col("dist"), col("node"))
    }),

    // Q84 — key-skew profiler: per-key counts, then the top-10 heaviest
    // keys with their corpus share (ppm) and ratio to the mean key load
    // (×1000) — the diagnostic run before choosing salting / AQE skew
    // thresholds on a 100 TB join. One hash agg + a broadcast of the
    // 1-row stats + TakeOrderedAndProject; integer DIV end to end.
    "q84_skew_profile" -> ((s, dir) => {
      val counts = Tables(s, dir, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(sum(col("cnt")).as("total"),
                             count(lit(1)).as("n_keys"))
      counts.crossJoin(broadcast(stats))
        .select(col("l_suppkey"), col("cnt"),
          expr("(cnt * 1000000) DIV total").as("share_ppm"),
          expr("(cnt * n_keys * 1000) DIV total").as("skew_x1000"))
        .orderBy(col("cnt").desc, col("l_suppkey"))
        .limit(10)
    }),

    // Q85 — sequential conversion funnel (view → click within 24 h of the
    // first view → purchase within 24 h of that click): the canonical
    // product-analytics query, with the bounded conversion window that
    // makes stage drop-off real. Each stage is one keyed min-timestamp agg
    // joined to the next stage's events on user_id with a strictly-later,
    // interval-bounded predicate — three user_id-keyed exchanges total, no
    // window over the whole event log, no cross product. At 100 TB the
    // working set per task is one user's events; stage frames shrink
    // monotonically, so later joins are cheaper than earlier ones (and
    // broadcastable once the funnel narrows).
    "q85_event_funnel" -> ((s, dir) =>
      eventFunnel(Tables(s, dir, "events"),
        Seq("view", "click", "purchase"), "INTERVAL 24 HOURS")),

    // Q86 — retention cohorts: users grouped by first-purchase day,
    // counted per day-offset since their cohort day (conversion events
    // only, so the activity matrix is sparse and the retention curve is
    // real). Days are integer date arithmetic — bit-stable on any engine.
    // Dataflow: distinct (user, day) → per-user min → self-join on
    // user_id → one keyed agg; the distinct collapses the event volume
    // FIRST, so the join input is user×day, not raw events.
    "q86_retention_cohorts" -> ((s, dir) =>
      retentionCohorts(
        Tables(s, dir, "events").filter(col("event_type") === "purchase"),
        "2024-01-01")),

    // Q87 — robust outlier profile per group: discrete (rank-based) median
    // and MAD over o_totalprice, then the count of |x − med| > 2·MAD rows.
    // Scale design: the windows run over per-(group, value) COUNTS, not
    // rows — the cumulative-sum median over the collapsed value domain —
    // so a 100 TB table first shrinks through a combiner-friendly hash agg
    // and the window input is |distinct values|, orders of magnitude
    // smaller. Discrete median (k-th smallest, k = (n+1) DIV 2) avoids
    // interpolated-percentile float drift across engines; the only float
    // ops are exactly-rounded subtract/multiply/compare.
    "q87_mad_outliers" -> ((s, dir) => {
      // both value-count frames feed two consumers each (a median pass +
      // the next derivation) — cached so the orders scan+agg runs once,
      // not four times; they are value-domain-collapsed, so the cache is
      // bounded by |distinct (prio, value)|, not the row count
      val vc = Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"), col("o_totalprice").as("v"))
        .groupBy(col("prio"), col("v")).agg(count(lit(1)).as("c"))
        .persist()
      val med = discreteMedian(vc, "v").withColumnRenamed("v", "med")
      val devc = vc.join(broadcast(med), Seq("prio"))
        .groupBy(col("prio"), abs(col("v") - col("med")).as("dev"))
        .agg(sum(col("c")).as("c"))
        .persist()
      val mad = discreteMedian(devc, "dev").withColumnRenamed("dev", "mad")
      devc.join(broadcast(mad), Seq("prio"))
        .groupBy(col("prio"))
        .agg(sum(col("c")).as("n"),
             sum(when(col("dev") > col("mad") * 2, col("c")).otherwise(0L))
               .as("n_outliers"),
             min(col("mad")).as("mad"))
        .join(broadcast(med), Seq("prio"))
        .select(col("prio"), col("med"), col("mad"), col("n"),
                col("n_outliers"))
        .orderBy(col("prio"))
    }),

    // Q88 — first-order Markov transition matrix over per-user event
    // sequences: P(next event_type | event_type) as an integer ppm — the
    // behavioral-model summary behind "what do users do after X".
    // Dataflow: ONE user_id-keyed window (lead) builds adjacent pairs,
    // then a keyed hash agg bounded by |event types|²; the per-state
    // totals derive from that agg (never a second pass) and ride a
    // broadcast. At 100 TB the only heavy exchange is the window's
    // user_id shuffle — each task sorts one user's events.
    "q88_markov_transitions" -> ((s, dir) =>
      markovTransitions(Tables(s, dir, "events"))),

    // Q89 — peak interval overlap by sweep line: each lineitem occupies
    // [shipdate, shipdate + quantity days]; per return flag, the maximum
    // number of simultaneously open intervals and the first day it is
    // reached. The sweep turns an O(N²) interval-overlap into ±1 deltas →
    // keyed agg → prefix sum: the delta agg collapses N rows to distinct
    // (flag, day) FIRST, so the cumulative window sorts the date domain,
    // not the data. Days are integer offsets from a fixed epoch so the
    // result hashes identically cross-engine.
    "q89_interval_peak" -> ((s, dir) =>
      intervalPeak(Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
                col("l_shipdate").cast("date").as("d0"),
                col("l_quantity").cast("int").as("qty")),
        epoch0 = "1992-01-01")),

    // Q90 — weighted discrete median: per return flag, the smallest price
    // (cents) at which cumulative quantity-weight reaches half the total —
    // the robust "typical price per shipped unit". Same scale design as
    // q87: one combiner-friendly hash agg collapses the table to the
    // (flag, cents) value domain, and the windows run over THAT — never a
    // per-row sort of the fact table. All arithmetic is integer.
    "q90_weighted_median" -> ((s, dir) =>
      weightedMedian(Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
                round(col("l_extendedprice") * 100).cast("long").as("v"),
                col("l_quantity").cast("long").as("w")))
        .select(col("flag"), col("v").as("wmedian_cents"),
                col("tot").as("total_w"))
        .orderBy(col("flag"))),

    // Q91 — triangle counting over the co-purchase graph (parts sharing a
    // high-value order) by DEGREE ORIENTATION: every edge points from its
    // lower-(degree, id) endpoint to the higher one, so each triangle has
    // exactly ONE apex with out-arcs to the other two and the wedge join's
    // fan-out per node is bounded by O(√m) instead of the hub's full
    // degree — the standard trick that keeps distributed triangle counting
    // at Σ outdeg² ≪ Σ deg² under power-law skew. All joins are keyed; the
    // tiny degree table broadcasts; the identical edge-list subplans
    // collapse into one via exchange reuse (asserted in PlanShapeSpec).
    "q91_triangle_count" -> ((s, dir) => {
      val big = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("ok"))
      val items = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .join(big, Seq("ok")).distinct()
      val e = items.select(col("ok"), col("p").as("pa"))
        .join(items.select(col("ok"), col("p").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .select(col("pa").as("u"), col("pb").as("v")).distinct()
      triangleCount(e)
    }),

    // Q108 — slowly-changing-dimension (type 2) build: collapse each
    // user's event_type stream into validity intervals — version number,
    // valid_from/valid_to, is_current — the warehouse history table every
    // dimension load maintains. Change detection is one lag() over the
    // (user, time) window; the interval close is a lead() over the
    // CHANGE rows, which inherit the first window's hash partitioning on
    // user_id, so the whole build is ONE keyed exchange and two local
    // window passes — never a global sort, and per-user partitions keep
    // the window bounded by a user's history, not the table.
    "q108_scd2_intervals" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("version"), col("event_type"),
                col("ts").as("valid_from"), col("valid_to"),
                col("valid_to").isNull.as("is_current"))
        .orderBy(col("user_id"), col("version"))
    }),

    // Q109 — MERGE INTO semantics (upsert apply) without a table format:
    // apply a keyed changeset of upserts and deletes to a base snapshot
    // in ONE keyed full-outer join — matched+delete drops the row,
    // matched+upsert replaces it, unmatched upsert inserts, everything
    // else survives. The changeset is derived from the base (the x68/x71
    // pattern) so the oracle states the post-image exactly. At 100 TB
    // this is Delta/Iceberg's MERGE re-expressed over plain parquet:
    // one co-partitioned exchange of the (usually far smaller) changeset
    // against the base — and exchange-free on bucketed layouts (b03).
    "q109_merge_apply" -> ((s, dir) => {
      val base = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
                round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val upd = base.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 3 === 0, lit("delete"))
            .otherwise(lit("upsert")).as("op"),
          concat(lit("UPD:"), col("c_name")).as("n_name"),
          (col("bal_cents") + 10000L).as("n_bal"))
      val ins = base.filter(col("c_custkey") % 11 === 4)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          lit("upsert").as("op"),
          concat(lit("NEW:"), col("c_name")).as("n_name"),
          col("bal_cents").as("n_bal"))
      base.join(upd.unionByName(ins), Seq("c_custkey"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "delete")
        .select(col("c_custkey"),
          when(col("op") === "upsert", col("n_name"))
            .otherwise(col("c_name")).as("c_name"),
          when(col("op") === "upsert", col("n_bal"))
            .otherwise(col("bal_cents")).as("bal_cents"))
        .orderBy(col("c_custkey"))
    }),

    // Q110 — broadcast interval lookup: every order classified into a
    // price tier with NO join node at all. The naive `fact JOIN tiers
    // ON cents >= lo AND cents < hi` plans a BroadcastNestedLoopJoin —
    // O(|tiers|) probes per fact row and a join Catalyst cannot
    // simplify. A certified-small sorted dimension instead becomes a
    // literal bounds array binary-searched per row by the native
    // sorted_lower_bound expression ([[graft.ops.RangeLookupOps]]):
    // O(log tiers) per row, pure map-side projection, zero exchanges
    // before the presentation sort (PlanShapeSpec asserts the join-free
    // shape). Values below the first bound stay NULL — a lookup miss,
    // never a silent clamp into tier 0.
    "q110_interval_lookup" -> ((s, dir) =>
      RangeLookupOps.intervalLookup(
          Tables(s, dir, "orders").select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
          col("cents"), PriceTiers)
        .select(col("o_orderkey"), col("cents"), col("tier_id"),
                col("tier"), col("tier_lo"))
        .orderBy(col("o_orderkey"))),

    // Q111 — exact set-similarity join over 3-shingle sets at Jaccard
    // >= 1/2 ([[graft.operators.SetSimJoin]]): the EXACT member of the
    // near-dup family — prefix + length filtering prune candidates with
    // zero miss probability, unlike the MinHash-LSH path (x06/x16)
    // where a qualifying pair can land in no common band. The oracle
    // generates candidates from ANY shared shingle, so a hash match
    // also re-proves completeness of the pruning on this corpus.
    "q111_setsim_join" -> ((s, dir) =>
      SetSimJoin.join(
          // STAGED words → shingles (TextFunctions:94): inlining
          // T.shingles(text) re-evaluates the split per element_at —
          // O(words²) per doc, measured ~2× the whole query at sf0.1
          Tables(s, dir, "documents")
            .select(col("doc_id"), T.words(col("text")).as("_w"))
            .select(col("doc_id"), array_distinct(
              T.shinglesFromWords(col("_w"), 3)).as("sh")),
          "doc_id", "sh", 1, 2)
        .orderBy(col("id_a"), col("id_b"))),

    // X124 — df-CAPPED set-similarity join: q111's exact join under
    // candidate GOVERNANCE. The r11 sf1 probe measured q111 at ~29× for
    // 10× data on the closed-vocabulary corpus (every shingle's df grows
    // linearly; the prefix filter stops pruning — SCALING.md r11). The
    // capped form returns EXACTLY the pairs with jac ≥ ½ whose shared
    // evidence includes at least one element with df ≤ 8 — pairs whose
    // every shared shingle is saturated-common are excluded BY
    // DEFINITION, and the capped rarest-first prefix is provably
    // zero-miss for that semantic ([[SetSimJoin.joinCapped]]). Candidate
    // fan-out is bounded by cap·Σdf — linear in the corpus whatever the
    // df distribution does. The oracle generates candidates from ANY
    // shared low-df element (no prefix), so parity re-proves the capped
    // pruning complete.
    "x124_capped_setsim" -> ((s, dir) =>
      SetSimJoin.joinCapped(
          Tables(s, dir, "documents")
            .select(col("doc_id"), T.words(col("text")).as("_w"))
            .select(col("doc_id"), array_distinct(
              T.shinglesFromWords(col("_w"), 3)).as("sh")),
          "doc_id", "sh", 1, 2, dfCap = 8L)
        .orderBy(col("id_a"), col("id_b"))),

    // X104 — exact binary-COSINE threshold join (cos >= 0.8 over the
    // distinct 3-gram shingle sets): the fourth exact-join family member. Same zero-miss
    // prefix architecture as q111 with the cosine bounds (overlap >=
    // tau²·max length, symmetric tau² length filter, integer
    // cross-multiplied verify); the oracle generates candidates from ANY
    // shared token, so hash parity re-proves the tighter cosine prefix
    // dropped no qualifying pair.
    "x104_cosine_setjoin" -> ((s, dir) =>
      SetSimJoin.cosineJoin(
          Tables(s, dir, "documents")
            .select(col("doc_id"), T.words(col("text")).as("_w"))
            .select(col("doc_id"), array_distinct(
              T.shinglesFromWords(col("_w"), 3)).as("sh")),
          "doc_id", "sh", 4, 5)
        .orderBy(col("id_a"), col("id_b"))),

    // Q118 — relational set operations with BAG semantics: INTERSECT /
    // EXCEPT in both DISTINCT and ALL forms over two derived order-key
    // multisets. ALL semantics are the subtle half (INTERSECT ALL keeps
    // min(multiplicity) per key, EXCEPT ALL subtracts multiplicities —
    // not what a distinct-then-join reformulation gives), and Spark's
    // intersectAll/exceptAll implement exactly the SQL bag rules the
    // oracle runs. Each arm collapses to one summary row (row count,
    // distinct keys, key checksum) so the hash pins multiplicities
    // exactly without shipping the multisets. Physically every arm is
    // one aggregate over a keyed anti/semi-style shuffle — no
    // all-pairs anything, scales with the smaller side's key count.
    "q118_bag_setops" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val a = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_custkey").as("k"))
      val b = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      def tag(df: DataFrame, op: String) = df
        .agg(count(lit(1)).as("n_rows"),
             count_distinct(col("k")).as("n_keys"),
             coalesce(sum(col("k")), lit(0L)).as("sum_k"))
        .select(lit(op).as("op"), col("n_rows"), col("n_keys"),
                col("sum_k"))
      tag(a.except(b), "except")
        .unionAll(tag(a.exceptAll(b), "except_all"))
        .unionAll(tag(a.intersect(b), "intersect"))
        .unionAll(tag(a.intersectAll(b), "intersect_all"))
        .orderBy(col("op"))
    }),

    // X110 — SKEW-SALTED enrichment join: a fact stream whose key
    // distribution has a dominant hot key (a third of all events folded
    // onto user 1 — the bot-account / null-surrogate shape) enriched
    // against the customer dimension through
    // [[graft.ops.SkewOps.saltedLeftJoin]]. The left side gets a
    // deterministic salt from its own row id, the dimension replicates
    // once per salt value, and the join key becomes (k, salt) — the hot
    // key's rows spread over 8 reducers instead of serializing on one.
    // The oracle is the PLAIN left join: hash parity is the proof that
    // salting changes the schedule, never the result. (AQE's runtime
    // skew split covers most cases; explicit salting is the stable-plan
    // tool when a key dominates so heavily that even split partitions
    // bottleneck — and it needs exactly this invariant checked.)
    "x110_salted_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_id"),
          when(col("user_id") % 3 === 0, 1L)
            .otherwise(col("user_id")).as("k"))
      val cust = Tables(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
      graft.ops.SkewOps
        .saltedLeftJoin(ev, cust, "k", buckets = 8,
                        saltFrom = Seq(col("event_id")))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_events"),
             count_distinct(col("k")).as("n_users"))
        .orderBy(col("seg"))
    }),

    // Q112 — skyline / Pareto frontier per brand (minimize price,
    // maximize size): the O(n log n) window formulation instead of the
    // textbook O(n²) NOT-EXISTS self-join (which the oracle runs — same
    // rows, quadratic work). A part survives iff no same-priced sibling
    // is strictly larger (sz = per-price max) AND every strictly cheaper
    // sibling is strictly smaller (sz > running max over cheaper rows —
    // a RANGE frame ending at price−1, so price ties never see each
    // other). Both windows ride ONE hashpartitioning(p_brand) exchange;
    // the brand is the parallelism unit, never a global sort.
    "q112_skyline" -> ((s, dir) =>
      skyline(Tables(s, dir, "part")
          .select(col("p_brand"), col("p_partkey"),
                  round(col("p_retailprice") * 100).cast("long")
                    .as("price_cents"),
                  col("p_size").cast("long").as("sz")))
        .orderBy(col("p_brand"), col("price_cents"), col("p_partkey"))),

    // Q113 — robust outlier census via MAD (median absolute deviation):
    // per-flag lower median of price, then lower median of |v − med|,
    // then count of rows beyond 3·MAD. Both order statistics use
    // PrefixSumOps.selectRanks over the COLLAPSED (flag, value) domain —
    // only the rank-carrying sketch range is ever shuffled — and the
    // two tiny per-flag tables (3 rows each) broadcast back onto the
    // fact scan, so the whole query is two rank selections plus one
    // re-scan with map-side joins. The robust-statistics twin of q82's
    // moment-based regression: immune to the heavy tail that drags a
    // mean/stddev z-score.
    "q113_mad_outliers" -> ((s, dir) =>
      madOutliers(Tables(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"),
                  round(col("l_extendedprice") * 100).cast("long").as("v")))
        .orderBy(col("flag"))))

  /** Q85 core — sequential funnel over (user_id, event_type, ts): stage
    * i+1 counts users whose first stage-(i+1) event falls strictly after
    * and within `window` of their first qualifying stage-i event. */
  def eventFunnel(events: DataFrame, stages: Seq[String],
                  window: String): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    val win = expr(window)
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_prev"))
    val frames = stages.tail.scanLeft(first) { (prev, st) =>
      ev.filter(col("event_type") === st)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col("t_prev") &&
                col("ts") <= col("t_prev") + win)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_prev"))
    }
    frames.zip(stages).zipWithIndex.map { case ((df, nm), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit((i + 1).toLong).as("stage"), lit(nm).as("stage_name"),
                col("users"))
    }.reduce(_ unionAll _).orderBy(col("stage"))
  }

  /** Q86 core — retention cohorts over pre-filtered activity events:
    * distinct (user, day-since-epoch0) → per-user min (cohort day) →
    * count of users per (cohort_day, offset_day). */
  def retentionCohorts(events: DataFrame, epoch0: String): DataFrame = {
    val w = events
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit(epoch0).cast("date"))
          .cast("long").as("d"))
      .distinct()
    val coh = w.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    w.join(coh, Seq("user_id"))
      .groupBy(col("cohort_day"),
        (col("d") - col("cohort_day")).as("offset_day"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("offset_day"))
  }

  /** Q88 core — first-order Markov transition matrix over per-user
    * sequences: ONE user_id-keyed window (lead) builds adjacent pairs,
    * the transition agg is bounded by |event types|², and the per-state
    * totals derive from that agg (never a second pass over the events)
    * and ride a broadcast. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_type").as("a"),
              col("ts"), col("event_id"))
      .withColumn("b", lead(col("a"), 1).over(w))
      .filter(col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val tot = pairs.groupBy(col("a")).agg(sum(col("n")).as("tot"))
    pairs.join(broadcast(tot), Seq("a"))
      .select(col("a"), col("b"), col("n"),
              expr("(n * 1000000) DIV tot").as("p_ppm"))
      .orderBy(col("a"), col("b"))
  }

  /** Q89 core — sweep-line peak overlap over closed integer-day intervals
    * (flag, d0, qty) ↦ [d0, d0 + qty days]: ±1 deltas → keyed agg
    * (collapses N rows to the distinct (flag, day) domain FIRST) →
    * prefix-sum window over that domain. Returns per flag the max
    * concurrent count and the first day (offset from `epoch0`) it is
    * reached. */
  def intervalPeak(intervals: DataFrame, epoch0: String): DataFrame = {
    val deltas = intervals
      .select(col("flag"), col("d0").as("d"), lit(1L).as("delta"))
      .unionAll(intervals.select(col("flag"),
        date_add(col("d0"), col("qty") + lit(1)).as("d"),
        lit(-1L).as("delta")))
      .groupBy(col("flag"), col("d")).agg(sum(col("delta")).as("delta"))
    val wCum = Window.partitionBy(col("flag")).orderBy(col("d"))
    val wAll = Window.partitionBy(col("flag"))
    deltas.withColumn("conc", sum(col("delta")).over(wCum))
      .withColumn("peak", max(col("conc")).over(wAll))
      .filter(col("conc") === col("peak"))
      .groupBy(col("flag"))
      .agg(min(col("peak")).as("peak"),
           min(datediff(col("d"), lit(epoch0).cast("date")))
             .cast("long").as("peak_day"))
      .orderBy(col("flag"))
  }

  /** Q90 core — weighted discrete median over (flag, v, w) rows: the
    * smallest v whose cumulative weight reaches (W+1) DIV 2. Same
    * value-domain design as [[discreteMedian]]: one combiner-friendly
    * hash agg collapses the input to (flag, v) weight totals and the
    * windows sort THAT. Returns (flag, v, tot). */
  def weightedMedian(rows: DataFrame): DataFrame = {
    val vc = rows.groupBy(col("flag"), col("v")).agg(sum(col("w")).as("c"))
    // near-unique price domain: rank selection over the range-split
    // weight domain (long keys take the native binary-search kernel) —
    // only the median-carrying range is shuffled, never a flag-only
    // window over the whole collapsed domain
    graft.ops.PrefixSumOps.selectRanks(vc, Seq("flag"), "v", "c",
        array(expr("(_tot + 1) DIV 2")))
      .select(col("flag"), col("v"), col("_tot").as("tot"))
  }

  /** Q91 core — triangle count over a distinct undirected edge list
    * (u < v) by degree orientation: each edge points from its
    * lower-(degree, id) endpoint to the higher one, so each triangle has
    * exactly one apex with out-arcs to both others (counted once) and the
    * wedge fan-out per node is bounded by O(√m), not the hub degree.
    * Returns one row: (n_nodes, n_edges, n_triangles). */
  def triangleCount(e0: DataFrame): DataFrame = {
    // the edge list feeds four consumers (degree union, orientation
    // join, closing semi-join, edge count) and is typically an expensive
    // construction (q91: two joins + distincts) — cache it, and cache
    // the oriented arcs the wedge self-join reads twice. Both are
    // edge-sized; at cluster scale MEMORY_AND_DISK spills, never OOMs.
    val e = e0.persist()
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val arcs = e
      .join(broadcast(deg.select(col("n").as("u"), col("d").as("du"))),
            Seq("u"))
      .join(broadcast(deg.select(col("n").as("v"), col("d").as("dv"))),
            Seq("v"))
      .select(when(fwd, col("u")).otherwise(col("v")).as("s"),
              when(fwd, col("v")).otherwise(col("u")).as("t"))
      .persist()
    val wedges = arcs.select(col("s"), col("t").as("t1"))
      .join(arcs.select(col("s"), col("t").as("t2")), Seq("s"))
      .filter(col("t1") < col("t2"))
      .select(col("t1").as("u"), col("t2").as("v"))
    val tri = wedges.join(e, Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(tri))
  }

  /** Discrete grouped median over a (prio, value, count) frame: the k-th
    * smallest element of the expanded multiset, k = (n+1) DIV 2, found by
    * cumulative counts. The cumulative sum is the two-phase distributed
    * prefix sum ([[graft.ops.PrefixSumOps]]) — q87's price domain is
    * near-unique, so a flag-only window over the collapsed domain would
    * still funnel a whole group through one task (the q104 hazard);
    * range-splitting bounds every task by |domain|/splits instead. */
  /** Discrete (k-th smallest) median of a (prio, value, count) domain:
    * rank selection, not a full prefix sum — only the range containing
    * rank (n+1) DIV 2 is ever shuffled or windowed. */
  private[graft] def discreteMedian(vc: DataFrame, valCol: String): DataFrame =
    graft.ops.PrefixSumOps.selectRanks(vc, Seq("prio"), valCol, "c",
        array(expr("(_tot + 1) DIV 2")))
      .select(col("prio"), col(valCol))

  /** Q112 core — 2-D skyline (Pareto frontier) per group: minimize the
    * 3rd column, maximize the 4th, positionally — (grp, id, x, y), names
    * preserved. A row survives iff no same-x sibling has larger y (y =
    * max over the x-tie RANGE frame; equal (x, y) duplicates all
    * survive — none strictly dominates) AND every strictly-smaller-x
    * sibling has strictly smaller y (y > max over the RANGE frame ending
    * at x−1; NULL for the cheapest x ⇒ trivially non-dominated). Both
    * frames share one partitionBy(grp).orderBy(x) spec, so Catalyst
    * collapses them into a SINGLE Window node over ONE
    * hashpartitioning(grp) exchange + one intra-group sort — O(n log n)
    * per group vs the oracle's O(n²) NOT-EXISTS self-join, and the group
    * is the parallelism unit (no global sort, no driver collect). */
  def skyline(pts: DataFrame): DataFrame = {
    val Seq(g, _, x, y) = pts.columns.toSeq.map(col)
    val w     = Window.partitionBy(g).orderBy(x)
    val tieMax   = max(y).over(
      w.rangeBetween(Window.currentRow, Window.currentRow))
    val lowerMax = max(y).over(
      w.rangeBetween(Window.unboundedPreceding, -1))
    pts.withColumn("_tie", tieMax).withColumn("_low", lowerMax)
      .filter(y === col("_tie") && (col("_low").isNull || y > col("_low")))
      .drop("_tie", "_low")
  }

  /** Q113 core — robust outlier census over (flag, v) via MAD: lower
    * median of v per flag, lower median of |v − med|, then the count of
    * rows beyond 3·MAD. Both order statistics are
    * [[graft.ops.PrefixSumOps.selectRanks]] rank selections over the
    * COLLAPSED (flag, value) count domain — only the rank-carrying
    * range is ever shuffled — and the two per-flag scalars (≤ |flags|
    * rows each) broadcast back onto the fact scan, so the whole query
    * is two rank selections plus one re-aggregation with map-side
    * joins. Returns (flag, med, mad, n, n_outliers). */
  def madOutliers(rows: DataFrame): DataFrame = {
    val vc = rows.groupBy(col("flag"), col("v"))
      .agg(count(lit(1)).as("c"))
    val med = graft.ops.PrefixSumOps.selectRanks(vc, Seq("flag"), "v",
        "c", array(expr("(_tot + 1) DIV 2")))
      .select(col("flag"), col("v").as("med"))
    val dev = vc.join(broadcast(med), Seq("flag"))
      .groupBy(col("flag"), abs(col("v") - col("med")).as("d"))
      .agg(sum(col("c")).as("c"))
    val mad = graft.ops.PrefixSumOps.selectRanks(dev, Seq("flag"), "d",
        "c", array(expr("(_tot + 1) DIV 2")))
      .select(col("flag"), col("d").as("mad"))
    // census over the COLLAPSED domain (vc is cached inside selectRanks):
    // |v − med| and the count both live there, so the raw fact table is
    // never re-scanned — at 100 TB the post-median work is domain-sized
    vc.join(broadcast(med), Seq("flag"))
      .join(broadcast(mad), Seq("flag"))
      .groupBy(col("flag"))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
           sum(col("c")).as("n"),
           sum(when(abs(col("v") - col("med")) > lit(3L) * col("mad"),
                    col("c")).otherwise(0L)).as("n_outliers"))
  }

  val oracleSql: Map[String, String] = Map(
    "q72_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 200000)
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey
                             AND o2.o_orderstatus = 'F'
                             AND o2.o_totalprice < 50000)
         ORDER BY c_custkey""",

    "q73_lateral_topk" ->
      """SELECT o.o_orderkey, t.l_linenumber, t.qty
         FROM orders o, LATERAL (
           SELECT l_linenumber, CAST(round(l_quantity) AS BIGINT) AS qty
           FROM lineitem WHERE l_orderkey = o.o_orderkey
           ORDER BY l_quantity DESC, l_linenumber LIMIT 2) t
         WHERE o.o_totalprice > 300000
         ORDER BY o_orderkey, l_linenumber, qty DESC""",

    "q74_bloom_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_totalprice > 250000)
         ORDER BY c_custkey""",

    "q75_map_funcs" ->
      """WITH kv AS (SELECT event_id, unnest(json_keys(props::JSON)) AS k,
                       props FROM events),
         v AS (SELECT event_id, k,
                 CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS v
               FROM kv
               UNION ALL
               SELECT event_id, 'evt', event_id % 100 FROM events)
         SELECT event_id, count(*) AS n_keys,
           array_to_string(list_sort(array_agg(k)), ',') AS keys_sorted,
           CAST(sum(v) AS BIGINT) AS sum_v,
           count(*) FILTER (WHERE v > 50) AS n_big
         FROM v GROUP BY event_id ORDER BY event_id""",

    "q76_array_setops" ->
      """WITH agg AS (SELECT l_orderkey,
           coalesce(list_sort(list_distinct(array_agg(l_linenumber)
             FILTER (WHERE l_quantity > 25))), []) AS a,
           coalesce(list_sort(list_distinct(array_agg(l_linenumber)
             FILTER (WHERE l_discount > 0.05))), []) AS b
          FROM lineitem GROUP BY l_orderkey)
         SELECT l_orderkey,
           coalesce(array_to_string(list_sort(list_intersect(a, b)), ','),
             '') AS ln_both,
           coalesce(array_to_string(
             list_sort(list_distinct(list_concat(a, b))), ','), '') AS ln_any,
           coalesce(array_to_string(list_sort(list_filter(a,
             x -> NOT list_contains(b, x))), ','), '') AS ln_only_a
         FROM agg ORDER BY l_orderkey""",

    "q77_listagg" ->
      """SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
         FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name ORDER BY r.r_name""",

    "q78_mode_udaf" ->
      """SELECT c_nationkey, c_mktsegment AS seg_mode FROM (
           SELECT c_nationkey, c_mktsegment,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY cnt DESC, c_mktsegment ASC) AS rn
           FROM (SELECT c_nationkey, c_mktsegment, count(*) AS cnt
                 FROM customer GROUP BY 1, 2))
         WHERE rn = 1 ORDER BY c_nationkey""",

    "q79_ignore_nulls" ->
      """WITH b AS (SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'click'
                  THEN CAST(round(value * 100) AS BIGINT) END AS v
           FROM events)
         SELECT user_id, event_id,
           last_value(v IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried,
           lag(v IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
           first_value(v IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v
         FROM b ORDER BY user_id, event_id""",

    "q80_dynamic_pivot" ->
      """PIVOT customer ON c_mktsegment USING count(*)
         GROUP BY c_nationkey ORDER BY c_nationkey""",

    "q81_recursive_cte" ->
      """WITH RECURSIVE anc(start_k, k, depth) AS (
           SELECT c_custkey, c_custkey, 0 FROM customer
           WHERE c_custkey % 100 = 0 AND c_custkey > 0
           UNION ALL
           SELECT a.start_k, c.c_custkey, a.depth + 1
           FROM anc a JOIN customer c ON c.c_custkey = a.k // 2
           WHERE a.k > 1)
         SELECT start_k, k, depth FROM anc
         ORDER BY start_k, depth""",

    "q82_regr_agg" ->
      """WITH m AS (
           SELECT l_returnflag, count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(x*x)::BIGINT AS sxx,
             sum(y)::BIGINT AS sy,
             sum(y::HUGEINT * y) AS syy, sum(x::HUGEINT * y) AS sxy
           FROM (SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS x,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
                 FROM lineitem)
           GROUP BY l_returnflag),
         d AS (SELECT l_returnflag, n,
             n::DOUBLE AS nd, sx::DOUBLE AS sxd, sxx::DOUBLE AS sxxd,
             sy::DOUBLE AS syd, syy::DOUBLE AS syyd, sxy::DOUBLE AS sxyd
           FROM m)
         SELECT l_returnflag, n,
           round((nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd), 6) + 0.0
             AS slope,
           round((syd*sxxd - sxd*sxyd) / (nd*sxxd - sxd*sxd), 4) + 0.0
             AS intercept,
           round((nd*sxyd - sxd*syd)*(nd*sxyd - sxd*syd) /
                 ((nd*sxxd - sxd*sxd)*(nd*syyd - syd*syd)), 6) + 0.0 AS r2
         FROM d ORDER BY l_returnflag""",

    "q83_graph_bfs" ->
      """WITH RECURSIVE e AS (
           SELECT DISTINCT l_orderkey AS o, l_suppkey AS su FROM lineitem),
         edges AS (
           SELECT 'S' || su AS src, 'O' || o AS dst FROM e
           UNION ALL
           SELECT 'O' || o, 'S' || su FROM e),
         bfs(node, dist) AS (
           SELECT DISTINCT 'S' || su, 0 FROM e WHERE su % 50 = 1
           UNION
           SELECT edges.dst, bfs.dist + 1
           FROM bfs JOIN edges ON edges.src = bfs.node
           WHERE bfs.dist < 4)
         SELECT node, CAST(min(dist) AS BIGINT) AS dist
         FROM bfs GROUP BY node ORDER BY dist, node""",

    "q84_skew_profile" ->
      """WITH c AS (SELECT l_suppkey, count(*)::BIGINT AS cnt
                    FROM lineitem GROUP BY l_suppkey),
         s AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS n_keys
               FROM c)
         SELECT l_suppkey, cnt,
           (cnt * 1000000) // total AS share_ppm,
           (cnt * n_keys * 1000) // total AS skew_x1000
         FROM c CROSS JOIN s
         ORDER BY cnt DESC, l_suppkey LIMIT 10""",

    "q85_event_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t_click
               FROM events e JOIN v USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > v.t_view
                 AND e.ts <= v.t_view + INTERVAL 24 HOURS
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t_buy
               FROM events e JOIN c USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                 AND e.ts <= c.t_click + INTERVAL 24 HOURS
               GROUP BY e.user_id)
         SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
                count(*)::BIGINT AS users FROM v
         UNION ALL
         SELECT 2, 'click', count(*)::BIGINT FROM c
         UNION ALL
         SELECT 3, 'purchase', count(*)::BIGINT FROM p
         ORDER BY stage""",

    "q86_retention_cohorts" ->
      """WITH w AS (SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d
           FROM events WHERE event_type = 'purchase'),
         coh AS (SELECT user_id, min(d) AS cohort_day FROM w
                 GROUP BY user_id)
         SELECT cohort_day, d - cohort_day AS offset_day,
           count(*)::BIGINT AS n_users
         FROM w JOIN coh USING (user_id)
         GROUP BY cohort_day, offset_day
         ORDER BY cohort_day, offset_day""",

    "q87_mad_outliers" ->
      """WITH vc AS (SELECT o_orderpriority AS prio, o_totalprice AS v,
                       count(*)::BIGINT AS c FROM orders GROUP BY 1, 2),
         m AS (SELECT prio, v AS med FROM (
             SELECT prio, v, c,
               sum(c) OVER (PARTITION BY prio ORDER BY v) AS cum,
               sum(c) OVER (PARTITION BY prio) AS cnt FROM vc)
           WHERE cum - c < (cnt + 1) // 2 AND (cnt + 1) // 2 <= cum),
         dc AS (SELECT vc.prio, abs(v - med) AS dev, sum(c)::BIGINT AS c
                FROM vc JOIN m USING (prio) GROUP BY 1, 2),
         md AS (SELECT prio, dev AS mad FROM (
             SELECT prio, dev, c,
               sum(c) OVER (PARTITION BY prio ORDER BY dev) AS cum,
               sum(c) OVER (PARTITION BY prio) AS cnt FROM dc)
           WHERE cum - c < (cnt + 1) // 2 AND (cnt + 1) // 2 <= cum)
         SELECT prio, min(med) AS med, min(mad) AS mad,
           sum(c)::BIGINT AS n,
           sum(CASE WHEN dev > mad * 2 THEN c ELSE 0 END)::BIGINT
             AS n_outliers
         FROM dc JOIN md USING (prio) JOIN m USING (prio)
         GROUP BY prio ORDER BY prio""",

    "q88_markov_transitions" ->
      """WITH seq AS (SELECT user_id, event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS b
           FROM events),
         p AS (SELECT a, b, count(*)::BIGINT AS n FROM seq
               WHERE b IS NOT NULL GROUP BY a, b),
         t AS (SELECT a, sum(n)::BIGINT AS tot FROM p GROUP BY a)
         SELECT a, b, n, (n * 1000000) // tot AS p_ppm
         FROM p JOIN t USING (a) ORDER BY a, b""",

    "q89_interval_peak" ->
      """WITH li AS (SELECT l_returnflag AS flag, l_shipdate::DATE AS d0,
                       CAST(l_quantity AS INT) AS qty FROM lineitem),
         pts AS (SELECT flag, d0 AS d, 1::BIGINT AS delta FROM li
                 UNION ALL
                 SELECT flag, d0 + qty + 1, -1::BIGINT FROM li),
         dd AS (SELECT flag, d, sum(delta)::BIGINT AS delta FROM pts
                GROUP BY flag, d),
         cum AS (SELECT flag, d,
                   sum(delta) OVER (PARTITION BY flag ORDER BY d) AS conc
                 FROM dd),
         pk AS (SELECT flag, max(conc)::BIGINT AS peak FROM cum
                GROUP BY flag)
         SELECT flag, min(peak)::BIGINT AS peak,
           CAST(min(d - DATE '1992-01-01') AS BIGINT) AS peak_day
         FROM cum JOIN pk USING (flag) WHERE conc = peak
         GROUP BY flag ORDER BY flag""",

    "q90_weighted_median" ->
      """WITH vc AS (SELECT l_returnflag AS flag,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                       sum(CAST(l_quantity AS BIGINT))::BIGINT AS c
                     FROM lineitem GROUP BY flag, v)
         SELECT flag, v AS wmedian_cents, tot::BIGINT AS total_w FROM (
           SELECT flag, v, c,
             sum(c) OVER (PARTITION BY flag ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY flag) AS tot FROM vc)
         WHERE cum - c < (tot + 1) // 2 AND (tot + 1) // 2 <= cum
         ORDER BY flag""",

    "q91_triangle_count" ->
      """WITH big AS (SELECT o_orderkey FROM orders
                      WHERE o_totalprice > 400000),
         it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                FROM lineitem JOIN big ON l_orderkey = o_orderkey),
         e AS (SELECT DISTINCT a.p AS u, b.p AS v
               FROM it a JOIN it b ON a.ok = b.ok AND a.p < b.p)
         SELECT
           (SELECT count(*)::BIGINT FROM
             (SELECT u AS n FROM e UNION SELECT v FROM e)) AS n_nodes,
           (SELECT count(*)::BIGINT FROM e) AS n_edges,
           (SELECT count(*)::BIGINT
            FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
             AS n_triangles""",

    "q108_scd2_intervals" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev
           FROM events),
         c AS (SELECT user_id, ts, event_id, event_type FROM e
               WHERE prev IS NULL OR prev <> event_type),
         v AS (SELECT user_id, event_type, ts AS valid_from,
                 lead(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS valid_to,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS version
               FROM c)
         SELECT user_id, version, event_type, valid_from, valid_to,
           valid_to IS NULL AS is_current
         FROM v ORDER BY user_id, version""",

    "q109_merge_apply" ->
      """WITH base AS (SELECT c_custkey, c_name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
           FROM customer),
         upd AS (SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN 'delete'
                  ELSE 'upsert' END AS op,
             'UPD:' || c_name AS n_name, bal_cents + 10000 AS n_bal
           FROM base WHERE c_custkey % 7 = 0),
         ins AS (SELECT c_custkey + 1000000 AS c_custkey, 'upsert' AS op,
             'NEW:' || c_name AS n_name, bal_cents AS n_bal
           FROM base WHERE c_custkey % 11 = 4),
         ch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
         j AS (SELECT coalesce(b.c_custkey, c.c_custkey) AS c_custkey,
             CASE WHEN c.op = 'upsert' THEN c.n_name
                  ELSE b.c_name END AS c_name,
             CASE WHEN c.op = 'upsert' THEN c.n_bal
                  ELSE b.bal_cents END AS bal_cents,
             c.op
           FROM base b FULL JOIN ch c ON c.c_custkey = b.c_custkey)
         SELECT c_custkey, c_name, bal_cents FROM j
         WHERE op IS NULL OR op <> 'delete' ORDER BY c_custkey""",

    // The naive interval JOIN the engine-side query refuses to run —
    // same rows, O(|tiers|) probes per order. Tier rows are generated
    // from the same PriceTiers constant so the two sides cannot drift.
    "q110_interval_lookup" -> {
      val rows = PriceTiers.zipWithIndex.map { case ((lo, nm), i) =>
        val hi = PriceTiers.lift(i + 1).map(_._1).getOrElse(Long.MaxValue)
        if (i == 0) s"($i::BIGINT, '$nm', $lo::BIGINT, $hi::BIGINT)"
        else s"($i, '$nm', $lo, $hi)"
      }.mkString(",\n             ")
      s"""WITH tiers(tier_id, tier, lo, hi) AS (VALUES
             $rows),
         o AS (SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
         SELECT o.o_orderkey, o.cents, t.tier_id, t.tier, t.lo AS tier_lo
         FROM o JOIN tiers t ON o.cents >= t.lo AND o.cents < t.hi
         ORDER BY o.o_orderkey"""
    },

    // Candidates from ANY shared shingle (no prefix filter): exact
    // semantics stated independently of the pruning under test.
    "q118_bag_setops" ->
      """WITH a AS (SELECT o_custkey AS k FROM orders
                    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
          b AS (SELECT o_custkey AS k FROM orders
                WHERE o_orderstatus = 'F'),
          i  AS (SELECT k FROM a INTERSECT SELECT k FROM b),
          ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
          e  AS (SELECT k FROM a EXCEPT SELECT k FROM b),
          ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
         SELECT * FROM (
           SELECT 'except' AS op, count(*)::BIGINT AS n_rows,
             count(DISTINCT k)::BIGINT AS n_keys,
             coalesce(sum(k), 0)::BIGINT AS sum_k FROM e
           UNION ALL
           SELECT 'except_all', count(*)::BIGINT,
             count(DISTINCT k)::BIGINT, coalesce(sum(k), 0)::BIGINT FROM ea
           UNION ALL
           SELECT 'intersect', count(*)::BIGINT,
             count(DISTINCT k)::BIGINT, coalesce(sum(k), 0)::BIGINT FROM i
           UNION ALL
           SELECT 'intersect_all', count(*)::BIGINT,
             count(DISTINCT k)::BIGINT, coalesce(sum(k), 0)::BIGINT FROM ia)
         ORDER BY op""",

    // plain join, no salt: parity proves salting never changes results
    "x110_salted_join" ->
      """WITH e AS (SELECT event_id,
              CASE WHEN user_id % 3 = 0 THEN 1 ELSE user_id END AS k
            FROM events)
         SELECT c_mktsegment AS seg, count(*)::BIGINT AS n_events,
           count(DISTINCT k)::BIGINT AS n_users
         FROM e LEFT JOIN customer ON c_custkey = k
         GROUP BY 1 ORDER BY 1""",

    "q111_setsim_join" ->
      s"""WITH s AS (SELECT doc_id, list_distinct($shinglesSql) AS sh
                     FROM documents),
         e AS (SELECT doc_id, unnest(sh) AS g FROM s),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM e a JOIN e b ON b.g = a.g AND b.doc_id > a.doc_id),
         v AS (SELECT id_a, id_b,
                 len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))::BIGINT
                   AS inter,
                 (len(sa.sh) + len(sb.sh))::BIGINT AS tot
               FROM cand
               JOIN s sa ON sa.doc_id = cand.id_a
               JOIN s sb ON sb.doc_id = cand.id_b)
         SELECT id_a, id_b, inter, tot - inter AS uni,
                round(inter::DOUBLE / (tot - inter), 4) AS jac
         FROM v WHERE inter * 2 >= (tot - inter) * 1
         ORDER BY id_a, id_b""",

    // candidates from ANY shared LOW-DF token (no prefix) — parity
    // re-proves the capped rarest-first prefix is zero-miss for the
    // "jac ≥ τ and min shared df ≤ cap" semantic
    "x124_capped_setsim" ->
      s"""WITH s AS (SELECT doc_id, list_distinct($shinglesSql) AS sh
                     FROM documents),
         e AS (SELECT doc_id, unnest(sh) AS g FROM s),
         dfq AS (SELECT g, count(*)::BIGINT AS df FROM e GROUP BY g),
         le AS (SELECT e.doc_id, e.g FROM e JOIN dfq USING (g)
                WHERE df <= 8),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM le a JOIN le b ON b.g = a.g AND b.doc_id > a.doc_id),
         v AS (SELECT id_a, id_b,
                 len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))::BIGINT
                   AS inter,
                 (len(sa.sh) + len(sb.sh))::BIGINT AS tot
               FROM cand
               JOIN s sa ON sa.doc_id = cand.id_a
               JOIN s sb ON sb.doc_id = cand.id_b)
         SELECT id_a, id_b, inter, tot - inter AS uni,
                round(inter::DOUBLE / (tot - inter), 4) AS jac
         FROM v WHERE inter * 2 >= (tot - inter) * 1
         ORDER BY id_a, id_b""",

    // candidates from ANY shared token — parity re-proves the cosine
    // prefix filter is zero-miss
    "x104_cosine_setjoin" ->
      s"""WITH s AS (SELECT doc_id, list_distinct($shinglesSql) AS ws
                     FROM documents),
         e AS (SELECT doc_id, unnest(ws) AS g FROM s),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM e a JOIN e b ON b.g = a.g AND b.doc_id > a.doc_id),
         v AS (SELECT id_a, id_b,
                 len(list_filter(sa.ws, x -> list_contains(sb.ws, x)))::BIGINT
                   AS inter,
                 len(sa.ws)::BIGINT AS n_a, len(sb.ws)::BIGINT AS n_b
               FROM cand
               JOIN s sa ON sa.doc_id = cand.id_a
               JOIN s sb ON sb.doc_id = cand.id_b)
         SELECT id_a, id_b, inter, n_a, n_b,
                round(inter::DOUBLE / sqrt((n_a * n_b)::DOUBLE), 4) AS cos
         FROM v WHERE inter * inter * 25 >= n_a * n_b * 16
         ORDER BY id_a, id_b""",

    // The textbook quadratic dominance check — the window formulation in
    // `queries` must reproduce it exactly.
    "q112_skyline" ->
      """WITH p AS (SELECT p_brand, p_partkey,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS sz
           FROM part)
         SELECT p_brand, p_partkey, price_cents, sz FROM p a
         WHERE NOT EXISTS (SELECT 1 FROM p b
             WHERE b.p_brand = a.p_brand
               AND b.price_cents <= a.price_cents AND b.sz >= a.sz
               AND (b.price_cents < a.price_cents OR b.sz > a.sz))
         ORDER BY p_brand, price_cents, p_partkey""",

    "q113_mad_outliers" ->
      """WITH r AS (SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
           FROM lineitem),
         vc AS (SELECT flag, v, count(*)::BIGINT AS c FROM r GROUP BY 1, 2),
         m AS (SELECT flag, min(v) AS med FROM (
             SELECT flag, v,
               sum(c) OVER (PARTITION BY flag ORDER BY v) AS cum,
               sum(c) OVER (PARTITION BY flag) AS tot
             FROM vc)
           WHERE cum >= (tot + 1) // 2 GROUP BY flag),
         dc AS (SELECT vc.flag, abs(vc.v - m.med) AS d, sum(vc.c) AS c
           FROM vc JOIN m USING (flag) GROUP BY 1, 2),
         md AS (SELECT flag, min(d) AS mad FROM (
             SELECT flag, d,
               sum(c) OVER (PARTITION BY flag ORDER BY d) AS cum,
               sum(c) OVER (PARTITION BY flag) AS tot
             FROM dc)
           WHERE cum >= (tot + 1) // 2 GROUP BY flag)
         SELECT r.flag, m.med, md.mad, count(*)::BIGINT AS n,
           sum(CASE WHEN abs(r.v - m.med) > 3 * md.mad
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
         FROM r JOIN m USING (flag) JOIN md USING (flag)
         GROUP BY 1, 2, 3 ORDER BY 1""")
}
