package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** SURVEY.md §2.2 declared parity queries Q1–Q21: one per operator-inventory
  * row, each expressed through the graft.ops library on the driver testdata,
  * with a DuckDB-equivalent oracle (same column names, same total ORDER BY).
  */
object ParityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 — S5/P1 scan + projection
    "q01_scan_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                col("l_quantity"))),

    // Q2 — F1 case-insensitive null-safe substring containment
    "q02_filter_contains" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isNotNull &&
                lower(col("o_orderpriority")).contains("urgent"))
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))),

    // Q3 — F2 case-insensitive boundary-anchored regex containment
    "q03_filter_regex" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority").rlike("(?i)(^|[-\\s_])urgent([-\\s_]|$)"))
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))),

    // Q4 — F3/F4 set membership + conjunction
    "q04_filter_in" -> ((s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
                col("c_acctbal") >= 0)
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))),

    // Q5 — F6 closed timestamp range (fiscal-year window)
    "q05_filter_tsrange" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01 00:00:00").cast("timestamp") &&
                col("o_orderdate") <= lit("1997-06-30 23:59:59").cast("timestamp"))
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))),

    // Q6 — F7 string equality filter
    "q06_filter_eq" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))),

    // Q7 — D4/D5/H3 null-propagating dash concat
    "q07_concat_null" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
                ColumnOps.dashConcat(col("c_mktsegment"), col("c_name")).as("k"))
        .orderBy(col("c_custkey"))),

    // Q8 — D3 float-artifact strip
    "q08_strip_decimal" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
                ColumnOps.stripDecimalStr(col("l_quantity")).as("q"))),

    // Q9 — D6 prefix substring
    "q09_prefix_substr" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"), ColumnOps.prefix(col("c_name"), 5).as("p"))
        .orderBy(col("c_custkey"))),

    // Q10 — D7 split-on-first-dash with missing-delimiter guard
    "q10_split_dash" -> ((s, dir) => {
      val (code, name) = ColumnOps.splitFirst(col("o_orderpriority"), "-")
      t(s, dir, "orders")
        .select(col("o_orderkey"), code.as("code"), name.as("name"))
        .orderBy(col("o_orderkey"))
    }),

    // Q11 — D8 parse timestamp, null on failure
    "q11_ts_parse" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
                ColumnOps.toTimestampCoerce(col("ts")).as("t"))
        .orderBy(col("event_id"))),

    // Q12 — D9/D11 missing-marker normalization + default
    "q12_missing_default" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
                ColumnOps.defaultIfMissing(col("props"), "INT").as("r"))
        .orderBy(col("event_id"))),

    // Q13 — J1/J6 left join against prepared (projected + distinct) lookup
    "q13_join_lookup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = JoinOps.prepareLookup(t(s, dir, "nation"),
                                    Seq("n_nationkey", "n_name"))
      JoinOps.leftJoinExpr(c, n, c("c_nationkey") === n("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
        .orderBy(col("c_custkey"))
    }),

    // Q14 — J4 composite-key left join (self-join; Catalyst picks the
    // physical join: broadcast at small sf, shuffled hash/SMJ at scale)
    "q14_join_composite" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val r = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
                col("l_quantity").as("q2"))
      l.join(r, l("l_orderkey") === r("k1") && l("l_linenumber") === r("k2"),
             "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("q2"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — include q2 so the order is total
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("q2"))
    }),

    // Q15 — U1 union aligned by name
    "q15_union_by_name" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val b = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_orderstatus"))
      a.unionByName(b).orderBy(col("o_orderkey"), col("o_orderstatus"))
    }),

    // Q16 — U2/U4 keep-first dedup via explicit in-group order
    "q16_dedup_keepfirst" -> ((s, dir) =>
      DedupOps.dedupKeepFirstBy(t(s, dir, "orders"), Seq("o_custkey"),
                                Seq(col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"))
        .orderBy(col("o_custkey"))),

    // Q17 — U3 full-row distinct
    "q17_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Q18 — G1 deterministic group-mode (ties → smallest value)
    "q18_mode_tiebreak" -> ((s, dir) =>
      AggOps.modeDeterministic(t(s, dir, "customer"),
                               "c_nationkey", "c_mktsegment")
        .orderBy(col("c_nationkey"))),

    // Q19 — G2/G3 count + min/max
    "q19_minmax_count" -> ((s, dir) =>
      t(s, dir, "orders")
        .agg(count(lit(1)).as("n"),
             min(col("o_orderdate")).as("lo"),
             max(col("o_orderdate")).as("hi"))),

    // Q20 — P4 reshape-to-spec with missing source → all-null column
    "q20_reshape_spec" -> ((s, dir) => {
      val spec = Seq("cust_id" -> "c_custkey", "name" -> "c_name",
                     "missing_col" -> "c_does_not_exist")
      ReshapeOps.reshapeToSpec(t(s, dir, "customer"), spec)._1
        .orderBy(col("cust_id"))
    }),

    // U-extra — INTERSECT (distinct semantics in both engines)
    "q24_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // U-extra — EXCEPT (distinct semantics in both engines)
    "q25_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // W-extra — top-k per group (the WindowGroupLimit scale pattern)
    "q26_topk_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("total_cents").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
                round(col("o_totalprice") * 100).cast("long").as("total_cents"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // G-extra — ROLLUP hierarchy totals (integer cents ⇒ order-independent)
    "q27_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
             count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)),

    // Q21 — J2 + D9 left join with coalesce default
    "q21_join_coalesce" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"),
                ColumnOps.fillFrom(col("c_name"), lit("UNKNOWN")).as("cust_name"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q02_filter_contains" ->
      """SELECT o_orderkey FROM orders
         WHERE o_orderpriority IS NOT NULL
           AND contains(lower(o_orderpriority), 'urgent')
         ORDER BY o_orderkey""",
    "q03_filter_regex" ->
      """SELECT o_orderkey FROM orders
         WHERE regexp_matches(o_orderpriority, '(?i)(^|[-\s_])urgent([-\s_]|$)')
         ORDER BY o_orderkey""",
    "q04_filter_in" ->
      """SELECT c_custkey FROM customer
         WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_acctbal >= 0
         ORDER BY c_custkey""",
    "q05_filter_tsrange" ->
      """SELECT o_orderkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
           AND o_orderdate <= TIMESTAMP '1997-06-30 23:59:59'
         ORDER BY o_orderkey""",
    "q06_filter_eq" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_orderkey""",
    "q07_concat_null" ->
      """SELECT c_custkey, c_mktsegment || '-' || c_name AS k
         FROM customer ORDER BY c_custkey""",
    "q08_strip_decimal" ->
      """SELECT l_orderkey, l_linenumber,
                regexp_replace(trim(CAST(l_quantity AS VARCHAR)), '\.0$', '') AS q
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q09_prefix_substr" ->
      """SELECT c_custkey, substr(c_name, 1, 5) AS p
         FROM customer ORDER BY c_custkey""",
    "q10_split_dash" ->
      """SELECT o_orderkey,
                trim(split_part(o_orderpriority, '-', 1)) AS code,
                trim(split_part(o_orderpriority, '-', 2)) AS name
         FROM orders ORDER BY o_orderkey""",
    "q11_ts_parse" ->
      """SELECT event_id, TRY_CAST(CAST(ts AS VARCHAR) AS TIMESTAMP) AS t
         FROM events ORDER BY event_id""",
    "q12_missing_default" ->
      """SELECT event_id,
                CASE WHEN props IS NULL OR trim(props) IN ('','nan','NaN')
                     THEN 'INT' ELSE props END AS r
         FROM events ORDER BY event_id""",
    "q13_join_lookup" ->
      """SELECT c_custkey, n.n_name FROM customer c
         LEFT JOIN (SELECT DISTINCT n_nationkey, n_name FROM nation) n
           ON c.c_nationkey = n.n_nationkey
         ORDER BY c_custkey""",
    "q14_join_composite" ->
      """SELECT l.l_orderkey, l.l_linenumber, r.q2 FROM lineitem l
         LEFT JOIN (SELECT l_orderkey AS k1, l_linenumber AS k2,
                           l_quantity AS q2 FROM lineitem) r
           ON l.l_orderkey = r.k1 AND l.l_linenumber = r.k2
         ORDER BY l.l_orderkey, l.l_linenumber, r.q2""",
    "q15_union_by_name" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus='F'
           UNION ALL
           SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus='O')
         ORDER BY o_orderkey, o_orderstatus""",
    "q16_dedup_keepfirst" ->
      """SELECT o_custkey, o_orderkey FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderkey) AS rn
           FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "q17_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q18_mode_tiebreak" ->
      """SELECT c_nationkey, c_mktsegment FROM (
           SELECT c_nationkey, c_mktsegment,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY cnt DESC, c_mktsegment ASC) AS rn
           FROM (SELECT c_nationkey, c_mktsegment, count(*) AS cnt
                 FROM customer GROUP BY 1, 2))
         WHERE rn = 1 ORDER BY c_nationkey""",
    "q19_minmax_count" ->
      """SELECT count(*) AS n, min(o_orderdate) AS lo, max(o_orderdate) AS hi
         FROM orders""",
    "q20_reshape_spec" ->
      """SELECT c_custkey AS cust_id, c_name AS name,
                CAST(NULL AS VARCHAR) AS missing_col
         FROM customer ORDER BY cust_id""",
    "q21_join_coalesce" ->
      """SELECT o.o_orderkey, coalesce(c.c_name, 'UNKNOWN') AS cust_name
         FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         ORDER BY o.o_orderkey""",
    "q24_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey""",
    "q25_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_custkey""",
    "q26_topk_window" ->
      """SELECT o_custkey, o_orderkey, total_cents, rnk FROM (
           SELECT o_custkey, o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                             o_orderkey ASC) AS rnk
           FROM orders) t
         WHERE rnk <= 2 ORDER BY o_custkey, rnk""",
    "q27_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
  )
}
