package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — a-priori's pair stage as one keyed
  * dataflow (q102's engine; ref semantics: SURVEY §2 analytics family).
  *
  * Support comes from a per-basket pair expansion, NOT a basket self-join
  * (which would shuffle the item list twice more, once per join side):
  * the distinct (basket, item) stream is pruned first, baskets are
  * materialized exactly once from the survivors, and pairs are a
  * map-side HOF over each sorted item array — Σ basket² work, bounded by
  * basket width, never catalog².
  *
  * The quadratic term is tamed by the standard a-priori prune: a pair
  * reaching `minSup` needs BOTH items at `minSup`, so items below it are
  * dropped BEFORE pair expansion. That turns the pathological mega-basket
  * (one basket of 10⁵ one-off items = 10¹⁰ structs in a single task) into
  * a no-op — its one-off items can never form a qualifying pair — while
  * leaving the result bit-identical on any input (monotonicity:
  * sup_ab ≤ min(sup_a, sup_b)).
  */
object MarketBasket {

  /** @param items  (ok, p) rows — basket id, item id
    * @param minSup minimum pair support (baskets containing both items)
    * @return (ante, cons, sup_ab, conf_x1000, lift_x1000), both rule
    *         directions, confidence/lift in integer thousandths */
  def rules(items: DataFrame, minSup: Int = 2)
           (implicit scope: graft.ops.CacheScope): DataFrame = {
    // distinct (basket, item) pairs are the shared basis: item supports,
    // the basket count, and the pruned basket build all read it —
    // in-basket repeats collapse here ONCE instead of inside a
    // collect_set per consumer
    val d = scope.persist(items.select(col("ok"), col("p")).distinct())
    val nOrders = d.agg(count_distinct(col("ok")).as("n_orders"))
    val supItem = d.groupBy(col("p")).agg(count(lit(1)).as("sup_i"))
    // a-priori prune: restrict the item stream to minSup-frequent items
    // BEFORE baskets are ever materialized — the basket arrays are built
    // exactly once, already pruned (the earlier shape built them, then
    // exploded, semi-joined, and rebuilt them: one full extra
    // materialization of every basket). The frequent set joins by
    // broadcast (catalog-sized, same bound as the rule joins below).
    val frequent = supItem.filter(col("sup_i") >= minSup).select(col("p"))
    val pruned = d
      .join(broadcast(frequent), Seq("p"), "left_semi")
      .groupBy(col("ok"))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
    val supPair = pruned
      .select(explode(expr(
        """flatten(transform(ps, (a, i) ->
             transform(slice(ps, i + 2, size(ps)), b ->
               named_struct('pa', a, 'pb', b))))""")).as("e"))
      .groupBy(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= minSup)
    // both rule directions from ONE pass over the pair counts (a
    // unionAll of two selects would re-run the whole pair aggregation
    // per branch — no exchange reuse across union branches)
    val rules = supPair
      .select(explode(array(
        struct(col("pa").as("ante"), col("pb").as("cons"),
               col("sup_ab")),
        struct(col("pb").as("ante"), col("pa").as("cons"),
               col("sup_ab")))).as("r"))
      .select(col("r.ante").as("ante"), col("r.cons").as("cons"),
              col("r.sup_ab").as("sup_ab"))
    rules
      .join(broadcast(supItem.select(col("p").as("ante"),
                                     col("sup_i").as("sup_a"))), Seq("ante"))
      .join(broadcast(supItem.select(col("p").as("cons"),
                                     col("sup_i").as("sup_c"))), Seq("cons"))
      .crossJoin(broadcast(nOrders))
      .select(col("ante"), col("cons"), col("sup_ab"),
              expr("(1000 * sup_ab) DIV sup_a").as("conf_x1000"),
              expr("(1000 * sup_ab * n_orders) DIV (sup_a * sup_c)")
                .as("lift_x1000"))
  }
}
