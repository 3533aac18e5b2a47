package graft

import org.apache.spark.sql.functions._

/** Invariant + plan-shape coverage for the round-6 ranking & allocation
  * surface (q92–q94, x59–x61). Cross-engine value parity is the DuckDB
  * oracle's job; these specs assert the properties that must hold at any
  * scale and on any partitioning. */
class RankingQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q92 pagerank: every rank carries at least the teleport mass, top-k ordered") {
    val rows = run("q92_pagerank").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getLong(1) >= 150000000L),
      "a node's rank can never fall below the teleport term")
    val ranks = rows.map(_.getLong(1)).toSeq
    assert(ranks == ranks.sortBy(-_), "output must be rank-descending")
  }

  test("q92 pagerank: frees every checkpointed round and the edge cache") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    run("q92_pagerank").count()
    assert(sc.getPersistentRDDs.size <= before + 1,
      "only the final round's checkpoint may survive the call")
  }

  test("q93 streaks: one row per user, len >= 2, start is a calendar date") {
    val rows = run("q93_streaks").collect()
    val users = rows.map(_.getLong(0))
    assert(users.distinct.length == users.length)
    assert(rows.forall(_.getLong(2) >= 2L))
    assert(rows.forall(_.getString(1).matches("\\d{4}-\\d{2}-\\d{2}")))
  }

  test("q94 allocation: slots sum to exactly 1000 and stay within 1 of proportional") {
    val rows = run("q94_allocation").collect()
    assert(rows.map(_.getLong(2)).sum == 1000L, "Hamilton must be exact")
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val base = 1000L * r.getLong(1) / total
      val slots = r.getLong(2)
      assert(slots == base || slots == base + 1,
        s"${r.getString(0)}: $slots not within 1 of floor share $base")
    }
  }

  test("x59 temperature mix: samples sum to 100k and small sources are upsampled") {
    val rows = run("x59_temperature_mix").collect()
    assert(rows.map(_.getLong(3)).sum == 100000L)
    // α = 0.5 ⇒ samples-per-doc must not increase with source size
    val perDoc = rows.sortBy(_.getLong(1))
      .map(r => r.getLong(3).toDouble / r.getLong(1))
    assert(perDoc.zip(perDoc.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"upsampling must favor small sources: ${perDoc.toSeq}")
  }

  test("x60 survivorship: keepers absorb only later doc ids, never themselves") {
    // at sf0.001 prefix families may be absent; the invariant is on the
    // construction, so assert via the full frame on sf0.01 only if rows
    val rows = SparkEntry.queries("x60_dedup_survivorship")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "sf0.01 testdata carries prefix near-dup families")
    assert(rows.forall(_.getLong(2) > 0L))
  }

  test("x61 fertility: ratios are exact integer thousandths of the sums") {
    val rows = run("x61_token_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tokens, subwords, chars) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getLong(5) == subwords * 1000 / tokens)
      assert(r.getLong(6) == chars * 1000 / tokens)
      assert(subwords >= tokens, "every word yields at least one subword")
    }
  }

  test("q92/q93 plans: no cartesian product, no nested-loop join on the big sides") {
    Seq("q92_pagerank", "q93_streaks").foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$n: ${plan.take(1500)}")
      if (n == "q93_streaks")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$n: ${plan.take(1500)}")
    }
  }
}
