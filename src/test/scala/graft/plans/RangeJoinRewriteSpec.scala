package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The injected optimizer rule must turn naive |Δsec| ≤ gap inner joins
  * into banded equi-joins — same rows, no nested-loop scan — and must
  * leave joins that already have an equi key alone. */
class RangeJoinRewriteSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkEvents(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong,
       ts(f"2024-01-01 ${rnd.nextInt(3)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"))
    }.toDF("id", "ts")
  }

  test("inequality-only temporal join is rewritten: equi plan, identical rows") {
    val a = mkEvents(200, 1).toDF("id_a", "ts_a")
    val b = mkEvents(150, 2).toDF("id_b", "ts_b")
    val joined = a.join(b,
      abs(unix_timestamp(col("ts_a")) - unix_timestamp(col("ts_b"))) <= 90 &&
      col("id_a") =!= col("id_b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      "rule should have produced an equi-join:\n" + plan.take(3000))
    // ground truth from a driver-side double loop
    val av = a.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000))
    val bv = b.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000))
    val expected = (for {
      (ia, sa) <- av; (ib, sb) <- bv
      if ia != ib && math.abs(sa - sb) <= 90
    } yield (ia, ib)).toSet
    val got = joined.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.size == joined.count(), "rewrite must not duplicate pairs")
  }

  test("joins with an equi key are left to the planner (no probe column)") {
    import spark.implicits._
    val a = mkEvents(50, 3).withColumn("k", col("id") % 5)
    val b = mkEvents(50, 4).toDF("id_b", "ts_b").withColumn("k", col("id_b") % 5)
    val joined = a.join(b, Seq("k")).filter(
      abs(unix_timestamp(col("ts")) - unix_timestamp(col("ts_b"))) <= 300)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("_graft_range_probe"), plan.take(2000))
    assert(joined.count() > 0)
  }
}
