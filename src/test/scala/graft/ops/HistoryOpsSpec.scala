package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HistoryOpsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("validityIntervals + snapshotAt reconstruct point-in-time state") {
    import spark.implicits._
    val log = Seq(
      (1L, "k1", "bronze", ts("2024-01-01 00:00:00")),
      (2L, "k1", "silver", ts("2024-02-01 00:00:00")),
      (3L, "k1", "gold",   ts("2024-03-01 00:00:00")),
      (4L, "k2", "bronze", ts("2024-01-15 00:00:00")))
      .toDF("id", "key", "tier", "changed_at")
    val iv = HistoryOps.validityIntervals(log, Seq("key"), "changed_at",
      Seq(col("id")))
    // latest row per key is open-ended
    val open = iv.filter(col("valid_to").isNull)
      .select("id").as[Long].collect().toSet
    assert(open == Set(3L, 4L))
    // snapshot mid-February: k1 is silver, k2 bronze
    val snap = HistoryOps.snapshotAt(iv, lit(ts("2024-02-15 00:00:00")))
      .select("key", "tier").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(snap == Map("k1" -> "silver", "k2" -> "bronze"))
    // intervals tile: each row's valid_to equals the next row's valid_from
    val k1 = iv.filter(col("key") === "k1").orderBy("valid_from")
      .select("valid_from", "valid_to").collect()
    assert((0 until k1.length - 1).forall(i =>
      k1(i).getTimestamp(1) == k1(i + 1).getTimestamp(0)))
  }
}
