package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoinBackward: latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),  // after both purchases
      (2L, "u1", ts("2024-01-01 08:30:00")),  // between them
      (3L, "u1", ts("2024-01-01 07:00:00")),  // before any → null
      (4L, "u2", ts("2024-01-01 09:00:00")),  // exact-ts match (inclusive)
      (5L, "u3", ts("2024-01-01 09:00:00")))  // key with no right rows
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 08:00:00")),
      (102L, "u1", ts("2024-01-01 09:00:00")),
      (103L, "u2", ts("2024-01-01 09:00:00")),
      (104L, "u2", ts("2024-01-01 09:00:00"))) // tie → max event_id wins
      .toDF("event_id", "user_id", "ts")
    val out = TemporalJoins.asofJoinBackward(left, right, Seq("user_id"),
        "ts", "ts", Seq("event_id"), "_p")
      .select("event_id", "event_id_p")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> Some(102L), 2L -> Some(101L), 3L -> None,
                      4L -> Some(104L), 5L -> None))
  }

  test("asofJoinBackward preserves all left columns and row count") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, s"u${i % 5}",
      ts(f"2024-01-01 ${i % 24}%02d:00:00"), s"payload$i"))
      .toDF("id", "k", "ts", "extra")
    val right = (1 to 20).map(i => (i * 1000L, s"u${i % 5}",
      ts(f"2024-01-01 ${(i * 3) % 24}%02d:30:00")))
      .toDF("rid", "k", "ts")
    val out = TemporalJoins.asofJoinBackward(left, right, Seq("k"),
      "ts", "ts", Seq("rid"))
    assert(out.count() == 100)
    assert(out.columns.toSeq == Seq("id", "k", "ts", "extra", "ts_r", "rid_r"))
  }

  test("asofJoinForward: earliest right row at-or-after each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts("2024-01-01 07:00:00")),  // before both → first (101)
      (2L, "u1", ts("2024-01-01 08:30:00")),  // between → 102
      (3L, "u1", ts("2024-01-01 10:00:00")),  // after all → null
      (4L, "u2", ts("2024-01-01 09:00:00")))  // exact tie → min id (103)
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 08:00:00")),
      (102L, "u1", ts("2024-01-01 09:00:00")),
      (103L, "u2", ts("2024-01-01 09:00:00")),
      (104L, "u2", ts("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = TemporalJoins.asofJoinForward(left, right, Seq("user_id"),
        "ts", "ts", Seq("event_id"), "_p")
      .select("event_id", "event_id_p")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None,
                      4L -> Some(103L)))
  }

  test("asofJoinNearest: closest right row wins, exact ties prefer backward") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts("2024-01-01 08:10:00")),  // 10 min after 101, 50 before 102 → 101
      (2L, "u1", ts("2024-01-01 08:50:00")),  // 50 after 101, 10 before 102 → 102
      (3L, "u1", ts("2024-01-01 08:30:00")),  // exact 30/30 tie → backward (101)
      (4L, "u2", ts("2024-01-01 05:00:00")))  // only a later right row → it
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 08:00:00")),
      (102L, "u1", ts("2024-01-01 09:00:00")),
      (103L, "u2", ts("2024-01-01 23:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = TemporalJoins.asofJoinNearest(left, right, Seq("user_id"),
        "ts", "ts", Seq("event_id"), "_p")
      .select("event_id", "event_id_p")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 101L, 2L -> 102L, 3L -> 101L, 4L -> 103L))
  }

  test("rangeSelfJoin matches the brute-force inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val df = (1 to 300).map { i =>
      (i.toLong, s"u${rnd.nextInt(5)}",
       ts(f"2024-01-01 ${rnd.nextInt(4)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"))
    }.toDF("id", "k", "ts")
    val fast = TemporalJoins.rangeSelfJoin(df, Seq("k"), "id", "ts", 120L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // no duplicate pairs from the 3-cell probe
    assert(fast.length == fast.toSet.size)
    val a = df.select(col("k"), col("id").as("id_a"),
      unix_timestamp(col("ts")).as("sa"))
    val b = df.select(col("k").as("k2"), col("id").as("id_b"),
      unix_timestamp(col("ts")).as("sb"))
    val brute = a.join(b, col("k") === col("k2") &&
        col("id_a") < col("id_b") && abs(col("sb") - col("sa")) <= 120)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast.toSet == brute)
  }
}
