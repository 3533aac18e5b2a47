package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixSumOpsSpec extends SparkSpec {

  test("runningSum matches a reference window on a grouped domain") {
    import spark.implicits._
    // two groups, deliberately skewed sizes, unsorted input
    val rows = (1 to 500).map(i => ("a", (i * 37) % 1000, 1L + i % 3)) ++
               (1 to 40).map(i => ("b", (i * 91) % 500, 2L))
    val df = rows.distinct.toDF("g", "v", "c").repartition(7)
    val got = PrefixSumOps.runningSum(df, Seq("g"), "v", "c", "cum", "tot",
        splits = 8)
      .select("g", "v", "cum", "tot")
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getLong(3))).toSet
    // reference: driver-side running sum per group in v order
    val expect = rows.distinct.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).toSeq.sortBy(_._1)
      val tot = sorted.map(_._2).sum
      sorted.scanLeft((0, 0L)) { case ((_, acc), (v, c)) => (v, acc + c) }
        .tail.map { case (v, cum) => (g, v, cum, tot) }
    }.toSet
    assert(got == expect)
  }

  test("runningSum is exact even when the sketch is degenerate (constant order key domain width 1 per split)") {
    import spark.implicits._
    // 3 distinct values with splits=8: most ranges empty, values pile into
    // few ranges — boundaries only unbalance tasks, never change the sum
    val df = Seq(("g", 1, 10L), ("g", 2, 20L), ("g", 3, 30L))
      .toDF("g", "v", "c").repartition(4)
    val got = PrefixSumOps.runningSum(df, Seq("g"), "v", "c", "cum", "tot",
        splits = 8)
      .orderBy("v").select("cum", "tot")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, 60L), (30L, 60L), (60L, 60L)))
  }

  test("runningSum stays partition-count invariant") {
    import spark.implicits._
    val rows = (1 to 300).map(i => ("s", i * 2, i.toLong))
    def run(parts: Int) =
      PrefixSumOps.runningSum(rows.toDF("g", "v", "c").repartition(parts),
          Seq("g"), "v", "c", "cum", "tot", splits = 5)
        .orderBy("v").select("cum")
        .collect().map(_.getLong(0)).toSeq
    assert(run(1) == run(13))
  }

  test("runningCount: exact positions under a string order with a coarse numeric cut key") {
    import spark.implicits._
    // order is (s, id); the cut key is only s's first char as a long —
    // heavily tied, so ranges hold many rows and ties must be resolved
    // by the within-range (s, id) sort
    val rows = (1 to 400).map { i =>
      val s = f"${(i * 7919) % 100}%02d-${i}%03d"
      ("g" + (i % 2), s, i.toLong)
    }
    val df = rows.toDF("g", "s", "id")
      .withColumn("_ck", substring(col("s"), 1, 1).cast("long"))
      .repartition(7)
    val got = PrefixSumOps.runningCount(df, Seq("g"), "_ck",
        Seq(col("s"), col("id")), "pos", splits = 8)
      .select("g", "s", "pos")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val expect = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy(identity)
        .zipWithIndex.map { case ((s, _), i) => (g, s, i + 1L) }
    }.toSet
    assert(got == expect)
  }

  test("runningCount stays partition-count invariant") {
    import spark.implicits._
    val rows = (1 to 300).map { i =>
      ("g" + (i % 3), f"${(i * 31) % 50}%02d-$i%03d", i.toLong)
    }
    def run(parts: Int) = PrefixSumOps.runningCount(
        rows.toDF("g", "s", "id")
          .withColumn("_ck", substring(col("s"), 1, 1).cast("long"))
          .repartition(parts),
        Seq("g"), "_ck", Seq(col("s"), col("id")), "pos", splits = 8)
      .select("g", "s", "pos")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(run(1) == run(13))
  }

  test("ungrouped (global-domain) paths: runningSum totals and selectRanks medians") {
    import spark.implicits._
    // 13 coprime to 997 and the range below it → all values distinct
    val vals = (1 to 200).map(i => ((i * 13) % 997).toLong)
    val df = vals.map((_, 1L)).toDF("v", "c").repartition(5)
    val cum = PrefixSumOps.runningSum(df, Seq(), "v", "c", "cum", "tot",
        splits = 8)
      .select("v", "cum", "tot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sorted = vals.sorted
    val expect = sorted.zipWithIndex
      .map { case (v, i) => (v, i + 1L, 200L) }.toSet
    assert(cum == expect)
    val med = PrefixSumOps.selectRanks(df, Seq(), "v", "c",
        array(expr("(_tot + 1) DIV 2")), splits = 8)
      .select("v").as[Long].collect().toSeq
    assert(med == Seq(sorted(99)))
  }

  test("selectRanks matches a reference selection (multi-rank, long keys, skewed groups)") {
    import spark.implicits._
    val rows = (1 to 500).map(i => ("a", ((i * 37) % 1000).toLong, 1L + i % 3)) ++
               (1 to 40).map(i => ("b", ((i * 91) % 500).toLong, 2L))
    val df = rows.distinct.toDF("g", "v", "c").repartition(7)
    // median and p90 per group, in one call
    val got = PrefixSumOps.selectRanks(df, Seq("g"), "v", "c",
        array(expr("(_tot + 1) DIV 2"), expr("(_tot * 90 + 99) DIV 100")),
        splits = 8)
      .select("g", "_ri", "_rank", "v", "_tot")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val expect = rows.distinct.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).toSeq.sortBy(_._1)
      val tot = sorted.map(_._2).sum
      val cums = sorted.scanLeft((0L, 0L)) {
        case ((_, acc), (v, c)) => (v, acc + c) }.tail
      Seq((tot + 1) / 2, (tot * 90 + 99) / 100).zipWithIndex.map {
        case (r, ri) =>
          (g, ri, r, cums.find(_._2 >= r).get._1, tot)
      }
    }.toSet
    assert(got == expect)
  }

  test("selectRanks: duplicate ranks duplicate rows; out-of-range ranks drop") {
    import spark.implicits._
    val df = Seq(("g", 10L, 3L), ("g", 20L, 3L), ("g", 30L, 4L))
      .toDF("g", "v", "c").repartition(4)
    // ranks: 4 (→20), 4 again (dup), 0 (below range), 99 (beyond tot=10)
    val got = PrefixSumOps.selectRanks(df, Seq("g"), "v", "c",
        array(lit(4L), lit(4L), lit(0L), lit(99L)), splits = 4)
      .select("_ri", "_rank", "v", "_tot")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((0, 4L, 20L, 10L), (1, 4L, 20L, 10L)))
  }

  test("selectRanks survives a degenerate sketch and stays partition-count invariant") {
    import spark.implicits._
    // 3 distinct values, splits=8 (most ranges empty); int keys take the
    // interpreted fold path
    def run(parts: Int) =
      PrefixSumOps.selectRanks(
          Seq(("g", 1, 10L), ("g", 2, 20L), ("g", 3, 30L))
            .toDF("g", "v", "c").repartition(parts),
          Seq("g"), "v", "c",
          array(lit(1L), lit(10L), lit(11L), lit(60L)), splits = 8)
        .orderBy("_ri").select("_ri", "v")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val expect = Seq((0, 1), (1, 1), (2, 2), (3, 3))
    assert(run(1) == expect && run(13) == expect)
  }
}
