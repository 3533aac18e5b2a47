package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import QualityOps._

/** Crafted-violation coverage for the declarative constraint suite: every
  * check type must count its planted defects exactly (x101 oracles the
  * clean-table case; these pin the dirty paths). */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Seq(1L, 2L, 3L).toDF("k")

  test("each check counts exactly its planted violations") {
    val df = Seq(
      // (id, fk, status, v)
      (Some(1L), Some(1L), "O", Some(10L)),
      (Some(1L), Some(2L), "F", Some(20L)),   // dup id 1
      (Some(2L), None, "X", Some(-5L)),       // bad status, below bounds
      (None, Some(9L), "O", None),            // null id, orphan fk, null v
      (Some(3L), Some(3L), "P", Some(999L))   // above bounds
    ).toDF("id", "fk", "status", "v")
    val rep = report(df, Seq(
      NotNull("id"),
      InSet("status", Seq("O", "F", "P")),
      Bounds("v", 0L, 100L),
      Satisfies("v_even", col("v") % 2 === 0),
      Unique(Seq("id")),
      RefIntegrity("fk", dim, "k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rep("not_null(id)") == ((5L, 1L, false)))
    assert(rep("in_set(status)") == ((5L, 1L, false)))
    // violations: -5 below, null, 999 above
    assert(rep("bounds(v)") == ((5L, 3L, false)))
    // odd or null v: -5 odd, null, 999 odd
    assert(rep("satisfies(v_even)") == ((5L, 3L, false)))
    // observed = 3 distinct NON-NULL keys (1, 2, 3) — count(DISTINCT)
    // parity; violations = one extra row of id 1 + the null-id row
    // (a null key identifies nothing, so the row is a violation)
    assert(rep("unique(id)") == ((3L, 2L, false)))
    // distinct non-null fks {1,2,3,9}; 9 is an orphan
    assert(rep("ref(fk)") == ((4L, 1L, false)))
  }

  test("a clean frame passes every check and row-level checks share one scan") {
    val df = Seq((1L, 1L, "O", 10L), (2L, 2L, "F", 20L))
      .toDF("id", "fk", "status", "v")
    val checks = Seq(NotNull("id"), InSet("status", Seq("O", "F")),
      Bounds("v", 0L, 100L), Unique(Seq("id")),
      RefIntegrity("fk", dim, "k"))
    val rep = report(df, checks)
    assert(rep.collect().forall(_.getBoolean(3)), "clean frame must pass")
    // the three row-level checks fold into ONE aggregate over one scan:
    // the plan contains exactly one scan of the base frame feeding an
    // agg with all three conditional sums
    val rowOnly = report(df, Seq(NotNull("id"),
      InSet("status", Seq("O", "F")), Bounds("v", 0L, 100L)))
    val plan = rowOnly.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"),
      "row-level checks must not fan out into per-check scans:\n" + plan)
  }

  test("Unique: null-key rows are violations, never keys — composite keys too") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("a")), // duplicate composite
      (Some(2L), None),                             // half-null key
      (None, Some("b")),
      (None, None)
    ).toDF("k1", "k2")
    val rep = report(df, Seq(Unique(Seq("k1", "k2")))).collect()(0)
    // observed = 1 fully-non-null distinct key (1,a); violations =
    // 1 duplicate + 3 rows with any null key component
    assert((rep.getLong(1), rep.getLong(2), rep.getBoolean(3))
      == ((1L, 4L, false)), rep.toString)
  }

  test("NotNull with trimBlank counts blank strings; empty check list refuses") {
    val df = Seq(("a"), (" "), ("")).toDF("s")
    val rep = report(df, Seq(NotNull("s", trimBlank = true))).collect()
    assert(rep(0).getLong(2) == 2L)
    intercept[IllegalArgumentException] {
      report(df, Seq.empty)
    }
  }

  test("unimaxAlloc: capped prefix + uniform waterfill, remainder tie pinning, all-capped degenerate") {
    implicit val scope: CacheScope = CacheScope.session
    def run(rows: Seq[(String, Long)], num: Long, den: Long) =
      QualityOps.unimaxAlloc(rows.toDF("k", "n"), "k", "n", num, den)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getBoolean(3)))).toMap
    // mixed walk: Σn=115, T=103; small groups keep their whole epoch
    // (2·4 ≤ 103, 3·3 ≤ 101), the two large ones split 98 evenly
    val mixed = run(Seq(("a", 2L), ("b", 3L), ("c", 50L), ("d", 60L)),
                    9, 10)
    assert(mixed == Map("a" -> ((2L, true)), "b" -> ((3L, true)),
      "c" -> ((49L, false)), "d" -> ((49L, false))), mixed.toString)
    assert(mixed.values.map(_._1).sum == 103L) // budget exactly spent
    // largest-remainder: T=28 over three equal groups -> 10/9/9, the
    // +1 goes to the first in (n, key) order
    val eq = Seq(("a", 10L), ("b", 10L), ("c", 10L))
    val o2 = run(eq, 28, 30)
    assert(o2 == Map("a" -> ((10L, false)), "b" -> ((9L, false)),
      "c" -> ((9L, false))), o2.toString)
    // budget beyond the corpus: everyone capped at one epoch, no
    // division by zero, budget deliberately unfilled
    val o3 = run(eq, 12, 10)
    assert(o3.values.toSet == Set((10L, true)))
  }

  test("scoreTertiles: per-group cutoffs, ties stay in one bucket, tiny groups all-head") {
    implicit val scope: CacheScope = CacheScope.session
    // group A: scores 1..9 -> clean thirds {9,8,7}/{6,5,4}/{3,2,1};
    // group B: all-equal scores -> c1 = c2 = 7, everything head;
    // group C: a single row -> both ranks clamp to 1, head;
    // group D: tie spanning the first boundary (9,9,9,9,1,1) -> the
    // whole 9-run is head (c1 = 9 at rank 2), 1s split by c2 = 1
    val rows =
      (1L to 9L).map(i => ("A", i * 10, i)) ++
      (1L to 4L).map(i => ("B", 7L, 100 + i)) ++
      Seq(("C", 42L, 200L)) ++
      Seq(("D", 9L, 301L), ("D", 9L, 302L), ("D", 9L, 303L),
          ("D", 9L, 304L), ("D", 1L, 305L), ("D", 1L, 306L))
    val df = rows.toDF("g", "score", "id")
    val out = QualityOps.scoreTertiles(df, "score", "g")
      .select("g", "id", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert((1L to 9L).forall { i =>
      val want = if (i >= 7) "head" else if (i >= 4) "middle" else "tail"
      out(("A", i)) == want
    }, out.filter(_._1._1 == "A").toString)
    assert((101L to 104L).forall(i => out(("B", i)) == "head"))
    assert(out(("C", 200L)) == "head")
    assert((301L to 304L).forall(i => out(("D", i)) == "head"))
    // D: tot=6, rank2 = 4 -> c2 is still 9 (cum(9)=4 >= 4), so the 1s
    // fall to tail — the equal-score run absorbed BOTH cutoffs
    assert((305L to 306L).forall(i => out(("D", i)) == "tail"))
  }
}
