package graft

/** The bench noisy-detector's spread verdict (r13 blind-spot fix):
  * pass 0 is excluded only when it is the largest pass. */
class BenchSpreadSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("structural first-pass-high outlier stays exempt") {
    // high pass 0 (JIT / pay-once artifact), tight steady passes
    assert(Bench.captureSpread(Seq(12.0, 3.0, 3.2)) == 3.2 / 3.0)
  }

  test("a spike among the later passes flags (all-passes spread)") {
    // the q113 capture: [4.40, 12.84, 6.45] — old drop(1) saw 1.99
    val s = Bench.captureSpread(Seq(4.40, 12.84, 6.45))
    assert(s > 2.0 && math.abs(s - 12.84 / 4.40) < 1e-9)
  }

  test("low pass 0 (inflated steady passes) flags too") {
    assert(Bench.captureSpread(Seq(2.0, 6.0, 5.5)) == 3.0)
  }

  test("degenerate lengths and non-positive times") {
    assert(Bench.captureSpread(Seq(3.0, 3.0)) == 1.0)
    assert(Bench.captureSpread(Seq.empty).isPosInfinity)
    assert(Bench.captureSpread(Seq(1.0, 0.0, 2.0)).isPosInfinity)
  }

  test("value_solo replaces noisy sweep medians with solo medians") {
    // entry 1 was noisy (sweep 9.0, solo 2.0); entry 2 failed (-1,
    // excluded like `value`); entry 3's solo itself failed (-1 → keep
    // the sweep median)
    val meds = Seq(1.0, 9.0, -1.0, 4.0)
    val solos = Map(1 -> 2.0, 3 -> -1.0)
    assert(Bench.soloAdjustedTotal(meds, solos) == 1.0 + 2.0 + 4.0)
    // no solos → identical to the raw total
    assert(Bench.soloAdjustedTotal(meds, Map.empty) == 1.0 + 9.0 + 4.0)
  }
}
