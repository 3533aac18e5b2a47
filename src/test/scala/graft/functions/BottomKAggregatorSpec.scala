package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class BottomKAggregatorSpec extends AnyFunSuite {

  private val agg = new BottomKAggregator(3)

  private def run(vs: Seq[(String, Long)]): Seq[(String, Long)] =
    vs.foldLeft(agg.zero)(agg.reduce)

  test("reduce keeps the lexicographically smallest k pairs, ascending") {
    val got = run(Seq(("d", 4L), ("a", 1L), ("c", 3L), ("b", 2L), ("a", 0L)))
    assert(got == Seq(("a", 0L), ("a", 1L), ("b", 2L)))
  }

  test("merge equals re-selecting over the union, for any split of the input") {
    val vs = (0 until 50).map(i => (f"k${(i * 37) % 19}%02d", i.toLong))
    val whole = run(vs)
    for (cut <- Seq(0, 1, 7, 25, 49, 50)) {
      val (l, r) = vs.splitAt(cut)
      assert(agg.merge(run(l), run(r)) == whole, s"cut=$cut")
      assert(agg.merge(run(r), run(l)) == whole, s"cut=$cut (commuted)")
    }
  }

  test("short groups emit everything they have; null keys are ignored") {
    assert(run(Seq(("z", 9L))) == Seq(("z", 9L)))
    assert(run(Seq((null, 1L), ("a", 2L))) == Seq(("a", 2L)))
    assert(agg.merge(agg.zero, agg.zero) == Nil)
  }
}
