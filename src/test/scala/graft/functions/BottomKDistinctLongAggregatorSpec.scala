package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class BottomKDistinctLongAggregatorSpec extends AnyFunSuite {

  private val agg = new BottomKDistinctLongAggregator(3)

  private def run(vs: Seq[Long]): Seq[Long] =
    vs.foldLeft(agg.zero)(agg.reduce)

  test("reduce keeps the smallest k DISTINCT values, ascending") {
    assert(run(Seq(7L, 2L, 7L, 9L, 2L, 1L, 2L)) == Seq(1L, 2L, 7L))
    // duplicate of the current max must not evict anything
    assert(run(Seq(1L, 2L, 3L, 3L, 3L)) == Seq(1L, 2L, 3L))
  }

  test("merge equals re-selecting over the distinct union, any split") {
    val vs = (0 until 80).map(i => ((i * 37) % 11).toLong)
    val whole = run(vs)
    assert(whole == vs.distinct.sorted.take(3))
    for (cut <- Seq(0, 1, 13, 40, 79, 80)) {
      val (l, r) = vs.splitAt(cut)
      assert(agg.merge(run(l), run(r)) == whole, s"cut=$cut")
      assert(agg.merge(run(r), run(l)) == whole, s"cut=$cut (commuted)")
    }
  }

  test("short groups emit their full distinct set") {
    assert(run(Seq(5L, 5L)) == Seq(5L))
    assert(agg.merge(agg.zero, agg.zero) == Nil)
  }

  test("matches slice(sort_array(collect_set(v)), 1, k) on random streams") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val vs = Seq.fill(60)(rnd.nextInt(25).toLong - 5L)
      assert(run(vs) == vs.distinct.sorted.take(3), s"trial=$trial")
    }
  }
}
