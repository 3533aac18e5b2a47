package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics of [[ContainmentJoin]] the testdata may not exercise:
  * near-misses, empty probes, corpus-absent elements, equal sets. */
class ContainmentJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(probes: Seq[(Long, Seq[String])],
                  corpus: Seq[(Long, Seq[String])]) =
    ContainmentJoin.join(
        probes.toDF("doc_id", "sh"), corpus.toDF("doc_id", "sh"),
        "doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("subset matches; one missing element is a near-miss, not a match") {
    val corpus = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b"))
    val got = run(Seq(
        10L -> Seq("a", "b"),        // ⊆ both
        11L -> Seq("a", "b", "e"),   // e nowhere → no candidates at all
        12L -> Seq("b", "c", "d")),  // ⊆ 1 only
      corpus)
    assert(got === Set((10L, 1L), (10L, 2L), (12L, 1L)))
  }

  test("empty probes are excluded; equal sets are containment; |A|>|B| can never match") {
    val got = run(Seq(
        20L -> Seq.empty[String],
        21L -> Seq("x", "y"),
        22L -> Seq("x", "y", "z")),
      Seq(1L -> Seq("x", "y")))
    assert(got === Set((21L, 1L)))
  }

  test("rarest-element candidates lose nothing vs brute force on a random corpus") {
    val rnd = new scala.util.Random(13)
    val univ = (0 until 12).map(i => s"e$i")
    def randSet() = rnd.shuffle(univ).take(1 + rnd.nextInt(6)).sorted
    val corpus = (1L to 30L).map(i => i -> randSet())
    val probes = (101L to 130L).map(i => i -> randSet())
    val got = run(probes, corpus)
    val want = (for {
      (pa, sa) <- probes; (cb, sb) <- corpus
      if sa.nonEmpty && sa.forall(sb.contains)
    } yield (pa, cb)).toSet
    assert(got === want, s"zero-miss violated: missing ${want -- got}, extra ${got -- want}")
  }

  private def runPartial(probes: Seq[(Long, Seq[String])],
                         corpus: Seq[(Long, Seq[String])],
                         num: Int, den: Int) =
    ContainmentJoin.joinPartial(
        probes.toDF("doc_id", "sh"), corpus.toDF("doc_id", "sh"),
        "doc_id", "sh", num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("partial containment finds the edited subset strict misses; tau=1 equals strict") {
    val corpus = Seq(1L -> Seq("a", "b", "c", "d", "e"))
    // 4 of 5 elements present (containment 0.8): strict misses, 3/4 finds
    val probes = Seq(10L -> Seq("a", "b", "c", "d", "ZZ"))
    assert(run(probes, corpus) === Set.empty)
    assert(runPartial(probes, corpus, 3, 4) === Set((10L, 1L)))
    assert(runPartial(probes, corpus, 9, 10) === Set.empty,
      "0.8 containment must fail a 0.9 threshold")
    // tau = 1 degenerates to the strict join
    val exact = Seq(11L -> Seq("a", "b", "c"))
    assert(runPartial(exact, corpus, 1, 1) === Set((11L, 1L)))
    assert(runPartial(probes, corpus, 1, 1) === Set.empty)
  }

  test("pigeonhole prefix loses nothing vs brute force at tau=7/10") {
    val rnd = new scala.util.Random(29)
    val univ = (0 until 14).map(i => s"e$i")
    def randSet() = rnd.shuffle(univ).take(2 + rnd.nextInt(8)).sorted
    val corpus = (1L to 25L).map(i => i -> randSet())
    val probes = (101L to 125L).map(i => i -> randSet())
    val got = runPartial(probes, corpus, 7, 10)
    val want = (for {
      (pa, sa) <- probes; (cb, sb) <- corpus
      inter = sa.count(sb.contains)
      if sa.nonEmpty && inter * 10 >= sa.length * 7
    } yield (pa, cb)).toSet
    assert(got === want,
      s"zero-miss violated: missing ${want -- got}, extra ${got -- want}")
  }
}
