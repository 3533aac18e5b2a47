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
}
