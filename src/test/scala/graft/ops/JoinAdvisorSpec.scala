package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The extracted advisor (VERDICT r9 #8): estimates rank pairs the way
  * the true join sizes do on a planted-overlap fixture, and the greedy
  * order is deterministic and opens with the cheapest pair. */
class JoinAdvisorSpec extends SparkSpec {
  import spark.implicits._

  // planted key overlaps: |a⋈b| is tiny, |a⋈c| medium, |b⋈c| huge
  private def rel(keys: Seq[Int]): DataFrame =
    keys.map(_.toString).toDF("k")

  private def fixture: Map[String, DataFrame] = Map(
    "a" -> rel(1 to 50),
    "b" -> rel(45 to 400),           // a∩b = 6 keys
    "c" -> rel((1 to 40) ++ (45 to 400) ++ (45 to 400)) // heavy b overlap
  )

  test("pairwise estimates rank like the exact join sizes") {
    val sk = fixture.map { case (n, df) =>
      n -> JoinAdvisorOps.sketch(df, "k").persist()
    }
    val advice = JoinAdvisorOps.advise(sk)
    assert(advice.pairs.map(_.label) === Seq("a-b", "a-c", "b-c"),
      s"estimate ranking off: ${advice.pairs}")
    // CMS estimates are upper bounds of the true sizes
    val exact = Map("a-b" -> 6L, "a-c" -> 46L, "b-c" -> 712L)
    advice.pairs.foreach(p =>
      assert(p.est >= exact(p.label),
        s"${p.label}: est ${p.est} below exact ${exact(p.label)}"))
    spark.catalog.clearCache()
  }

  test("sketches survive the at-rest round trip: advise from re-read parquet equals advise from live frames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-adv").toString
    val live = fixture.map { case (n, df) =>
      n -> JoinAdvisorOps.sketch(df, "k")
    }
    live.foreach { case (n, sk) =>
      sk.write.mode("overwrite").parquet(s"$dir/$n.sketch.parquet")
    }
    val atRest = fixture.keys.map(n =>
      n -> spark.read.parquet(s"$dir/$n.sketch.parquet")).toMap
    val a = JoinAdvisorOps.advise(live.map { case (n, df) =>
      n -> df.persist() })
    val b = JoinAdvisorOps.advise(atRest)
    assert(a.pairs === b.pairs,
      "the persisted stats table must advise identically")
    spark.catalog.clearCache()
  }

  test("greedy order opens with the cheapest pair and extends by cheapest link") {
    val pairs = Seq(
      JoinAdvisorOps.PairEstimate("a", "b", 10L),
      JoinAdvisorOps.PairEstimate("a", "c", 50L),
      JoinAdvisorOps.PairEstimate("b", "c", 700L),
      JoinAdvisorOps.PairEstimate("a", "d", 40L),
      JoinAdvisorOps.PairEstimate("b", "d", 900L),
      JoinAdvisorOps.PairEstimate("c", "d", 5000L))
    val advice = JoinAdvisorOps.JoinAdvice(pairs.sortBy(p => (p.est, p.a)))
    assert(advice.bestPair.label === "a-b")
    assert(advice.worstPair.label === "c-d")
    // after (a,b): d links at 40 (a-d) < c at 50 (a-c) → a,b,d,c
    assert(advice.greedyOrder(Seq("a", "b", "c", "d"))
      === Seq("a", "b", "d", "c"))
  }

  test("unsorted direct construction still opens with the cheapest pair (r10 advice)") {
    val advice = JoinAdvisorOps.JoinAdvice(Seq(
      JoinAdvisorOps.PairEstimate("b", "c", 700L),
      JoinAdvisorOps.PairEstimate("a", "b", 10L),
      JoinAdvisorOps.PairEstimate("a", "c", 50L)))
    assert(advice.bestPair.label === "a-b")
    assert(advice.greedyOrder(Seq("a", "b", "c")) === Seq("a", "b", "c"))
  }

  test("adviseGraph orders a heterogeneous-key chain; executeChain follows it physically") {
    import org.apache.spark.sql.functions._
    import JoinAdvisorOps.JoinEdge
    // a path graph: fact —fk→ mid —gk→ dim, with the dim edge far
    // cheaper than the fact edge
    val fact = (1 to 2000).map(i => (i % 200, i)).toDF("fk", "payload")
    val mid = (0 until 200).map(i => (i, i % 10)).toDF("mk", "gk")
    val dim = (0 until 10).map(i => (i, s"g$i")).toDF("dk", "grp")
    val rels = Map("fact" -> fact, "mid" -> mid, "dim" -> dim)
    val edges = Seq(JoinEdge("fact", "fk", "mid", "mk"),
                    JoinEdge("mid", "gk", "dim", "dk"))
    val advice = JoinAdvisorOps.adviseGraph(rels, edges)
    val order = advice.greedyOrder(Seq("dim", "fact", "mid"))
    // the mid⋈dim edge (≤200 rows) must open; fact extends via its mid
    // edge — and fact can NEVER be appended before mid (no edge to dim)
    assert(order === Seq("mid", "dim", "fact"), s"got $order")
    val chain = JoinAdvisorOps.executeChain(rels, edges, order)
    assert(chain.count() === 2000L)
    // physical leaf order follows the advised order (left-deep reduce)
    val opt = chain.queryExecution.optimizedPlan.toString
    val pos = Seq("mk", "dk", "payload").map(opt.indexOf)
    assert(pos.forall(_ >= 0) && pos == pos.sorted,
      s"leaf order must be mid,dim,fact:\n" + opt.take(2000))
    // a disconnected order fails loud instead of cross-joining
    val err = intercept[RuntimeException] {
      JoinAdvisorOps.executeChain(rels, edges, Seq("dim", "fact", "mid"))
    }
    assert(err.getMessage.contains("no edge connects"))
  }
}
