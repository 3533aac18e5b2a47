package graft.ops

import graft.SparkSpec
import graft.operators.DedupOperators
import org.apache.spark.sql.functions._

/** Lifetime contract of [[CacheScope]] (VERDICT r9 #7): operator-internal
  * persists registered in a `using` scope are freed when the scope closes;
  * the default session scope leaves them for `clearCache()` — and neither
  * mode changes results. */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def cachedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with no overlap at all here"),
    (4L, "the quick brown fox jumps over the lazy dog")
  ).toDF("id", "text")

  test("using-scope frees minhashCandidates' internal band index") {
    spark.catalog.clearCache()
    val base = cachedRddCount
    val n = CacheScope.using { implicit scope =>
      DedupOperators.minhashCandidates(docs, "id", "text").count()
    }
    assert(n >= 1) // 1-2-4 share bands
    assert(cachedRddCount === base,
      "scope close must unpersist the operator-internal band index")
  }

  test("session scope keeps the cache until clearCache (default behavior)") {
    spark.catalog.clearCache()
    val base = cachedRddCount
    DedupOperators.minhashCandidates(docs, "id", "text").count()
    assert(cachedRddCount > base,
      "default scope: internal band index stays cached after return")
    spark.catalog.clearCache()
    assert(cachedRddCount === base)
  }

  test("sweep coverage: SetSimJoin and PrefixSumOps internal persists free with the scope") {
    spark.catalog.clearCache()
    val base = cachedRddCount
    val sets = Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "d")),
      (3L, Seq("x", "y", "z"))).toDF("id", "s")
    val vals = (1 to 50).map(i => (i % 5, i.toLong, 1L))
      .toDF("g", "o", "v")
    CacheScope.using { implicit scope =>
      graft.operators.SetSimJoin.join(sets, "id", "s", 1, 2).count()
      PrefixSumOps.runningSum(vals, Seq("g"), "o", "v", "cum", "tot")
        .count()
    }
    assert(cachedRddCount === base,
      "SetSimJoin set/prefix frames and PrefixSumOps input/ranged frames " +
        "must free on scope close")
  }

  test("ordinal kernel: eager and lazy modes number identically; scope frees both") {
    spark.catalog.clearCache()
    val base = cachedRddCount
    val df = (1 to 100).map(i => ((i * 37) % 101, i.toLong))
      .toDF("k", "v")
    def ordinals(eager: Boolean): Seq[(Int, Long)] =
      CacheScope.using { implicit scope =>
        DedupOps.withIngestOrdinalFrom(df, Seq(col("k")), eager = eager)
          .select(col("k"), col(DedupOps.OrdinalCol))
          .as[(Int, Long)].collect().sortBy(_._1).toSeq
      }
    val e = ordinals(eager = true)
    val l = ordinals(eager = false)
    assert(e === l)
    assert(e.map(_._2).sorted === (1L to 100L))
    assert(cachedRddCount === base,
      "both kernel modes' keyed frames must free on scope close")
  }
}
