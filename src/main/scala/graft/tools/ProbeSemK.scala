package graft.tools

import graft.{ClusterQueries, Sessions}

/** Dev probe for the SemDeDup k-governance claim (SCALING.md): time
  * `ClusterQueries.semanticDedup` at several k on `SPARK_GRAFT_SF_DIR`.
  * `runMain graft.tools.ProbeSemK <k1,k2,...> [reps]` — warm median per
  * k, rep 0 excluded. At k ∝ N the within-cell pair count (Σ|cell|²)
  * stays linear in the corpus; this measures that directly. */
object ProbeSemK {
  def main(args: Array[String]): Unit = {
    val ks = args(0).split(",").map(_.trim.toInt)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    ks.foreach { k =>
      val times = (0 until reps).map { i =>
        val t0 = System.nanoTime()
        val n = ClusterQueries.semanticDedup(spark, sfDir, k, 2, 0.4).count()
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[semk] k=$k run$i: $sec%.2fs (dropped=$n)")
        spark.catalog.clearCache()
        sec
      }
      val warm = if (reps > 1) times.drop(1) else times
      System.err.println(
        f"[semk-med] k=$k ${warm.sorted.apply(warm.length / 2)}%.3f")
    }
    spark.stop()
  }
}
