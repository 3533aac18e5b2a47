package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev tool: time one named SparkEntry query N times (after a warm-up run)
  * at an sf dir — `runMain graft.tools.TimeOne <name> [reps]`. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val fn = SparkEntry.queries(name)
    (0 until reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      System.err.println(
        f"[timeone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs (n=$n)")
      // match Bench methodology: each rep repopulates its own persists —
      // the CacheManager would otherwise serve rep 2+ from rep 1's cache
      // (plans are canonically equal) and hide the real per-run cost
      spark.catalog.clearCache()
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
