package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev tool: time a comma-separated list of SparkEntry queries in ONE
  * session — `runMain graft.tools.TimeMany <n1,n2,...> [reps]` against
  * `SPARK_GRAFT_SF_DIR`. Emits one stderr line per (query, rep) plus a
  * `timemany-med` line with the warm median (rep 0 excluded when reps>1:
  * it pays codegen/JIT and any pay-once Scratch artifact). Used by the
  * sf0.1→sf1 scaling probe (SCALING.md) and the SOLO_r* sweeps. */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val times = (0 until reps).map { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[timemany] $name run$i: $sec%.2fs (n=$n)")
        // Bench methodology: each rep repopulates its own persists
        spark.catalog.clearCache()
        sec
      }
      val warm = if (reps > 1) times.drop(1) else times
      val med = warm.sorted.apply(warm.length / 2)
      System.err.println(f"[timemany-med] $name $med%.3f")
    }
    spark.stop()
  }
}
