package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev tool: split a query's COLD cost into plan-side (analysis +
  * optimization + physical planning) vs execution (codegen + run) —
  * `runMain graft.tools.ColdProbe <name> [<name> ...]`. */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis→physical planning
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      System.err.println(
        f"[cold] $name plan=${(t1 - t0) / 1e9}%.2fs exec=${(t2 - t1) / 1e9}%.2fs (n=$n)")
    }
    spark.stop()
  }
}
