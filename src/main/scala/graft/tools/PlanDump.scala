package graft.tools

import graft._

/** Dev tool (r16 optimization round): dump `.explain("formatted")` for a
  * comma-separated list of SparkEntry queries into a directory —
  * `runMain graft.tools.PlanDump <outDir> <n1,n2,...> [suffix]` against
  * `SPARK_GRAFT_SF_DIR`. Writes `<outDir>/<name>_<suffix>.txt` (suffix
  * defaults to "before"); these are the judge-facing plan artifacts under
  * plans/r16/. Uses the same tuned session as Bench so plan shapes match
  * what the bench executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val suffix = if (args.length > 2) args(2) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query '$n'"))
      try {
        val df = fn(spark, sfDir)
        // queryExecution.explainString gives exactly what
        // df.explain("formatted") prints, without stdout capture
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), p)
        println(s"wrote $outDir/${n}_$suffix.txt (${p.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
