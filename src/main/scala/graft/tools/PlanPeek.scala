package graft.tools
import graft._
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args(0).split(",")) {
      val p = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/plan_$n.txt"), p)
      println(s"wrote /tmp/plan_$n.txt (${p.length} chars)")
    }
    spark.stop()
  }
}
