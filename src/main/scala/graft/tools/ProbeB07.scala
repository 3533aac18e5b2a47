package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object ProbeB07 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tuned(SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("b07_join_order")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    println(p.toString.take(8000))
    spark.stop()
  }
}
