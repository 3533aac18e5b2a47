package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Dev tool: decompose q113's selectRanks cost — domain agg, sketch,
  * one median selection, full query — each timed cold (cache cleared). */
object ProbeRanks {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    def t(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      System.err.println(
        f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs (n=$n)")
      spark.catalog.clearCache()
    }
    def vc = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"),
              round(col("l_extendedprice") * 100).cast("long").as("v"))
      .groupBy(col("flag"), col("v")).agg(count(lit(1)).as("c"))
    (0 until 2).foreach { i =>
      t(s"r$i domain-agg-only")(vc.count())
      t(s"r$i sketch-only") {
        val qs = (1 until 256).map(_.toDouble / 256)
        vc.groupBy(col("flag"))
          .agg(percentile_approx(col("v"), lit(qs.toArray), lit(2000))
                 .as("_bs"),
               sum(col("c")).as("_tot")).count()
      }
      t(s"r$i sketch-acc200") {
        val qs = (1 until 256).map(_.toDouble / 256)
        vc.groupBy(col("flag"))
          .agg(percentile_approx(col("v"), lit(qs.toArray), lit(200))
                 .as("_bs"),
               sum(col("c")).as("_tot")).count()
      }
      t(s"r$i one-selectRanks") {
        graft.ops.PrefixSumOps.selectRanks(vc, Seq("flag"), "v", "c",
          array(expr("(_tot + 1) DIV 2"))).count()
      }
      t(s"r$i q113-full") {
        graft.RelationalQueries.queries("q113_mad_outliers")(spark, sfDir)
          .count()
      }
      t(s"r$i q87-full") {
        graft.RelationalQueries.queries("q87_mad_outliers")(spark, sfDir)
          .count()
      }
    }
    spark.stop()
  }
}
