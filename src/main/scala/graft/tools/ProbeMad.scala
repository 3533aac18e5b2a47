package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Dev tool (r16): stage-by-stage timing of the q113 MAD-outlier path —
  * where do its ~4.5 s at sf0.1 go? Collapse agg, percentile_approx
  * sketch, cache materialization, rank selection, census. */
object ProbeMad {
  /** selectRanks verbatim, minus the `ranged` persist — phase 1 and
    * phase 2 each recompute the broadcast-join + binary search from the
    * persisted input instead of reading a second full-domain cache. */
  private def selectRanksNC(df: org.apache.spark.sql.DataFrame,
                            group: Seq[String], order: String,
                            value: String,
                            ranks: org.apache.spark.sql.Column,
                            splits: Int = 256)
                           (implicit scope: graft.ops.CacheScope)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gCols = group.map(col)
    val in = scope.persist(df)
    val qs = (1 until splits).map(_.toDouble / splits)
    val bounds = in.groupBy(gCols: _*)
      .agg(percentile_approx(col(order), lit(qs.toArray), lit(2000))
             .as("_bs"),
           sum(col(value)).as("_tot"))
    def withRanges(frame: org.apache.spark.sql.DataFrame) = {
      val b =
        if (group.isEmpty) frame.crossJoin(broadcast(bounds))
        else frame.join(broadcast(bounds), group)
      b.withColumn("_rb",
          graft.functions.expr.SortedLowerBound(col("_bs"), col(order)))
        .drop("_bs")
    }
    val wOff = Window.partitionBy(gCols: _*).orderBy(col("_rb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranged = withRanges(in)
    val targets = ranged
      .groupBy((gCols :+ col("_rb")): _*)
      .agg(sum(col(value)).as("_pc"), first(col("_tot")).as("_tot"))
      .withColumn("_off", coalesce(sum(col("_pc")).over(wOff), lit(0L)))
      .select(gCols ++ Seq(col("_rb"), col("_off"), col("_pc"), col("_tot"),
        posexplode(ranks).as(Seq("_ri", "_rank"))): _*)
      .filter(col("_off") < col("_rank") &&
              col("_rank") <= col("_off") + col("_pc"))
      .drop("_pc")
    val wLoc = Window
      .partitionBy((gCols ++ Seq(col("_rb"), col("_ri"))): _*)
      .orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.drop("_tot")
      .join(broadcast(targets), group :+ "_rb")
      .withColumn("_cum", sum(col(value)).over(wLoc) + col("_off"))
      .groupBy((gCols ++ Seq(col("_ri"), col("_rank"), col("_tot"))): _*)
      .agg(min(when(col("_cum") >= col("_rank"), col(order))).as(order))
      .select(gCols ++ Seq(col("_ri"), col("_rank"), col(order),
        col("_tot")): _*)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs (n=$n)")
    }
    implicit val scope: graft.ops.CacheScope = graft.ops.CacheScope.session
    val rows = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"),
              round(col("l_extendedprice") * 100).cast("long").as("v"))
    rows.count()
    for (rep <- 1 to 2) {
      val vc = rows.groupBy(col("flag"), col("v")).agg(count(lit(1)).as("c"))
      time(s"r$rep collapse(count only)") { vc.count() }
      val vcp = vc.persist()
      time(s"r$rep collapse+cache") { vcp.count() }
      val qs = (1 until 256).map(_.toDouble / 256)
      time(s"r$rep sketch a=2000") {
        vcp.groupBy(col("flag"))
          .agg(percentile_approx(col("v"), lit(qs.toArray), lit(2000))
                 .as("_bs"), sum(col("c")).as("_tot")).count()
      }
      time(s"r$rep sketch a=100") {
        vcp.groupBy(col("flag"))
          .agg(percentile_approx(col("v"), lit(qs.toArray), lit(100))
                 .as("_bs"), sum(col("c")).as("_tot")).count()
      }
      val qs64 = (1 until 64).map(_.toDouble / 64)
      time(s"r$rep sketch s=64 a=2000") {
        vcp.groupBy(col("flag"))
          .agg(percentile_approx(col("v"), lit(qs64.toArray), lit(2000))
                 .as("_bs"), sum(col("c")).as("_tot")).count()
      }
      time(s"r$rep selectRanks(median)") {
        graft.ops.PrefixSumOps.selectRanks(vcp, Seq("flag"), "v", "c",
          array(expr("(_tot + 1) DIV 2"))).count()
      }
      time(s"r$rep selectRanksNoRangedCache(median)") {
        selectRanksNC(vcp, Seq("flag"), "v", "c",
          array(expr("(_tot + 1) DIV 2"))).count()
      }
      time(s"r$rep full q113") {
        graft.RelationalQueries.queries("q113_mad_outliers")(spark, sfDir)
          .count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
