package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Dev tool: fully-lazy 3-round PageRank (nested broadcast plan, 1 job). */
object ProbeQ92 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.tuned(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs (n=$n)")
    }
    for (pass <- 0 to 1) {
      val t0 = System.nanoTime()
      val big = Tables(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("ok"))
      val items = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .join(big, Seq("ok")).distinct()
      val und = items.select(col("ok"), col("p").as("pa"))
        .join(items.select(col("ok"), col("p").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .select(col("pa").as("u"), col("pb").as("v")).distinct()
      val edges = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))

      val scale = 1000000000L
      val wByU = Window.partitionBy(col("u"))
      val linked = edges.select(col("u"), col("v"))
        .withColumn("d", count(lit(1)).over(wByU)).persist()
      var ranks = linked.select(col("u").as("node")).distinct()
        .withColumn("r", lit(scale))
      val teleport = scale * 15 / 100
      for (_ <- 1 to 3) {
        ranks = linked
          .join(broadcast(ranks), linked("u") === ranks("node"))
          .select(col("v"), expr("r DIV d").as("c"))
          .groupBy(col("v")).agg(sum(col("c")).as("s"))
          .select(col("v").as("node"),
                  (lit(teleport) + expr("(s * 85) DIV 100")).as("r"))
      }
      time(s"p$pass full_lazy")(
        ranks.orderBy(col("r").desc, col("node")).limit(20).count())
      linked.unpersist()
      System.err.println(f"[probe] p$pass total: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
