package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Dev probe: stage costs of x148/x149 serving (labeled dev timer like
  * the other Probe* mains — not operator surface). */
object ProbeGraphServe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    implicit val scope: graft.ops.CacheScope = graft.ops.CacheScope.session
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs (n=$n)")
    }
    for (pass <- 1 to 2) {
      val e = Tables(spark, dir, "embeddings")
      val m = graft.operators.KMeansDet.fit(e, 8, 2)
      time(s"p$pass fit+assign") {
        graft.operators.KMeansDet.assignWithVec(e, m).count()
      }
      val sn = graft.operators.KMeansDet.assignWithVec(e, m)
      val g = scope.persist(
        graft.operators.NnDescent.build(sn, 4, 2, mixBuckets = 16)
          .select(col("u"), col("w")))
      time(s"p$pass build")(g.count())
      val q = sn.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
                col("nrm").as("qn"))
      val assigned = sn.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("cell"))
      val seeds = graft.operators.GraphSearch.cellSeeds(assigned, sn, 4)
      time(s"p$pass seeds")(seeds.count())
      // inline replica of the search loop, per-hop timers, EAGER per hop
      val cand = sn.select(col("vec_id").as("nid"), col("v").as("cv"),
                           col("nrm").as("cn"))
      val adj = g.select(col("u").as("__gu"), col("w").as("__gw"))
      def cosQC = when(col("qn") === 0.0 || col("cn") === 0.0,
          lit(null).cast("double"))
        .otherwise(graft.functions.VectorFunctions.dot(col("qv"), col("cv"))
          / (col("qn") * col("cn")))
      def score(ids: org.apache.spark.sql.DataFrame) =
        ids.join(q, "qid").join(cand, "nid")
          .select(col("qid"), col("nid"), cosQC.as("cos"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid"))
        .orderBy(col("cos").desc_nulls_last, col("nid").asc)
      var visited = score(seeds.filter(col("nid") =!= col("qid")).distinct())
        .persist()
      time(s"p$pass hop0-v0")(visited.count())
      for (h <- 1 to 3) {
        val frontier = visited
          .withColumn("rn", row_number().over(wb)).filter(col("rn") <= 4)
          .select(col("qid"), col("nid"))
        val expand = frontier.join(adj, col("nid") === col("__gu"))
          .select(col("qid"), col("__gw").as("nid"))
          .filter(col("nid") =!= col("qid"))
          .distinct()
        visited = visited.union(score(expand)).distinct().persist()
        time(s"p$pass hop$h")(visited.count())
      }
      time(s"p$pass final-window")(
        visited.withColumn("rn", row_number().over(wb))
          .filter(col("rn") <= 3).count())
      spark.catalog.clearCache()
      time(s"p$pass x148-full")(
        SparkEntry.queries("x148_graph_search")(spark, dir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
