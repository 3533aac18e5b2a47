package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.functions.{TextFunctions => T}
import graft.operators.DedupOperators

/** Dev tool: stage-by-stage timing of the MinHash banding path. */
object PerfProbe {
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
    val docs = Tables(spark, sfDir, "documents")
    docs.count()
    time("x16_cold") {
      graft.AnalyticsQueries.queries("x16_dedup_incremental")(spark, sfDir).count()
    }
    time("banded") {
      DedupOperators.signatureIndex(docs, "doc_id", "text").count()
    }
    time("candidates") {
      DedupOperators.minhashCandidates(docs, "doc_id", "text").count()
    }
    time("x14") {
      graft.AnalyticsQueries.queries("x14_dedup_cluster")(spark, sfDir).count()
    }
    time("x16_warm") {
      graft.AnalyticsQueries.queries("x16_dedup_incremental")(spark, sfDir).count()
    }
    // x17 stage breakdown
    val d2 = docs.select("doc_id", "text")
    val exact = DedupOperators.exactDedup(d2, "doc_id", "text").persist()
    time("x17_exact") { exact.count() }
    val nearPairs = DedupOperators.minhashNearDups(
      exact, "doc_id", "text", 0.5, 3, 8, 4)
    time("x17_nearpairs") { nearPairs.count() }
    time("x17_cluster") {
      DedupOperators.clusterPairs(nearPairs, 10).count()
    }
    time("x17_full") {
      graft.AnalyticsQueries.queries("x17_dedup_corpus")(spark, sfDir).count()
    }
    DedupOperators.signatureIndex(docs, "doc_id", "text").explain("formatted")
    spark.stop()
  }
}
