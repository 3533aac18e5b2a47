package graft.tools

import graft.{Sessions, Tables}
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

/** Dev tool: isolate the composed shingle pipeline's cost at sf0.1. */
object ProbeShingle {
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
    def d = Tables(spark, sfDir, "documents")
    (0 until 2).foreach { i =>
      t(s"r$i words")(d.select(explode(T.words(col("text"))).as("w")).count())
      t(s"r$i shingles-explode")(
        d.select(explode(T.shingles(col("text"), 3)).as("g")).count())
      t(s"r$i shingles-staged")(
        d.select(T.words(col("text")).as("w"))
         .select(explode(T.shinglesFromWords(col("w"), 3)).as("g")).count())
      t(s"r$i distinct-shingles-explode")(
        d.select(T.words(col("text")).as("w"))
         .select(explode(array_distinct(
           T.shinglesFromWords(col("w"), 3))).as("g")).count())
      t(s"r$i sumlen")(  // forces computation without explode
        d.select(T.words(col("text")).as("w"))
         .select(size(array_distinct(
           T.shinglesFromWords(col("w"), 3))).as("n"))
         .agg(sum(col("n"))).count())
    }
    spark.stop()
  }
}
