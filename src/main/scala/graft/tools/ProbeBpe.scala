package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Dev probe: time [[graft.operators.Bpe.train]] (per-merge Spark loop)
  * vs [[graft.operators.Bpe.trainCollected]] (one collect + driver
  * arithmetic) at a given round count over the sf dir's word domain —
  * `runMain graft.tools.ProbeBpe <rounds> [loop|collected|both]`
  * (default rounds=64 — the deepest the sf0.01 word domain supports
  * before pair exhaustion, which now fails loud in both trainers).
  * Feeds the SCALING.md row for the batched-trainer trade. */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 64
    val mode = if (args.length > 1) args(1) else "both"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val words = graft.Tables(spark, sfDir, "documents")
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
      .localCheckpoint() // pay the corpus-sized count once, outside timing
    System.err.println(s"[probebpe] word domain: ${words.count()} rows")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[probebpe] $tag rounds=$rounds: ${(System.nanoTime() - t0) / 1e9}%.2fs (merges=$n)")
    }
    if (mode == "collected" || mode == "both")
      time("collected") {
        graft.operators.Bpe.trainCollected(words, rounds)._1.count()
      }
    if (mode == "loop" || mode == "both")
      time("loop") {
        graft.operators.Bpe.train(words, rounds)._1.count()
      }
    spark.stop()
  }
}
