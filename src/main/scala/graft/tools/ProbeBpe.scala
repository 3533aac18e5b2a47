package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Dev probe: time [[graft.operators.Bpe.train]] (per-merge Spark loop)
  * vs [[graft.operators.Bpe.trainCollected]] (one collect + driver
  * arithmetic) at a given round count over the sf dir's word domain —
  * `runMain graft.tools.ProbeBpe <rounds> [loop|collected|recount|both|all] [uni|bi]`
  * — `bi` derives the word domain from underscore-joined ADJACENT WORD
  * PAIRS of the same corpus (still a pure function of the testdata):
  * the driver corpus's unigram vocabulary is only ~31 types, which
  * exhausts BPE pairs around round 64, far too shallow to measure a
  * ≥512-round trainer; the bigram domain (~|V|² types, Heaps-bounded)
  * sustains 512+ rounds, and `tri` (~|V|³) gives the 30×-larger domain
  * that separates per-round recount cost (∝ corpus types) from
  * delta-maintenance cost (∝ affected words).
  * (default rounds=64 — the deepest the sf0.01 word domain supports
  * before pair exhaustion, which now fails loud in both trainers;
  * `recount` times the full-repass driver form — the honesty baseline
  * for the delta-maintenance trainer at rounds >= 512).
  * Feeds the SCALING.md rows for the batched-trainer trade. */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 64
    val mode = if (args.length > 1) args(1) else "both"
    val domain = if (args.length > 2) args(2) else "uni"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val toks = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
              filter(graft.functions.TextFunctions.words(col("text")),
                     w => w =!= "").as("ws"))
    def grams(n: Int) = {
      val parts = (0 until n).map(i =>
        slice(col("ws"), lit(i + 1), size(col("ws")) - (n - 1)))
      parts.reduce((a, b) => zip_with(a, b,
        (x, y) => concat(x, lit("_"), y)))
    }
    val words = (domain match {
        case "bi"  => toks.select(explode(grams(2)).as("word"))
        case "tri" => toks.select(explode(grams(3)).as("word"))
        case _     => toks.select(explode(col("ws")).as("word"))
      })
      .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
      .localCheckpoint() // pay the corpus-sized count once, outside timing
    System.err.println(s"[probebpe] word domain: ${words.count()} rows")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[probebpe] $tag rounds=$rounds: ${(System.nanoTime() - t0) / 1e9}%.2fs (merges=$n)")
    }
    if (mode == "collected" || mode == "both" || mode == "all")
      time("collected") {
        graft.operators.Bpe.trainCollected(words, rounds)._1.count()
      }
    if (mode == "recount" || mode == "all")
      time("recount") {
        graft.operators.Bpe.trainCollectedRecount(words, rounds)._1.count()
      }
    if (mode == "loop" || mode == "both" || mode == "all")
      time("loop") {
        graft.operators.Bpe.train(words, rounds)._1.count()
      }
    spark.stop()
  }
}
