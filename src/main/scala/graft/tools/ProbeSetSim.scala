package graft.tools

import graft.{Sessions, Tables}
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

/** Dev tool: decompose SetSimJoin's cost on the sf documents corpus. */
object ProbeSetSim {
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
    def sets = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
              array_distinct(T.shingles(col("text"), 3)).as("sh"))
    (0 until 2).foreach { i =>
      t(s"r$i sets-only")(sets.count())
      t(s"r$i elems")(sets.select(col("doc_id"),
        explode(col("sh")).as("e")).count())
      t(s"r$i dfreq")(sets.select(explode(col("sh")).as("e"))
        .groupBy("e").count().count())
      t(s"r$i ranked") {
        val s2 = sets.persist()
        val elems = s2.select(col("doc_id"), explode(col("sh")).as("_e"))
        val dfreq = elems.groupBy(col("_e"))
          .agg(count(lit(1)).as("_df"))
        elems.join(dfreq, Seq("_e"))
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(struct(col("_df"), col("_e"))))
                 .as("_r")).count()
      }
      t(s"r$i candidates") {
        graft.operators.SetSimJoin.joinCandidatesForProbe(
          sets, "doc_id", "sh", 1, 2)
      }
      t(s"r$i full")(graft.operators.SetSimJoin
        .join(sets, "doc_id", "sh", 1, 2).count())
    }
    spark.stop()
  }
}
