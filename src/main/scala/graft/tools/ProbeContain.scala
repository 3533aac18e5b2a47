package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.functions.{TextFunctions => T}

/** Dev probe: stage-by-stage timing of the x86 containment dataflow. */
object ProbeContain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val d = Tables(spark, sfDir, "documents")
    val corpus = d.select(col("doc_id"),
      array_distinct(T.shinglesFromWords(T.words(col("text")), 3)).as("sh"))
      .persist()
    val probes = d.filter(col("doc_id") % 7 === 2)
      .select(col("doc_id"), array_distinct(T.shinglesFromWords(
        slice(T.words(col("text")), 1, 15), 3)).as("sh")).persist()
    t("corpus persist")(corpus.count())
    t("probes persist")(probes.count())
    val ea = probes.select(col("doc_id").as("id_a"), explode(col("sh")).as("g"))
    val eb = corpus.select(col("doc_id").as("id_b"), explode(col("sh")).as("g")).persist()
    t("eb persist")(eb.count())
    val dfb = t("dfb plan")(eb.groupBy(col("g")).agg(count(lit(1)).as("df")))
    t("dfb count")(dfb.count())
    val rarest = ea.join(dfb, Seq("g"), "left")
      .select(col("id_a"), coalesce(col("df"), lit(0L)).as("df"), col("g"))
      .groupBy(col("id_a"))
      .agg(min(struct(col("df"), col("g"))).as("m"))
      .select(col("id_a"), col("m.g").as("g"))
    t("rarest")(rarest.count())
    val cand = rarest.join(eb, Seq("g")).select(col("id_a"), col("id_b"))
    t("cand")(cand.count())
    val inter = cand.join(ea, Seq("id_a"))
      .join(eb, Seq("id_b", "g"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    t("inter")(inter.count())
    spark.stop()
  }
}
