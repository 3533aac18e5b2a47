package graft.tools

import graft._
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Dev probe: stage costs of x143 (delete after use or keep as labeled
  * dev timer like the other Probe* mains — not operator surface). */
object ProbeDsir {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs (n=$n)")
    }
    val docs = Tables(spark, dir, "documents")
    for (pass <- 1 to 2) {
      time(s"p$pass words explode")(docs.select(col("doc_id"),
        explode(T.words(col("text"))).as("w")).count())
      time(s"p$pass wordNgrams explode")(docs.select(col("doc_id"),
        explode(T.wordNgrams(col("text"), 2)).as("b")).count())
      val w = T.words(col("text"))
      time(s"p$pass zip_with explode")(docs.select(col("doc_id"),
        explode(zip_with(slice(w, lit(1), size(w) - 1),
                         slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b))).as("b")).count())
      time(s"p$pass ngrams+md5")(docs.select(col("doc_id"),
        explode(T.wordNgrams(col("text"), 2)).as("b"))
        .select(conv(substring(md5(col("b")), 1, 12), 16, 10).cast("long")
          .as("h")).count())
    }
    val bg = docs.select(col("doc_id"), col("source"),
        (col("lang") === "en").as("_t"),
        explode(T.wordNgrams(col("text"), 2)).as("b"))
      .withColumn("h",
        conv(substring(md5(col("b")), 1, 12), 16, 10).cast("long") % 1024)
      .drop(col("b")).persist()
    time("bg persist+count")(bg.count())
    val cr = bg.groupBy(col("h")).agg(count(lit(1)).as("cr"))
    val ctc = bg.filter(col("_t")).groupBy(col("h"))
      .agg(count(lit(1)).as("ct"))
    val model = cr.join(ctc, Seq("h"), "left_outer").na.fill(0L, Seq("ct"))
    time("model")(model.count())
    val totals = model.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val scored = bg.join(broadcast(model), Seq("h"))
      .crossJoin(broadcast(totals))
      .withColumn("lr", T.bitlenLogRatio(
        col("ct"), col("cr"), col("nr"), col("nt")))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lr")).as("imp_sum"))
    time("scored")(scored.count())
    time("full x143")(
      SparkEntry.queries("x143_hashed_dsir")(spark, dir).count())
    spark.stop()
  }
}
