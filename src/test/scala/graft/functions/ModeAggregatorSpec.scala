package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ModeAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private val modeU = udaf(ModeAggregator)

  test("ties break to the smallest value (pandas idxmax parity, pinned)") {
    val out = Seq((1, "b"), (1, "a"), (1, "b"), (1, "a"), (1, "c"))
      .toDF("k", "v").groupBy("k").agg(modeU(col("v")).as("m"))
      .as[(Int, String)].head()
    assert(out === ((1, "a")))
  }

  test("nulls are ignored; an all-null group yields null") {
    val df = Seq((1, Some("x")), (1, None), (2, None), (2, None))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(modeU(col("v")).as("m"))
      .orderBy("k").as[(Int, Option[String])].collect()
    assert(out.toSeq === Seq((1, Some("x")), (2, None)))
  }

  test("merge is partition-order independent (1 vs 8 partitions agree)") {
    val data = (0 until 1000).map(i => (i % 7, s"v${i % 13}"))
    val one = data.toDF("k", "v").coalesce(1)
      .groupBy("k").agg(modeU(col("v")).as("m")).orderBy("k")
      .as[(Int, String)].collect().toSeq
    val many = data.toDF("k", "v").repartition(8)
      .groupBy("k").agg(modeU(col("v")).as("m")).orderBy("k")
      .as[(Int, String)].collect().toSeq
    assert(one === many)
    // and matches the composed window form
    val composed = graft.ops.AggOps.modeDeterministic(
      data.toDF("k", "v"), "k", "v").orderBy("k")
      .as[(Int, String)].collect().toSeq
    assert(one === composed)
  }

  test("x41 interleave: virtual times schedule sources proportionally to weight") {
    // weight 4 source emits 4 docs before a weight-1 source's second doc
    val docs = (0L until 8L).map(i => (i, if (i % 2 == 0) "src3" else "src0"))
    // src3 → substr "3" → 3 % 4 + 1 = 4; src0 → 1
    val df = docs.toDF("doc_id", "source")
      .select(col("doc_id"), col("source"),
        (lit(1) + substring(col("source"), 4, 10).cast("int") % 4).as("_w"))
      .withColumn("_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")).cast("long"))
      .withColumn("t", expr("(_pos * 1000) DIV _w"))
      .orderBy(col("t"), col("source"), col("doc_id"))
      .select("source").as[String].collect()
    // src3 docs (t=250,500,750,1000) all precede src0's first doc (t=1000
    // ties broken by source name: src0 < src3 at t=1000)
    assert(df.take(3).toSeq === Seq("src3", "src3", "src3"))
    assert(df.count(_ == "src0") === 4)
  }
}
