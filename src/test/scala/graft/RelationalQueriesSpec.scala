package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomOps

/** Semantics the q72–q77 / x38–x39 oracles can't isolate: bloom-prefilter
  * exactness (including false-positive removal), chunking boundaries, and
  * plan shapes for the decorrelated subqueries. */
class RelationalQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q74 bloom prefilter semi join ≡ plain semi join (false positives removed)") {
    val left = (0L until 1000L).toDF("k")
    val right = Seq(3L, 7L, 500L, 999L).toDF("rk")
    // tiny filter + high fpp forces real false positives through the bloom
    val got = BloomOps.bloomPrefilterSemiJoin(left, right, "k", "rk",
        expectedItems = 4, fpp = 0.5)
      .orderBy("k").as[Long].collect()
    assert(got.toSeq === Seq(3L, 7L, 500L, 999L))
  }

  test("q74 bloom prefilter: null left keys never match") {
    val left = Seq(Some(1L), None, Some(2L)).toDF("k")
    val right = Seq(1L).toDF("rk")
    val got = BloomOps.bloomPrefilterSemiJoin(left, right, "k", "rk",
        expectedItems = 4)
      .as[Option[Long]].collect()
    assert(got.toSeq === Seq(Some(1L)))
  }

  test("q72 EXISTS/NOT EXISTS decorrelate to semi/anti joins (no subquery re-execution)") {
    Seq((1L, "a")).toDF("c_custkey", "c_name").createOrReplaceTempView("c_t")
    Seq((1L, 5L)).toDF("o_custkey", "v").createOrReplaceTempView("o_t")
    val plan = spark.sql(
      """SELECT c_custkey FROM c_t c
         WHERE EXISTS (SELECT 1 FROM o_t o WHERE o.o_custkey = c.c_custkey)
           AND NOT EXISTS (SELECT 1 FROM o_t o2
                           WHERE o2.o_custkey = c.c_custkey AND o2.v < 0)""")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("x38 chunking: stride windows cover every token exactly once per stride") {
    // 90 tokens, chunk 50 / stride 40 → chunks at 0 (50 tokens) and 40 (50)
    val text = (0 until 90).map(i => s"t$i").mkString(" ")
    val out = RelationalQueriesSpecHelper.chunks(spark, Seq((1L, text)))
    assert(out === Seq((1L, 0L, 50L), (1L, 1L, 50L), (1L, 2L, 10L)))
  }

  test("x38 chunking: a doc shorter than one chunk yields a single short chunk") {
    val out = RelationalQueriesSpecHelper.chunks(spark, Seq((1L, "a b c")))
    assert(out === Seq((1L, 0L, 3L)))
  }

  test("q76 array set ops: empty sides behave as empty sets, duplicates collapse") {
    val df = Seq(
      (1L, 1L, 30.0, 0.01),  // only a
      (1L, 1L, 30.0, 0.01),  // duplicate linenumber in a
      (1L, 2L, 10.0, 0.10))  // only b
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    val row = df.groupBy(col("l_orderkey"))
      .agg(
        sort_array(collect_list(
          when(col("l_quantity") > 25, col("l_linenumber")))).as("_a"),
        sort_array(collect_list(
          when(col("l_discount") > 0.05, col("l_linenumber")))).as("_b"))
      .select(
        array_sort(array_intersect(col("_a"), col("_b"))).as("ln_both"),
        array_sort(array_union(col("_a"), col("_b"))).as("ln_any"),
        array_sort(array_except(col("_a"), col("_b"))).as("ln_only_a"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].head()
    assert(row === ((Seq.empty[Long], Seq(1L, 2L), Seq(1L))))
  }
}

object RelationalQueriesSpecHelper {
  import org.apache.spark.sql.SparkSession

  /** The x38 chunking dataflow over in-memory docs → (doc, chunk, n_tokens). */
  def chunks(spark: SparkSession,
             docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("_w"))
      .select(col("doc_id"), col("_w"), size(col("_w")).as("_n"))
      .select(col("doc_id"), col("_w"), col("_n"),
        posexplode(sequence(lit(0), col("_n") - 1, lit(40))))
      .select(col("doc_id"), col("pos").cast("long"),
        least(lit(50), col("_n") - col("col")).cast("long"))
      .orderBy("doc_id", "pos")
      .as[(Long, Long, Long)].collect().toSeq
  }
}
