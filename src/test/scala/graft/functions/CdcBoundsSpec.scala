package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.expr.CdcBounds

class CdcBoundsSpec extends SparkSpec {

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog and then some more text " * 4,
    "short",                              // below window + 1 → [1, len+1]
    "exactly9!",                          // n = 9, single position p = 2
    "",                                   // empty → [1, 1]
    "ünïcödé çhäracters mixed with ascii to exercise the char/byte split ",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" // uniform content
  )

  test("native cdc_bounds is bit-identical to the composed HOF form") {
    import spark.implicits._
    val df = docs.toDF("text").withColumn("_n", length(col("text")))
    val both = df
      .withColumn("composed", expr(graft.LayoutQueries.boundsSql))
      .withColumn("native", CdcBounds(col("text"), 8, 32))
      .select(col("text"), col("composed").cast("array<int>"), col("native"))
      .as[(String, Seq[Int], Seq[Int])].collect()
    both.foreach { case (t, c, n0) =>
      assert(c == n0, s"mismatch for ${t.take(30)}…: composed=$c native=$n0")
    }
  }

  test("bounds tile the document and respect the window arithmetic") {
    import spark.implicits._
    val rows = docs.filter(_.nonEmpty).toDF("text")
      .select(col("text"), CdcBounds(col("text"), 8, 32).as("b"))
      .as[(String, Seq[Int])].collect()
    rows.foreach { case (t, b) =>
      assert(b.head == 1 && b.last == t.length + 1)
      assert(b == b.sorted && b.distinct == b, s"bounds must ascend: $b")
      // interior boundaries only where a full 8-char window starts at p
      b.drop(1).dropRight(1).foreach(p => assert(p >= 2 && p <= t.length - 7))
    }
  }

  test("SQL surface resolves cdc_bounds") {
    val out = spark.sql(
      "SELECT cdc_bounds('abcdefghijklmnopqrstuvwxyz0123456789', 8, 32)")
      .head.getSeq[Int](0)
    assert(out.head == 1 && out.last == 37)
  }
}
