package graft.functions

import graft.SparkSpec
import graft.functions.expr.SortedLowerBound
import org.apache.spark.sql.functions._

class SortedLowerBoundSpec extends SparkSpec {

  test("native binary search matches the composed HOF fold on random sorted arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val n = rnd.nextInt(40)
      // duplicates on purpose — duplicate boundaries below v must all count
      val arr = Seq.fill(n)(rnd.nextInt(50).toLong).sorted
      (i.toLong, arr, rnd.nextInt(60).toLong - 5)
    }
    val df = rows.toDF("id", "bs", "v")
      .withColumn("native", SortedLowerBound(col("bs"), col("v")))
      .withColumn("hof", aggregate(col("bs"), lit(0),
        (acc, b) => acc + when(col("v") > b, 1).otherwise(0)))
    val bad = df.filter(col("native") =!= col("hof")).count()
    assert(bad == 0)
    // spot values: empty array → 0; all-below → length
    val edge = Seq((Seq.empty[Long], 5L), (Seq(1L, 2L, 3L), 10L),
                   (Seq(1L, 2L, 3L), 1L), (Seq(2L, 2L, 2L), 2L))
      .toDF("bs", "v")
      .select(SortedLowerBound(col("bs"), col("v")).as("r"))
      .collect().map(_.getInt(0)).toSeq
    assert(edge == Seq(0, 3, 0, 0))
  }

  test("SQL surface resolves sorted_lower_bound; nulls propagate") {
    val r = spark.sql(
      "SELECT sorted_lower_bound(array(1L, 3L, 5L), 4L) AS r").collect()
    assert(r.head.getInt(0) == 2)
    val n = spark.sql(
      "SELECT sorted_lower_bound(CAST(NULL AS ARRAY<BIGINT>), 4L) AS r")
      .collect()
    assert(n.head.isNullAt(0))
  }
}
