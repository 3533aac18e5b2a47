package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[TableIo.readUnified]] — the type-widening schema-evolution read
  * (x180's operator): lossless widening across generations, null-fill
  * for late-arriving columns, and the fail-loud narrowing guard. */
class ReadUnifiedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString

  test("generations widen losslessly: int+long -> long, float+double -> " +
       "double, int+double -> double, missing column null-fills") {
    val dir = tmp("widen")
    Seq((1, 1.5f, 10))
      .toDF("k", "q", "m")
      .write.mode("overwrite").parquet(s"$dir/g1")
    Seq((2L, 2.5d, 20.5d, "x"))
      .toDF("k", "q", "m", "tag")
      .write.mode("overwrite").parquet(s"$dir/g2")
    val u = TableIo.readUnified(spark, Seq(s"$dir/g1", s"$dir/g2"))
    assert(u.schema("k").dataType.simpleString == "bigint")
    assert(u.schema("q").dataType.simpleString == "double")
    assert(u.schema("m").dataType.simpleString == "double") // int+double
    assert(u.schema("tag").dataType.simpleString == "string")
    val rows = u.orderBy(col("k")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).getDouble(1) == 1.5 && rows(1).getDouble(1) == 2.5)
    assert(rows(0).getDouble(2) == 10.0 && rows(1).getDouble(2) == 20.5)
    assert(rows(0).isNullAt(3) && rows(1).getString(3) == "x")
  }

  test("decimal generations unify to the precision/scale union") {
    val dir = tmp("widendec")
    spark.sql("SELECT CAST(12345678.91 AS DECIMAL(10,2)) AS d")
      .write.mode("overwrite").parquet(s"$dir/g1")
    spark.sql("SELECT CAST(1.2345 AS DECIMAL(12,4)) AS d")
      .write.mode("overwrite").parquet(s"$dir/g2")
    val u = TableIo.readUnified(spark, Seq(s"$dir/g1", s"$dir/g2"))
    // int digits max(8, 8) = 8, scale max(2, 4) = 4 -> decimal(12,4)
    assert(u.schema("d").dataType.simpleString == "decimal(12,4)")
    assert(u.agg(sum(col("d"))).collect().head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("12345680.1445")) == 0)
  }

  test("lossy unions fail loud with the column name and both types") {
    val dir = tmp("widenbad")
    Seq(Tuple1(1L)).toDF("v").write.mode("overwrite").parquet(s"$dir/g1")
    Seq(Tuple1(1.5d)).toDF("v").write.mode("overwrite").parquet(s"$dir/g2")
    val e1 = intercept[IllegalArgumentException](
      TableIo.readUnified(spark, Seq(s"$dir/g1", s"$dir/g2")).schema)
    assert(e1.getMessage.contains("'v'") &&
      e1.getMessage.contains("bigint") && e1.getMessage.contains("double"))
    val dir2 = tmp("widenbad2")
    Seq(Tuple1("a")).toDF("v").write.mode("overwrite").parquet(s"$dir2/g1")
    Seq(Tuple1(1)).toDF("v").write.mode("overwrite").parquet(s"$dir2/g2")
    val e2 = intercept[IllegalArgumentException](
      TableIo.readUnified(spark, Seq(s"$dir2/g1", s"$dir2/g2")).schema)
    assert(e2.getMessage.contains("string") && e2.getMessage.contains("int"))
    intercept[IllegalArgumentException](
      TableIo.readUnified(spark, Seq.empty))
  }
}
