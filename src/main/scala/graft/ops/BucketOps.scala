package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage for co-located joins — the first change a real 100 TB
  * deployment makes (SCALING.md): write both sides of a recurring join
  * bucketed by the join key and the shuffle disappears from every
  * subsequent run.
  *
  * Spark's bucketing needs the table catalog (saveAsTable), which works on
  * the default in-memory catalog + warehouse dir — no Hive metastore
  * required. Both sides must agree on bucket count for an exchange-free
  * sort-merge join. */
object BucketOps {

  /** Write `df` as a bucketed managed table (overwriting any previous). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortBy: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    sortBy.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed joins buy. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
