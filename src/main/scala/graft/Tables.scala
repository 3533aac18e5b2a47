package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver testdata (TESTDATA.md).
  *
  * `events.parquet` carries TIMESTAMP(NANOS), which Spark 4 cannot read as a
  * timestamp; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
  * (see [[Sessions.tuned]]) and this loader converts the raw nanos back to a
  * microsecond timestamp (integer DIV — no double-precision loss; the
  * testdata has no sub-microsecond components). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
