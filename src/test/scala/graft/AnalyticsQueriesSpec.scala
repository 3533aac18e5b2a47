package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Edge semantics for the analytics window queries that the sf-testdata
  * oracles can't isolate — above all the q114 NULL landmine: Spark's
  * `collect_list` silently DROPS NULLs while DuckDB's `list()` KEEPS them
  * (NULLS FIRST under list_sort), so a NULL observation would shrink the
  * frame on one engine and shift the median on the other. Both the engine
  * query and its oracle pin the semantics by excluding NULL observations;
  * this spec plants NULLs and proves the engine honors that contract even
  * though the driver testdata happens to contain none. */
class AnalyticsQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Option[Double], String)]): String = {
    val dir = Files.createTempDirectory("graft-events").toString
    rows.toDF("event_id", "tsmicros", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("tsmicros"))).drop("tsmicros")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q114 planted NULLs: NULL observations are excluded, not frame-shifted") {
    // user 7: values 10.0, NULL, 30.0, 20.0, NULL, 40.0 in ts order.
    // Contract (both engines): NULL rows vanish; medians run over the
    // remaining cents only. Lower median = sorted[(n+1) DIV 2], 1-based.
    val dir = writeEvents(Seq(
      (1L, 1000000L, 7L, "view", Some(10.0), "{}"),
      (2L, 2000000L, 7L, "view", None, "{}"),
      (3L, 3000000L, 7L, "view", Some(30.0), "{}"),
      (4L, 4000000L, 7L, "view", Some(20.0), "{}"),
      (5L, 5000000L, 7L, "view", None, "{}"),
      (6L, 6000000L, 7L, "view", Some(40.0), "{}")))
    val got = SparkEntry.queries("q114_moving_median")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // frames: [1000]→1000; [1000,3000]→1000; [1000,2000,3000]→2000;
    // [1000,2000,3000,4000]→2000. NULL events 2 and 5 emit no row.
    assert(got === Seq(
      (7L, 1L, 1000L, 1000L),
      (7L, 3L, 3000L, 1000L),
      (7L, 4L, 2000L, 2000L),
      (7L, 6L, 4000L, 2000L)),
      s"NULL rows must be excluded from both output and frames, got $got")
  }

  test("q114 all-NULL user contributes nothing; mixed users stay independent") {
    val dir = writeEvents(Seq(
      (1L, 1000000L, 1L, "view", None, "{}"),
      (2L, 2000000L, 1L, "view", None, "{}"),
      (3L, 1000000L, 2L, "view", Some(5.0), "{}")))
    val got = SparkEntry.queries("q114_moving_median")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((2L, 3L, 500L, 500L)))
  }
}
