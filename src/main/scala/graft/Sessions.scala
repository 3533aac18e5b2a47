package graft

import org.apache.spark.sql.SparkSession

/** One place for session tuning so Verify, Bench, tests, and pipeline mains
  * run with identical semantics + scale-oriented settings. */
object Sessions {
  def tuned(b: SparkSession.Builder, cpus: String): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // testdata events.parquet is TIMESTAMP(NANOS) — see Tables
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = tuned(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
