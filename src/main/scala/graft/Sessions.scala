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
    // testdata timestamps are tz-naive micros; by default Spark 4 infers
    // those as TIMESTAMP_NTZ, which unix_micros()/unix_timestamp() reject
    // and which would silently change window/tumbling semantics vs the
    // DuckDB oracle. Read them as session-tz TIMESTAMP (UTC above) — the
    // same wall-clock values DuckDB sees, and the same type every query
    // was verified against.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // the janino generated-class cache defaults to 100 entries; a session
    // running the whole 150-query surface (Verify, Bench, a long-lived
    // analytics service) compiles several codegen stages per query, so at
    // the default the cache thrashes and queries recompile classes that
    // were already built — pure driver-side latency. Static conf, cheap
    // (class metadata), sized for the full surface with headroom.
    .config("spark.sql.codegen.cache.maxEntries", "5000")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = tuned(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
