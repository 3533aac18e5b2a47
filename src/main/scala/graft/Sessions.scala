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
    // AQE's default 1 MB coalescing floor serializes CPU-dense work on
    // this surface: any shuffle under ~1 MB collapses to ONE post-shuffle
    // partition, so levenshtein/md5/percentile-heavy stages run on one
    // core however many the session has (measured: x99's whole candidate
    // join + verify was a single 5.8 s task behind a 0.6 MB exchange).
    // 64 KB keeps byte-light-but-CPU-heavy stages parallel while still
    // coalescing truly empty partitions; at cluster scale shuffles carry
    // real bytes and the floor is irrelevant (target = bytes/parallelism
    // dominates) — scale-neutral, not a local[32] constant.
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
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
