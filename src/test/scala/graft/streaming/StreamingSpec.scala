package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts aggregates tumbling windows with a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = StreamingOps.windowedCounts(df, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    mem.addData(
      (1L, ts("2024-01-01 00:01:00"), "click", 1.0),
      (2L, ts("2024-01-01 00:02:00"), "click", 2.0),
      (3L, ts("2024-01-01 00:11:00"), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "select event_type, n, total from wc order by event_type").collect()
    q.stop()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("streamingDedup drops repeated event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val q = StreamingOps.streamingDedup(df).writeStream
      .format("memory").queryName("dd").outputMode("append").start()
    mem.addData((1L, ts("2024-01-01 00:00:01")), (1L, ts("2024-01-01 00:00:02")),
                (2L, ts("2024-01-01 00:00:03")))
    q.processAllAvailable()
    val n = spark.sql("select count(distinct event_id) c, count(*) n from dd").head
    q.stop()
    assert(n.getLong(0) == 2 && n.getLong(1) == 2)
  }

  test("file-source stream over the real events parquet matches the batch result") {
    import org.apache.spark.sql.types._
    val dir = "/root/testdata/sf0.001"
    val batch = graft.Tables(spark, dir, "events")
    // file stream sources need a DIRECTORY (testdata is read-only) — stage
    // the parquet into a temp landing folder, the real ingest shape anyway
    val landing = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      landing.resolve("events.parquet"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema)
      .parquet(landing.toString)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
    val q = StreamingOps.windowedCounts(stream, "1 hour", "1 minute")
      .writeStream.format("memory").queryName("filewc")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.sql("select sum(n) from filewc").head.getLong(0)
    q.stop()
    assert(streamed == batch.count()) // every event lands in exactly one window
  }

  test("enrich: stream-static left join picks up dimension attributes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Long)]
    val df = mem.toDF().toDF("event_id", "user_id")
    val q = StreamingOps.enrich(df, dim, Seq("user_id")).writeStream
      .format("memory").queryName("enr").outputMode("append").start()
    mem.addData((10L, 1L), (11L, 3L))
    q.processAllAvailable()
    val rows = spark.sql("select event_id, tier from enr order by event_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    q.stop()
    assert(rows.toSeq == Seq((10L, Some("gold")), (11L, None)))
  }

  test("streamingNearDupCandidates flags stream docs against the static corpus index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (0L, base),
      (1L, "completely different content about database engines and query plans"))
      .toDF("doc_id", "text")
    val index = graft.operators.DedupOperators
      .signatureIndex(corpus, "doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingOps.streamingNearDupCandidates(docs, index, "doc_id", "text")
      .writeStream.format("memory").queryName("nd").outputMode("append").start()
    mem.addData(
      (10L, base),                                           // dup of corpus 0
      (11L, "a fresh unique document mentioning joins and shuffles"))
    q.processAllAvailable()
    val pairs = spark.sql("select distinct new_id, corpus_id from nd")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(pairs == Set((10L, 0L)))
  }

  test("intervalJoinStream: stream-stream join within the time window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingOps.intervalJoinStream(
      views.toDF().toDF("view_id", "user_id", "ts"),
      buys.toDF().toDF("buy_id", "user_id", "ts"),
      "user_id", "ts", "ts", withinSec = 600)
      .selectExpr("l.view_id", "r.buy_id")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    views.addData((1L, 7L, ts("2024-01-01 10:00:00")),
                  (2L, 7L, ts("2024-01-01 12:00:00")))
    buys.addData((100L, 7L, ts("2024-01-01 10:05:00")),  // within 10 min of view 1
                 (101L, 7L, ts("2024-01-01 11:00:00")),  // matches neither
                 (102L, 8L, ts("2024-01-01 10:05:00"))) // other user
    q.processAllAvailable()
    val got = spark.sql("select view_id, buy_id from ssj")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((1L, 100L)))
  }

  test("sessionize emits one summary per user once the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sessions = StreamingOps.sessionize(mem.toDS(), gapMs = 60000)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    mem.addData((7L, ts("2024-01-01 00:00:01"), 1.5),
                (7L, ts("2024-01-01 00:00:05"), 2.5))
    q.processAllAvailable()
    // advance the watermark far past user 7's last event + gap
    mem.addData((8L, ts("2024-01-01 01:00:00"), 9.0))
    q.processAllAvailable()
    mem.addData((8L, ts("2024-01-01 02:00:00"), 1.0)) // one more batch so the
    q.processAllAvailable()                            // timeout actually fires
    val rows = spark.sql("select userId, nEvents, totalValue from sess").collect()
    q.stop()
    assert(rows.exists(r => r.getLong(0) == 7L && r.getLong(1) == 2L &&
      r.getDouble(2) == 4.0))
  }

  test("funnelAdvances: stage advances match the batch q85 semantics within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val adv = StreamingOps.funnelAdvances(mem.toDS(),
      Seq("view", "click", "purchase"), windowMs = 24L * 3600 * 1000)
    val q = adv.writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    mem.addData(
      // user 1: full clean chain inside the window
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:30:00")),
      (1L, "purchase", ts("2024-01-01 11:00:00")),
      // user 2: click BEFORE any view is ignored; the later click is
      // outside the 24 h window of the first view
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-02 11:01:00")),
      // user 5: click exactly at the window bound (inclusive) advances;
      // a purchase at the same instant as the click (strict bound) doesn't
      (5L, "view", ts("2024-01-01 10:00:00")),
      (5L, "click", ts("2024-01-02 10:00:00")),
      (5L, "purchase", ts("2024-01-02 10:00:00")))
    q.processAllAvailable()
    val got = spark.sql("select userId, stage from funnel").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    q.stop()
    // identical to RelationalQueriesSpec's batch q85 case: stage counts
    // 3 views / 2 clicks / 1 purchase over these users
    assert(got === Set((1L, 1), (1L, 2), (1L, 3),
                       (2L, 1), (5L, 1), (5L, 2)))
  }

  test("streamingHeavyHitters: exact when capacity holds all keys, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingOps.streamingHeavyHitters(mem.toDS(), capacity = 100,
        k = 3, shards = 1)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    mem.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(2)("b") ++ Seq.fill(4)("d"): _*)   // b overtakes a
    q.processAllAvailable()
    // Update mode re-emits per batch; the LAST report per key is current
    val last = spark.sql("select key, countMin, countMax from hh").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (k0, rs) => k0 -> rs.last }
    q.stop()
    assert(last("a") == ("a", 5L, 5L))
    assert(last("b") == ("b", 5L, 5L))
    assert(last("d") == ("d", 4L, 4L))
    // capacity covered every key: estimates are exact (err = 0)
    assert(last.values.forall { case (_, lo, hi) => lo == hi })
  }

  test("streamingHeavyHitters: bounded state still brackets true counts under eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingOps.streamingHeavyHitters(mem.toDS(), capacity = 2,
        k = 2, shards = 1)
      .writeStream.format("memory").queryName("hh2")
      .outputMode("update").start()
    // 6×hot, then 5 distinct one-off keys churning the second slot
    mem.addData(Seq.fill(6)("hot") ++ Seq("u1", "u2", "u3", "u4", "u5"): _*)
    q.processAllAvailable()
    val rows = spark.sql("select key, countMin, countMax from hh2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    q.stop()
    val hot = rows.find(_._1 == "hot").get
    assert(hot._2 == 6L && hot._3 == 6L,
      "the heavy key must never be evicted by one-off churn")
    // every reported interval must bracket the true count (≤ 1 here for u*)
    rows.filter(_._1.startsWith("u")).foreach { case (_, lo, hi) =>
      assert(lo <= 1 && 1 <= hi)
    }
  }

  test("streamingAnomalies flags a spike against history, not against itself") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = StreamingOps.streamingAnomalies(mem.toDS(), kSigma = 3.0, minN = 5)
      .writeStream.format("memory").queryName("anom")
      .outputMode("append").start()
    // steady baseline ~10±1 for key 7, then a spike; key 8 stays calm
    mem.addData((7L, 9.0), (7L, 10.0), (7L, 11.0), (7L, 10.0), (7L, 9.5),
                (8L, 5.0), (8L, 5.1), (8L, 4.9), (8L, 5.0), (8L, 5.2))
    q.processAllAvailable()
    mem.addData((7L, 50.0), (7L, 10.5), (8L, 5.1))
    q.processAllAvailable()
    val rows = spark.sql("select key, value from anom").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    q.stop()
    assert(rows == Set((7L, 50.0)),
      s"only the key-7 spike should flag, got $rows")
  }

  test("streamingBottomKSample converges to the batch bottom-k over the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = (1L to 40L).map(id => (if (id % 2 == 0) "even" else "odd", id,
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"samp:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))
    val mem = MemoryStream[(String, Long, String)]
    val q = StreamingOps.streamingBottomKSample(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("bksamp")
      .outputMode("update").start()
    val (first, second) = all.splitAt(25)
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable()
    // Update mode re-emits per batch; keep each stratum's LAST report
    val got = spark.sql("select stratum, rank, docId from bksamp").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (s0, rs) => s0 -> rs.takeRight(3).map(_._3).toSeq }
    q.stop()
    // batch reference: smallest 3 draws per stratum over ALL rows
    val want = all.groupBy(_._1).map { case (s0, rs) =>
      s0 -> rs.map(r => (r._3, r._2)).sorted.take(3).map(_._2).toSeq
    }
    assert(got == want, s"got $got want $want")
  }

  test("streamingIvmRetract maintains the view across batches; full deletion tombstones and re-insert starts fresh") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingOps.streamingIvmRetract(mem.toDS())
      .writeStream.format("memory").queryName("ivm")
      .outputMode("append").start()
    // batch 1: inserts only
    mem.addData(("HIGH", 100L, 1L), ("HIGH", 50L, 1L), ("LOW", 30L, 1L))
    q.processAllAvailable()
    val after1 = spark.sql(
        "select key, n_items, rev_cents from ivm order by key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(after1 == Seq(("HIGH", 2L, 150L), ("LOW", 1L, 30L)))
    // batch 2: partial retraction of HIGH, FULL retraction of LOW
    mem.addData(("HIGH", 50L, -1L), ("LOW", 30L, -1L))
    q.processAllAvailable()
    // batch 3: LOW re-inserts — must start fresh, not resurrect old sums
    mem.addData(("LOW", 7L, 1L))
    q.processAllAvailable()
    val all = spark.sql("select key, n_items, rev_cents from ivm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    q.stop()
    // emitted view-row sequence per group, in batch order
    assert(all.count { case ("LOW", 0L, 0L) => true; case _ => false } == 1,
      s"full deletion must emit exactly one tombstone: ${all.toSeq}")
    assert(all.contains(("HIGH", 1L, 100L)),
      s"partial retraction must re-publish HIGH as (1, 100): ${all.toSeq}")
    assert(all.contains(("LOW", 1L, 7L)),
      s"post-tombstone re-insert must start from empty state: ${all.toSeq}")
    // reconcile the final streamed state against the batch operator fed
    // the equivalent base + signed batch
    val base = Seq(("h1", 100L), ("h2", 50L), ("l1", 30L))
      .toDF("ok", "c")
    val dim = Seq(("h1", "HIGH"), ("h2", "HIGH"), ("l1", "LOW"),
                  ("l2", "LOW")).toDF("ok", "prio")
    val batch = Seq(("h2", 50L, -1L), ("l1", 30L, -1L), ("l2", 7L, 1L))
      .toDF("ok", "c", "m")
    val batchView = graft.EtlQueries.ivmRetract(base, batch, dim)
      .select(col("prio"), col("n_items"), col("rev_cents"))
      .as[(String, Long, Long)].collect().toSet
    val streamedFinal = Set(("HIGH", 1L, 100L), ("LOW", 1L, 7L))
    assert(batchView == streamedFinal,
      s"streamed view must reconcile with batch ivmRetract: $batchView")
  }

  test("streamingCdcClassify tracks add/change/unchange/remove across batches; deletes free state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Boolean)]
    val q = StreamingOps.streamingCdcClassify(mem.toDS())
      .writeStream.format("memory").queryName("cdc")
      .outputMode("append").start()
    mem.addData((1L, "fpA", false), (2L, "fpB", false), (9L, "fpX", true))
    q.processAllAvailable()
    mem.addData((1L, "fpA", false), (2L, "fpC", false), (3L, "fpD", false),
                (2L, "zz", true))
    q.processAllAvailable()
    // re-adding a deleted key must classify as a fresh add, not a change
    mem.addData((2L, "fpE", false))
    q.processAllAvailable()
    val got = spark.sql("select doc_id, status, fp from cdc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    q.stop()
    assert(got === Set(
      (1L, "added", "fpA"), (2L, "added", "fpB"),
      // delete of unknown key 9 emits nothing
      (1L, "unchanged", "fpA"), (2L, "changed", "fpC"),
      (3L, "added", "fpD"), (2L, "removed", "zz"),
      (2L, "added", "fpE")))
  }

  test("streamingCusum alarms equal the batch x112 closed form across a mid-key batch split") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    implicit val sqlCtx = spark.sqlContext
    // user 1 drifts (rate 3 > target 2 → cusum climbs to alarm);
    // user 2 stays on target; the split lands mid-key for user 1
    val rows = Seq(
      (1L, 10L, 3L), (1L, 11L, 3L), (2L, 10L, 2L),
      (1L, 12L, 4L), (1L, 13L, 1L), (2L, 11L, 2L), (1L, 14L, 5L))
    val (b1, b2) = rows.splitAt(3)
    val mem = MemoryStream[(Long, Long, Long)]
    val q = StreamingOps.streamingCusum(mem.toDS())
      .writeStream.format("memory").queryName("cusum_s")
      .outputMode("append").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    val streamed = spark.sql(
        "select userId, day, c, cusum, alarm from cusum_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    q.stop()
    // batch closed form (x112's): cusum = P - min(0, running min P)
    val w = W.partitionBy(col("uid")).orderBy(col("day"))
      .rowsBetween(W.unboundedPreceding, 0)
    val batch = rows.toDF("uid", "day", "c")
      .withColumn("p", sum(col("c") - 2L).over(w))
      .withColumn("cusum", col("p") - least(lit(0L), min(col("p")).over(w)))
      .select(col("uid"), col("day"), col("c"), col("cusum"),
              (col("cusum") >= 5L).as("alarm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(streamed == batch,
      s"streamed CUSUM must equal the batch closed form: $streamed vs $batch")
    assert(streamed.exists(_._5), "the drifting user must alarm")
    assert(!streamed.filter(_._1 == 2L).exists(_._5),
      "the on-target user must never alarm")
  }

  test("streamingBucketDigest state reconciles with the batch x111 digests after any prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingBucketDigest(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("bdig")
      .outputMode("complete").start()
    val b1 = Seq((1L, "alpha"), (65L, "beta"), (2L, "gamma"))
    val b2 = Seq((3L, "delta"), (129L, "epsilon"), (1L, "alpha"))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    val streamed = spark.sql("select bucket, n, digest from bdig")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    q.stop()
    val batch = StreamingOps.streamingBucketDigest(
        (b1 ++ b2).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(streamed === batch,
      "streamed digest state must equal the batch digests of the same rows")
    // buckets 1 and 65 collide mod 64: their digest must be the SUM of
    // both fingerprints (order-free merge), and state is <= 64 rows
    assert(streamed(1L)._1 == 4L) // ids 1 (x2), 65, 129 all in bucket 1
    assert(streamed.size <= 64)
  }

  test("streamingCmsSketch state reconciles cell-by-cell with the batch x81 sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingOps.streamingCmsSketch(mem.toDF().toDF("tok"))
      .writeStream.format("memory").queryName("cms")
      .outputMode("complete").start()
    val batch1 = Seq("the", "the", "cat", "sat", "on", "the", "mat")
    val batch2 = Seq("the", "dog", "sat", "mat", "mat")
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    val streamed = spark.sql("select r, b, cnt from cms").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    q.stop()
    val batch = StreamingOps.streamingCmsSketch(
        (batch1 ++ batch2).toDF("tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch,
      "streamed CMS state must equal the batch sketch of the same tokens")
    // state bound: never more than depth * width cells, whatever streams
    assert(streamed.size <= 4 * 512)
    // and the sketch dominates every exact count (CMS theorem holds on
    // the streamed state too)
    val exact = (batch1 ++ batch2).groupBy(identity).view.mapValues(_.size)
    exact.foreach { case (tok, n) =>
      val est = (0 until 4).map { r =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$r:$tok".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        val bkt = java.lang.Long.parseLong(h, 16) % 512
        streamed.getOrElse((r.toLong, bkt), 0L)
      }.min
      assert(est >= n, s"CMS estimate $est < exact $n for '$tok'")
    }
  }

  test("streamingKmvDistinct state reconciles with the batch sketch and is exact below saturation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamingOps.streamingKmvDistinct(
        mem.toDF().toDF("stratum", "key"), k = 8)
      .writeStream.format("memory").queryName("kmv")
      .outputMode("complete").start()
    // sa: 5 distinct (below k=8 -> exact, duplicates absorbed across
    // batches); sb: 20 distinct (saturated -> estimator path)
    val batch1 = Seq("a1", "a2", "a3").map(("sa", _)) ++
      (1 to 12).map(i => ("sb", s"b$i"))
    val batch2 = Seq("a1", "a4", "a5", "a2").map(("sa", _)) ++
      (8 to 20).map(i => ("sb", s"b$i"))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    val streamed = spark.sql("select stratum, kmv, est_distinct from kmv")
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Long](1), r.getLong(2)))).toMap
    q.stop()
    val batch = StreamingOps.streamingKmvDistinct(
        (batch1 ++ batch2).toDF("stratum", "key"), k = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(streamed === batch,
      "streamed KMV state must equal the batch sketch of the same keys")
    assert(streamed("sa")._2 == 5L,
      "unsaturated stratum must report the exact distinct count")
    assert(streamed("sb")._1.length == 8, "state capped at k hashes")
    val est = streamed("sb")._2
    assert(est > 0 && math.abs(est - 20L) < 40,
      s"saturated estimate wildly off (k=8 envelope): $est vs 20")
  }

  test("streamingEntityMatch converges to the batch best-match for every streamed record") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dirtySql = "concat(substring(c_name, 1, 9 + c_custkey % 5), " +
      "substring(c_name, 11 + c_custkey % 5, 30))"
    def bk(nm: String) =
      s"concat(substring($nm, 1, 3), substring($nm, -3, 3))"
    val master = graft.Tables(spark, "/root/testdata/sf0.001", "customer")
      .selectExpr("c_custkey AS cid", "c_name", s"${bk("c_name")} AS bk")
    val dirtyAll = graft.Tables(spark, "/root/testdata/sf0.001", "customer")
      .selectExpr("c_custkey AS d_id", s"$dirtySql AS d_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = dirtyAll.splitAt(dirtyAll.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingEntityMatch(
        mem.toDF().toDF("d_id", "d_name")
          .selectExpr("d_id", "d_name", s"${bk("d_name")} AS bk"),
        master)
      .writeStream.format("memory").queryName("em")
      .outputMode("complete").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    val streamed = spark.sql("select d_id, matched, jw from em")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    val batch = graft.SparkEntry.queries("x85_jw_entity_match")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      "streamed best-match state must equal the batch x85 result")
  }

  test("streamingQualityCounts reconciles with the batch report after any prefix") {
    import spark.implicits._
    import graft.ops.QualityOps._
    implicit val sqlCtx = spark.sqlContext
    val checks = Seq(NotNull("sval"), InSet("sval", Seq("O", "F")),
      Bounds("v", 0L, 100L), Satisfies("v_even", col("v") % 2 === 0))
    val mem = MemoryStream[(String, Long)]
    val q = StreamingOps.streamingQualityCounts(
        mem.toDF().toDF("sval", "v"), checks)
      .writeStream.format("memory").queryName("qc")
      .outputMode("complete").start()
    val b1 = Seq(("O", 10L), ("X", -5L), ("F", 7L))
    val b2 = Seq(("O", 999L), ("F", 4L), ("Z", 3L))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    val streamed = spark.sql(
        "select check, observed, violations, pass from qc")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    q.stop()
    val batch = report((b1 ++ b2).toDF("sval", "v"), checks)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(streamed == batch,
      s"streamed counters must equal the batch report: $streamed vs $batch")
    assert(streamed("in_set(sval)")._2 == 2L) // X and Z
    assert(streamed("bounds(v)")._2 == 2L)    // -5 and 999
  }

  test("streamingScdIntervals: closed versions reconcile with the batch lead() intervals") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    implicit val sqlCtx = spark.sqlContext
    // per-user monotone change feed split ACROSS batches mid-key
    val evs = Seq(
      (1L, ts("2024-01-01 00:00:00"), "bronze"),
      (1L, ts("2024-01-01 01:00:00"), "silver"),
      (2L, ts("2024-01-01 00:30:00"), "bronze"),
      (1L, ts("2024-01-01 02:00:00"), "gold"),
      (2L, ts("2024-01-01 03:00:00"), "gold"),
      (2L, ts("2024-01-01 04:00:00"), "bronze"))
    val (b1, b2) = evs.splitAt(3)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingOps.streamingScdIntervals(mem.toDS())
      .writeStream.format("memory").queryName("scd")
      .outputMode("append").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    val streamed = spark.sql(
        "select key, value, valid_from, valid_to from scd")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
    q.stop()
    // batch reference: lead() over the same events — closed rows only
    val w = Window.partitionBy(col("key")).orderBy(col("ts"))
    val batch = evs.toDF("key", "ts", "value")
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .filter(col("valid_to").isNotNull)
      .select(col("key"), col("value"), col("ts").as("valid_from"),
              col("valid_to"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(streamed == batch,
      s"closed versions must equal the batch intervals: $streamed vs $batch")
    // the open heads (gold@1, bronze@2 from 04:00) are state, not rows
    assert(streamed.size == 4)
  }

  test("streamingScdIntervals: stragglers are counted, not silently dropped; equal ts closes zero-length") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingOps.streamingScdIntervals(mem.toDS())
      .writeStream.format("memory").queryName("scd_strag")
      .outputMode("append").start()
    mem.addData((1L, ts("2024-01-01 03:00:00"), "head"))
    q.processAllAvailable()
    // two stragglers older than the open head, then a real change
    mem.addData(
      (1L, ts("2024-01-01 01:00:00"), "late1"),
      (1L, ts("2024-01-01 02:00:00"), "late2"),
      (1L, ts("2024-01-01 04:00:00"), "next"))
    q.processAllAvailable()
    // equal-timestamp change: closes the open head as a [t, t) version
    mem.addData((1L, ts("2024-01-01 04:00:00"), "dup"))
    q.processAllAvailable()
    val rows = spark.sql(
        "select value, valid_from, valid_to, stragglers_seen from scd_strag" +
        " order by valid_to, value")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).toSeq
    q.stop()
    assert(rows == Seq(
      // the close carries the key's cumulative straggler count: the two
      // lates never rewrote history, but the feed disorder is visible
      ("head", ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00"), 2L),
      // pinned equal-ts semantics: a zero-length version, like lead()
      ("next", ts("2024-01-01 04:00:00"), ts("2024-01-01 04:00:00"), 2L)),
      s"got $rows")
  }

  test("streamingWindowedNearDup: distinct streamed pairs equal batch x119 horizon candidates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // keep event times well above epoch 0: the initial watermark is 0,
    // and a row AT the watermark is treated as late by the join state
    def at(s: Long) = new Timestamp((1700000000L + s) * 1000L)
    val docs = Seq(
      (1L, at(0), "the quick brown fox jumps over the lazy dog tonight"),
      (2L, at(30), "the quick brown fox jumps over the lazy cat tonight"),
      // same text as doc 1, but 200 s away — OUTSIDE the 60 s horizon
      (3L, at(200), "the quick brown fox jumps over the lazy dog tonight"),
      (4L, at(230), "the quick brown fox jumps over the lazy dog tonight"),
      (5L, at(100), "completely different words with no shingle overlap"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingOps.streamingWindowedNearDup(
        mem.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", withinSec = 60)
      .writeStream.format("memory").queryName("wnd")
      .outputMode("append").start()
    mem.addData(docs.take(3): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(3): _*)
    q.processAllAvailable()
    val streamed = spark.sql("select distinct id_a, id_b from wnd")
      .as[(Long, Long)].collect().toSet
    q.stop()
    val batch = graft.operators.DedupOperators
      .windowedMinhashCandidates(
        docs.toDF("doc_id", "ts", "text")
          .withColumn("sec", col("ts").cast("long")),
        "doc_id", "text", "sec", window = 60L)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch,
      s"streamed $streamed must equal batch horizon candidates $batch")
    // the horizon is live: the duplicate 200 s apart is excluded, the
    // 30 s twins are found
    assert(batch.contains((3L, 4L)))
    assert(!batch.contains((1L, 3L)))
    assert(batch.exists { case (a, _) => a == 1L })
  }

  test("streamingSemanticScreen: streamed vectors reconcile with batch x128's pair frame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus: 8 orthogonal axes (the ClusterQueriesSpec geometry) -> a
    // deterministic one-axis-per-cell index; batch: a scaled copy of axis
    // 2 (cos = 1 with corpus id 2) and an all-new direction
    val axes = (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(8)(j => if (j == i) 1f else 0f))
    }
    val corpus = axes.toDF("vec_id", "embedding")
    val m = graft.operators.KMeansDet.fit(corpus, k = 8, iters = 2)
    val index = graft.operators.KMeansDet.assignWithVec(corpus, m)
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamingOps.streamingSemanticScreen(stream, index, m, 0.4)
      .writeStream.format("memory").queryName("sem").outputMode("append")
      .start()
    val fresh = Seq.tabulate(8)(j => if (j < 4) 0.5f else -0.5f)
    mem.addData((20L, Seq.tabulate(8)(j => if (j == 2) 1.01f else 0f)),
                (21L, fresh))
    q.processAllAvailable()
    val got = spark.sql("select distinct new_id, corpus_id, cos from sem")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    // batch x128's pair frame over the same rows: only the copy matches
    assert(got == Set((20L, 2L, 1.0)))
    // and the streamed evidence equals the batch screen of the same batch
    val batchPairs = StreamingOps.streamingSemanticScreen(
      Seq((20L, Seq.tabulate(8)(j => if (j == 2) 1.01f else 0f)),
          (21L, fresh)).toDF("vec_id", "embedding"), index, m, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(batchPairs.map(t => (t._1, t._2, t._3)) == got)
    spark.catalog.clearCache()
  }

  test("streamingQuantileSketch: streamed bucket counts equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = Seq(420L, 999L, 1000L, 5292311L, 5299999L, 5300000L,
                    7L, 0L, 123456L, 123999L)
    val mem = MemoryStream[Long]
    val q = StreamingOps.streamingQuantileSketch(mem.toDF().toDF("c"))
      .writeStream.format("memory").queryName("qs").outputMode("complete")
      .start()
    mem.addData(cents.take(4): _*)
    q.processAllAvailable()
    mem.addData(cents.drop(4): _*) // second batch merges into the state
    q.processAllAvailable()
    val streamed = spark.sql("select b, count from qs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    val batch = cents.toDF("c")
      .select(graft.ops.QuantileSketchOps.bucketOf(col("c")).as("b"))
      .groupBy("b").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // boundary sanity: 5299999 and 5300000 land in adjacent buckets
    assert(batch.contains(7529L) && batch.contains(7530L))
  }

  test("streamingRepetitionScreen: streamed metrics equal batch x136 over the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "spam spam spam spam ham"),           // repetitive
      (2L, "a quick brown fox jumps the fence"), // clean
      (3L, "one two one two three one two"),     // bigram 'one two' x3
      (4L, "solo"))                              // 1 word: no bigrams
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps
      .streamingRepetitionScreen(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("rep").outputMode("append")
      .start()
    mem.addData(docs.take(2): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*)
    q.processAllAvailable()
    val streamed = spark.sql("select * from rep")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    q.stop()
    val batch = graft.functions.TextFunctions
      .docRepetition(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(streamed == batch)
    // spot-check the semantics the parity gate also covers
    assert(batch(1L) == Seq(5L, 3L, 3L, 1L, true))  // 'spam spam' x3
    assert(batch(3L) == Seq(7L, 4L, 3L, 0L, true))  // 'one two' x3
    assert(batch(4L) == Seq(1L, 0L, 0L, 0L, false)) // no bigrams, no flag
  }

  test("streamingDsirScreen: streamed evidence sums to the frozen-model batch weights; unseen buckets smooth, not drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // frozen model fitted on a tiny "yesterday" corpus
    val corpus = Seq(
      (100L, "S", true, "alpha beta alpha beta"),
      (101L, "S", false, "gamma delta gamma delta"))
      .toDF("doc_id", "source", "t", "text")
    val bg = corpus.select(col("doc_id"), col("t"),
        explode(graft.functions.TextFunctions
          .wordNgrams(col("text"), 2)).as("b"))
      .withColumn("h",
        conv(substring(md5(col("b")), 1, 12), 16, 10).cast("long") % 1024)
    val model = bg.groupBy("h").agg(count(lit(1)).as("cr"))
      .join(bg.filter(col("t")).groupBy("h").agg(count(lit(1)).as("ct")),
            Seq("h"), "left_outer").na.fill(0L, Seq("ct")).cache()
    val Array(nr, nt) = model.agg(sum("cr"), sum("ct")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    // today's arrivals: one target-like, one off-target, one with a
    // bigram the corpus never saw (eta theta)
    val docs = Seq((1L, "alpha beta alpha beta"),
                   (2L, "gamma delta gamma delta"),
                   (3L, "eta theta eta theta"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingDsirScreen(
        mem.toDF().toDF("doc_id", "text"), model, nr, nt)
      .writeStream.format("memory").queryName("dsir").outputMode("append")
      .start()
    mem.addData(docs.take(1): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(1): _*)
    q.processAllAvailable()
    val streamed = spark.sql(
      "select doc_id, sum(lr) from dsir group by doc_id")
      .as[(Long, Long)].collect().toMap
    q.stop()
    // reference: the same frozen-model arithmetic, straight-line (the
    // overflow-free bitlen-SUM form of TextFunctions.bitlenLogRatio)
    def refLr(cr: Long, ct: Long): Long =
      java.lang.Long.toBinaryString(ct + 1).length.toLong +
        java.lang.Long.toBinaryString(nr).length.toLong -
        java.lang.Long.toBinaryString(cr + 1).length.toLong -
        java.lang.Long.toBinaryString(nt).length.toLong
    val m = model.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def hOf(b: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(b.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12), 16) % 1024
    }
    val want = docs.map { case (id, text) =>
      val ws = text.split("\\s+").toSeq
      id -> ws.zip(ws.tail).map { case (a, b) =>
        val (cr, ct) = m.getOrElse(hOf(s"$a $b"), (0L, 0L))
        refLr(cr, ct)
      }.sum
    }.toMap
    assert(streamed == want)
    // target-like arrival outscores off-target; unseen buckets scored
    // the smoothed ratio, and the doc was NOT dropped
    assert(streamed(1L) > streamed(2L))
    assert(streamed.contains(3L))
    model.unpersist()
  }

  test("streamingNbQualityScreen: streamed evidence reproduces the frozen-classifier batch scores; unseen buckets smooth, not drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // frozen classifier fitted on a tiny labeled "yesterday" corpus
    val corpus = Seq(
      (100L, true, "alpha beta alpha beta"),
      (101L, false, "gamma delta gamma delta"))
      .toDF("doc_id", "pos", "text")
    val tk = corpus.select(col("doc_id"), col("pos"),
        explode(graft.functions.TextFunctions.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .withColumn("h",
        conv(substring(md5(col("w")), 1, 12), 16, 10).cast("long") % 1024)
    val model = tk.groupBy("h")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
           sum(when(!col("pos"), 1L).otherwise(0L)).as("cn")).cache()
    val Array(np, nn) = model.agg(sum("cp"), sum("cn")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    // today's arrivals: one positive-like, one negative-like, one with
    // tokens the classifier never saw (eta theta)
    val docs = Seq((1L, "alpha beta alpha beta"),
                   (2L, "gamma delta gamma delta"),
                   (3L, "eta theta eta theta"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingNbQualityScreen(
        mem.toDF().toDF("doc_id", "text"), model, np, nn)
      .writeStream.format("memory").queryName("nbq").outputMode("append")
      .start()
    mem.addData(docs.take(1): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(1): _*)
    q.processAllAvailable()
    val streamed = spark.sql(
      "select doc_id, sum(lr) from nbq group by doc_id")
      .as[(Long, Long)].collect().toMap
    q.stop()
    // reference: the same frozen-classifier arithmetic, straight-line
    // (the 8-bit-mantissa fixed-point log of TextFunctions.ilog2x256)
    def ilog(x: Long): Long = {
      val b = java.lang.Long.toBinaryString(x).length
      (b - 1).toLong * 256 + ((x << 8) >> (b - 1)) - 256
    }
    def refLr(cp: Long, cn: Long): Long =
      ilog(cp + 1) + ilog(nn) - ilog(cn + 1) - ilog(np)
    val m = model.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def hOf(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12), 16) % 1024
    }
    val want = docs.map { case (id, text) =>
      id -> text.split("\\s+").toSeq.map { w =>
        val (cp, cn) = m.getOrElse(hOf(w), (0L, 0L))
        refLr(cp, cn)
      }.sum
    }.toMap
    assert(streamed == want)
    // positive-like arrival scores positive, negative-like negative
    // (the x153 sign decision with a balanced prior of 0), and the
    // unseen-token doc was scored (smoothed), not dropped
    assert(streamed(1L) > 0 && streamed(2L) < 0)
    assert(streamed.contains(3L))
    model.unpersist()
  }

  test("streamingLuhnScreen: streamed screen equals batch; valid cards redacted, off-by-one twins untouched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "pay with 5260181590830164 now"),  // Luhn-valid -> redacted
      (2L, "pay with 5260181590830165 now"),  // check digit off -> kept
      (3L, "no digits here at all"),
      (4L, "two 6131860913909962 and 0308246281948214 cards"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingLuhnScreen(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("luhn").outputMode("append")
      .start()
    mem.addData(docs.take(2): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*)
    q.processAllAvailable()
    val streamed = spark.sql("select * from luhn")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    q.stop()
    val batch = graft.CorpusQueries
      .luhnScreen(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(streamed == batch)
    def md5s(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(batch(1L) == Seq(1L, 1L, md5s("pay with <CARD> now")))
    assert(batch(2L) ==
      Seq(1L, 0L, md5s("pay with 5260181590830165 now")))
    assert(batch(3L) == Seq(0L, 0L, md5s("no digits here at all")))
    assert(batch(4L) == Seq(2L, 2L, md5s("two <CARD> and <CARD> cards")))
  }

  test("streamingVadScreen: streamed speech frames re-cut into exactly the batch vadPlan segments") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, (1 to 400).map(i => ('a' + i % 26).toChar).mkString),
      (2L, "b" * 95),
      (3L, "xyz"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingVadScreen(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("vad").outputMode("append")
      .start()
    mem.addData(docs.take(1): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(1): _*)
    q.processAllAvailable()
    q.stop()
    // batch-side segment assembly over the materialized evidence = the
    // island arithmetic of vadPlan, verbatim
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("f"))
    val streamedSegs = spark.sql("select * from vad")
      .withColumn("_grp", col("f") - row_number().over(w))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(min(col("f")).as("seg_start"), max(col("f")).as("seg_end"),
           count(lit(1)).as("n_frames"), max(col("energy")).as("e_max"))
      .select("doc_id", "seg_start", "seg_end", "n_frames", "e_max")
      .collect().map(_.toSeq).toSet
    val batchSegs = graft.operators.Multimodal
      .vadPlan(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "seg_start", "seg_end", "n_frames", "e_max")
      .collect().map(_.toSeq).toSet
    assert(streamedSegs == batchSegs)
    assert(batchSegs.nonEmpty)
  }

  test("streamingFunnelAdmission: admitted arrivals = batch kept set plus batch-internal duplicates (deduped batch-side)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val scope: graft.ops.CacheScope = graft.ops.CacheScope.session
    val hiQ1 = "the and of to in a is for the cat sat on a mat"
    val miQ1 = "the quick brown fox jumps over the lazy dog and runs far away"
    val loQ1 = "!a! ?b? ,c, ;d; !e! ?f? ,g, ;h! !i? ?j! ,k; ;l, !m, ?n;"
    val corpus = Seq((1L, "A", hiQ1),
      (2L, "A", hiQ1.replace("cat", "bat")), (3L, "A", miQ1),
      (4L, "A", miQ1.replace("fox", "vix")), (5L, "A", loQ1),
      (6L, "A", loQ1.replace("!a!", "!z!")))
      .toDF("doc_id", "source", "text")
    // frozen artifacts, built from the same public pieces x159 uses
    val cStaged = graft.CorpusQueries.gateStage(corpus)
      .filter(!col("_rep")).cache()
    val cuts = graft.ops.QualityOps
      .tertileCutoffs(cStaged, "q", "source").cache()
    val idx = graft.ops.QualityOps
      .applyTertiles(cStaged, cuts, "q", "source")
      .filter(col("bucket") =!= "tail")
      .select(graft.functions.TextFunctions.fingerprint(col("text"))
        .as("_fp")).distinct().cache()
    val miNew = miQ1.replace("quick", "quiet")
    val batch = Seq(
      (101L, "A", miQ1.toUpperCase),  // frozen-index hit -> refused
      (102L, "A", miNew),             // admitted (batch keeps it)
      (103L, "A", miNew.toUpperCase), // admitted; deduped batch-side
      (104L, "A", loQ1.replace("!a!", "!y!")), // frozen tail -> refused
      (105L, "A", "spam ham spam ham spam ham spam ham spam ham spam ham"),
      (106L, "Z", hiQ1.replace("cat", "rat"))) // uncalibrated -> head
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingOps.streamingFunnelAdmission(
        mem.toDF().toDF("doc_id", "source", "text"), cuts, idx)
      .writeStream.format("memory").queryName("adm").outputMode("append")
      .start()
    mem.addData(batch.take(3): _*)
    q.processAllAvailable()
    mem.addData(batch.drop(3): _*)
    q.processAllAvailable()
    val admitted = spark.sql("select doc_id from adm")
      .as[Long].collect().toSet
    q.stop()
    // reconciliation: the stream admits the batch-kept docs PLUS
    // within-batch duplicates (keep-first is a rank — batch-side work)
    val lineage = graft.CorpusQueries
      .curationFunnelIncremental(corpus,
        batch.toDF("doc_id", "source", "text"))
      .select("doc_id", "stage", "dup_of").collect()
      .map(r => (r.getLong(0), r.getString(1),
                 Option(r.get(2)).map(_.toString.toLong))).toSeq
    val wantAdmitted = lineage.collect {
      case (id, "kept", _) => id
      case (id, "duplicate", Some(k)) if k >= 100L => id // batch keeper
    }.toSet
    assert(admitted == wantAdmitted)
    assert(admitted == Set(102L, 103L, 106L))
    cStaged.unpersist(); cuts.unpersist(); idx.unpersist()
  }

  test("streamingTombstoneScreen: purged keys never re-enter; admitted rows equal the batch anti join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tombs = Seq(97L, 194L).toDF("k")
    val rows = Seq((1L, 10L, "a"), (2L, 97L, "b"), (3L, 11L, "c"),
                   (4L, 194L, "d"), (5L, 97L, "e"), (6L, 12L, "f"))
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamingOps.streamingTombstoneScreen(
        mem.toDF().toDF("row_id", "cust_id", "payload"), tombs, "cust_id")
      .writeStream.format("memory").queryName("tomb").outputMode("append")
      .start()
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*)
    q.processAllAvailable()
    val streamed = spark.sql("select row_id, cust_id from tomb")
      .as[(Long, Long)].collect().toSet
    q.stop()
    val batch = rows.toDF("row_id", "cust_id", "payload")
      .join(tombs, col("cust_id") === col("k"), "left_anti")
      .select("row_id", "cust_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 10L), (3L, 11L), (6L, 12L)))
    // the audit column is present on every admitted row
    val flags = spark.sql("select screened_at_ingest from tomb")
      .collect().map(_.getBoolean(0))
    assert(flags.nonEmpty && flags.forall(identity))
  }

  test("streamingHardNegativeScreen: streamed evidence equals the batch different-label cell pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus: 8 orthogonal axes, alternating labels -> one axis per cell
    val axes = (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(8)(j => if (j == i) 1f else 0f), i % 2)
    }
    val corpus = axes.toDF("vec_id", "embedding", "label")
    val m = graft.operators.KMeansDet.fit(
      corpus.select("vec_id", "embedding"), k = 8, iters = 2)
    val index = graft.operators.KMeansDet.assignWithVec(corpus, m)
      .join(corpus.select(col("vec_id"),
                          col("label").cast("long").as("lab")), "vec_id")
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val stream = mem.toDF().toDF("vec_id", "embedding", "label")
    val q = StreamingOps.streamingHardNegativeScreen(stream, index, m)
      .writeStream.format("memory").queryName("hneg").outputMode("append")
      .start()
    // 20: near axis 2 (label 0) carrying label 1 -> a hard negative;
    // 21: near axis 3 (label 1) carrying label 1 -> same label, no row
    val near2 = Seq.tabulate(8)(j => if (j == 2) 1.01f else 0f)
    val near3 = Seq.tabulate(8)(j => if (j == 3) 1.01f else 0f)
    mem.addData((20L, near2, 1))
    q.processAllAvailable()
    mem.addData((21L, near3, 1))
    q.processAllAvailable()
    val got = spark.sql(
      "select new_id, neg_id, label, neg_label, cos from hneg")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    q.stop()
    assert(got == Set((20L, 2L, 1L, 0L, 1.0)), s"got $got")
    // and the streamed evidence equals the same operator run as batch
    val batch = StreamingOps.streamingHardNegativeScreen(
      Seq((20L, near2, 1), (21L, near3, 1))
        .toDF("vec_id", "embedding", "label"), index, m)
      .select("new_id", "neg_id", "label", "neg_label", "cos")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(batch == got)
    spark.catalog.clearCache()
  }

  test("streamingQuotaAdmission: corpus rows screened against their own boundaries reproduce the batch keep set; new arrivals follow the frozen quota") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two cells x 6 members at graded distances from their axis
    val pts = (0 until 12).map { i =>
      val axis = i % 2
      val off = 0.05f * (i / 2) // distance grows with i
      (i.toLong, Seq.tabulate(4)(j =>
        if (j == axis) 1f else if (j == 2) off else 0f))
    }
    val corpus = pts.toDF("vec_id", "embedding")
    val m = graft.operators.KMeansDet.fit(corpus, k = 2, iters = 2)
    val sn = graft.operators.KMeansDet.assignWithVec(corpus, m)
    import org.apache.spark.sql.expressions.Window
    val cf = m.centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq.toDF("cell", "_c")
    import graft.functions.{VectorFunctions => V}
    val scored = sn.join(broadcast(cf), Seq("cell"))
      .withColumn("d",
        V.dot(col("v"), col("v")) - lit(2.0) * V.dot(col("v"), col("_c"))
          + V.dot(col("_c"), col("_c")))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("d").asc, col("vec_id").asc)
    val kept = scored
      .withColumn("rn", row_number().over(w))
      .withColumn("csize",
        count(lit(1)).over(Window.partitionBy(col("cell"))))
      .filter(col("rn") <= expr("(csize + 3) div 4")).persist()
    // the frozen artifact: the LAST admitted (d, id) per cell
    val boundaries = kept
      .withColumn("bs", max(struct(col("d").as("x"),
        col("vec_id").cast("long").as("y")))
        .over(Window.partitionBy(col("cell"))))
      .select(col("cell"), col("bs.x").as("bd"), col("bs.y").as("bid"))
      .distinct()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.streamingQuotaAdmission(
        mem.toDF().toDF("vec_id", "embedding"), boundaries, m)
      .writeStream.format("memory").queryName("quota").outputMode("append")
      .start()
    // replay the corpus through the front door, plus one central and one
    // peripheral new arrival
    mem.addData(pts.take(7): _*)
    q.processAllAvailable()
    mem.addData(pts.drop(7) ++ Seq(
      // the cell's off-component mean is ~0.125, so this lands at the
      // centroid (admitted) while the 0.9-off arrival is peripheral
      (100L, Seq(1f, 0f, 0.125f, 0f)),
      (101L, Seq(1f, 0f, 0.9f, 0f))): _*)
    q.processAllAvailable()
    val admitted = spark.sql("select vec_id from quota where admitted")
      .as[Long].collect().toSet
    q.stop()
    val batchKeep = kept.select(col("vec_id")).as[Long].collect().toSet
    assert((admitted - 100L - 101L) == batchKeep,
      s"corpus replay must reproduce the batch keep set: " +
        s"$admitted vs $batchKeep")
    assert(admitted.contains(100L) && !admitted.contains(101L))
    kept.unpersist()
    spark.catalog.clearCache()
  }

  test("streamingGraphServe: the served answer over a query split equals batch GraphSearch.search") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val scope: graft.ops.CacheScope = graft.ops.CacheScope.session
    val beam = 2; val hops = 2; val kg = 2; val k = 4
    // three tight clusters around orthogonal axes with graded offsets —
    // enough structure that hops genuinely move the frontier
    val pts = (0 until 18).map { i =>
      val axis = i % 3
      val off = 0.03 * (i / 3)
      (i.toLong, axis.toLong,
       Seq.tabulate(6)(j =>
         if (j == axis) 1.0 else if (j == 3 + axis) off else 0.0))
    }
    val sn = pts.toDF("vec_id", "cell", "v")
      .withColumn("nrm", graft.functions.VectorFunctions.norm(col("v")))
      .persist()
    val g = graft.operators.NnDescent.build(sn, kg, rounds = 1,
        mixBuckets = 4)
      .select(col("u"), col("w")).persist()
    g.count()
    val qrows = pts.filter(_._1 < 6) // two queries per cell
    val q = sn.filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
              col("nrm").as("qn"))
    val assigned = sn.filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("cell"))
    val seeds = graft.operators.GraphSearch.cellSeeds(assigned, sn, beam)
    val batch = graft.operators.GraphSearch.search(g, sn, q, seeds,
        beam, hops)
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn").cast("long").as("rank"), col("nid"),
              col("cos"), col("scored_n"))
      .collect().map(_.toSeq).toSet

    val artifacts = graft.operators.GraphSearch.serveShards(g, sn, beam,
        hops).persist()
    // the serving path is genuinely SHARDED: one row per cell, and the
    // query split below spans several shards (never a single-shard
    // degenerate pass)
    assert(artifacts.count() == 3)
    assert(qrows.map(_._2).distinct.size >= 2)
    val mem = MemoryStream[(Long, Seq[Double], Long)]
    val stream = mem.toDF().toDF("qid", "qv", "cell")
      .withColumn("qn", graft.functions.VectorFunctions.norm(col("qv")))
    val sq = StreamingOps.streamingGraphServe(stream, artifacts,
        beam, hops, k)
      .writeStream.format("memory").queryName("gserve")
      .outputMode("append").start()
    // split the queries across two micro-batches — per-row statelessness
    // means the split cannot change any answer
    mem.addData(qrows.take(3).map(p => (p._1, p._3, p._2)): _*)
    sq.processAllAvailable()
    mem.addData(qrows.drop(3).map(p => (p._1, p._3, p._2)): _*)
    sq.processAllAvailable()
    val streamed = spark.table("gserve")
      .select(col("qid"), col("rank").cast("long"), col("nid"),
              col("cos"), col("scored_n"))
      .collect().map(_.toSeq).toSet
    sq.stop()
    assert(streamed == batch,
      s"streamed ${streamed.size} rows != batch ${batch.size}:\n" +
        s"only-stream: ${(streamed -- batch).take(5)}\n" +
        s"only-batch: ${(batch -- streamed).take(5)}")
    sn.unpersist(); g.unpersist()
    spark.catalog.clearCache()
  }

  test("streamingGraphServeTop2: two-shard serve over a query split equals batch top-2 search (cells in different shard rows)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val scope: graft.ops.CacheScope = graft.ops.CacheScope.session
    val beam = 2; val hops = 2; val kg = 2; val k = 4
    val pts = (0 until 18).map { i =>
      val axis = i % 3
      val off = 0.03 * (i / 3)
      (i.toLong, axis.toLong,
       Seq.tabulate(6)(j =>
         if (j == axis) 1.0 else if (j == 3 + axis) off else 0.0))
    }
    val sn = pts.toDF("vec_id", "cell", "v")
      .withColumn("nrm", graft.functions.VectorFunctions.norm(col("v")))
      .persist()
    val g = graft.operators.NnDescent.build(sn, kg, rounds = 1,
        mixBuckets = 4)
      .select(col("u"), col("w")).persist()
    g.count()
    // each query routes to its own cell plus a DIFFERENT second cell —
    // the two shard rows the top-2 serve must union correctly
    val qrows = pts.filter(_._1 < 6)
      .map(p => (p._1, p._3, p._2, (p._2 + 1) % 3))
    val q = sn.filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
              col("nrm").as("qn"))
    // batch reference: x163's 'two'-mode seeds — per (qid, cell),
    // members by nid ASC, self excluded, beam/2 each
    val seedRows = for {
      (qid, _, c1, c2) <- qrows
      c <- Seq(c1, c2)
      nid <- pts.filter(p => p._2 == c && p._1 != qid)
        .map(_._1).sorted.take(beam / 2)
    } yield (qid, nid)
    val batch = graft.operators.GraphSearch.search(g, sn, q,
        seedRows.toDF("qid", "nid"), beam, hops)
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn").cast("long").as("rank"), col("nid"),
              col("cos"), col("scored_n"))
      .collect().map(_.toSeq).toSet
    val artifacts = graft.operators.GraphSearch.serveShards(g, sn, beam,
        hops).persist()
    assert(artifacts.count() == 3)
    val mem = MemoryStream[(Long, Seq[Double], Long, Long)]
    val stream = mem.toDF().toDF("qid", "qv", "cell1", "cell2")
      .withColumn("qn", graft.functions.VectorFunctions.norm(col("qv")))
    val sq = StreamingOps.streamingGraphServeTop2(stream, artifacts,
        beam, hops, k)
      .writeStream.format("memory").queryName("gserve2")
      .outputMode("append").start()
    mem.addData(qrows.take(3).map(p => (p._1, p._2, p._3, p._4)): _*)
    sq.processAllAvailable()
    mem.addData(qrows.drop(3).map(p => (p._1, p._2, p._3, p._4)): _*)
    sq.processAllAvailable()
    val streamed = spark.table("gserve2")
      .select(col("qid"), col("rank").cast("long"), col("nid"),
              col("cos"), col("scored_n"))
      .collect().map(_.toSeq).toSet
    sq.stop()
    assert(streamed == batch,
      s"streamed ${streamed.size} rows != batch ${batch.size}:\n" +
        s"only-stream: ${(streamed -- batch).take(5)}\n" +
        s"only-batch: ${(batch -- streamed).take(5)}")
    // the artifact records its build parameters; a serve call with
    // different ones must fail before the stream starts
    val em = intercept[IllegalArgumentException](
      StreamingOps.streamingGraphServe(stream, artifacts, beam, hops + 1,
        k))
    assert(em.getMessage.contains("built with"))
    val eo = intercept[IllegalArgumentException](
      StreamingOps.streamingGraphServeTop2(stream, artifacts, 3, hops, k))
    assert(eo.getMessage.contains("even"))
    // an artifact lacking the parameter columns (a stale build) is
    // rejected outright
    val en = intercept[IllegalArgumentException](
      StreamingOps.streamingGraphServe(stream,
        artifacts.drop("beam", "hops"), beam, hops, k))
    assert(en.getMessage.contains("beam/hops"))
    sn.unpersist(); g.unpersist(); artifacts.unpersist()
    spark.catalog.clearCache()
  }

  test("streamingJsonQuarantine: corrupt lines quarantine with raw bytes preserved, good lines parse whole (x176 on the stream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq((0L, "en", 10L), (1L, "de", 20L), (7L, "fr", 30L),
                   (14L, "es", 40L), (3L, "zh", 50L))
    // the x176 corruption rule: every doc_id % 7 == 0 line truncated
    val lines = docs.map { case (id, lang, n) =>
      val whole = s"""{"doc_id":$id,"lang":"$lang","n_chars":$n}"""
      if (id % 7 == 0) whole.take(10) else whole
    }
    val mem = MemoryStream[String]
    val sq = StreamingOps.streamingJsonQuarantine(
        mem.toDF(), "doc_id LONG, lang STRING, n_chars LONG")
      .writeStream.format("memory").queryName("jquar")
      .outputMode("append").start()
    mem.addData(lines.take(2): _*)
    sq.processAllAvailable()
    mem.addData(lines.drop(2): _*)
    sq.processAllAvailable()
    // a NULL line (Kafka tombstone cast to string) must QUARANTINE —
    // from_json returns a null struct for it, which would otherwise
    // land in the good population as an all-null row
    mem.addData(null.asInstanceOf[String])
    sq.processAllAvailable()
    val out = spark.table("jquar").collect()
    sq.stop()
    val nullLine = out.filter(r => !r.isNullAt(3) && r.getString(3) == "")
    assert(nullLine.length == 1 && nullLine.head.isNullAt(0))
    val quarantined = out.filter(r => !r.isNullAt(3) && r.getString(3) != "")
    val good = out.filter(_.isNullAt(3))
    // doc_ids 0, 7, 14 truncate; the raw bytes survive for re-driving
    assert(quarantined.length == 3)
    assert(quarantined.map(_.getString(3)).toSet ==
      Set("{\"doc_id\":", "{\"doc_id\":", "{\"doc_id\":"))
    assert(quarantined.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(good.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet == Set((1L, "de", 20L), (3L, "zh", 50L)))
  }

  test("partitionedSinkBatch: stream-ingested partitioned layout equals " +
       "batch writePartitioned; a replayed batch is idempotent; the read " +
       "still prunes partitions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_psink")
      .toString
    val rows1 = Seq(("R", 1L), ("A", 2L))
    val rows2 = Seq(("R", 3L), ("N", 4L))
    val fn = StreamingOps.partitionedSinkBatch(s"$dir/out", Seq("flag"),
      "orc")
    val mem = MemoryStream[(String, Long)]
    val sq = mem.toDS().toDF("flag", "qty").writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    mem.addData(rows1: _*)
    sq.processAllAvailable()
    mem.addData(rows2: _*)
    sq.processAllAvailable()
    sq.stop()
    // failure-recovery replay of the LAST batch (the at-least-once
    // window): the dynamic overwrite must replace, not duplicate
    fn(rows2.toDF("flag", "qty"), 1L)
    val streamed = spark.read.orc(s"$dir/out")
    assert(streamed.columns.contains("_batch_id"))
    val got = streamed.select(col("flag"), col("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // the batch twin over the same rows
    graft.io.TableIo.writePartitioned(
      (rows1 ++ rows2).toDF("flag", "qty"), s"$dir/batch", Seq("flag"),
      "orc")
    val want = spark.read.orc(s"$dir/batch")
      .select(col("flag"), col("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want, s"stream $got != batch $want")
    assert(streamed.count() == 4, "replay must not duplicate rows")
    // the business partition column is still the pruning surface
    val plan = streamed.filter(col("flag") === "R")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("flag"),
      "partition pruning lost on the stream-ingested layout:\n" +
        plan.take(2000))
  }

  test("streamingJsonQuarantine rejects a schema that already declares " +
       "_corrupt_record (the column this operator appends)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val e = intercept[IllegalArgumentException](
      StreamingOps.streamingJsonQuarantine(
        mem.toDF(), "doc_id LONG, _corrupt_record STRING"))
    assert(e.getMessage.contains("_corrupt_record"))
  }

  test("streamingBpeSegment: frozen-tokenizer segmentation on the stream equals batch x168 over a doc split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rounds = 4
    val corpus = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the rat and the cat chat"),
      (2L, "that hat is the cat hat")).toDF("doc_id", "text")
    val batchDocs = Seq(
      (10L, "the cat chat on that mat"),
      (11L, "a rat sat"),
      (12L, "unseen wordz here")).toDF("doc_id", "text")
    def wordsOf(d: org.apache.spark.sql.DataFrame) = d
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
    val (merges, _) = graft.operators.Bpe.train(wordsOf(corpus), rounds)
    val mergesP = merges.localCheckpoint()
    // batch arm: the x168 dataflow on the fixture
    val segB = graft.operators.Bpe
      .segmentWords(wordsOf(batchDocs), mergesP, rounds)
      .select(col("word"), array_join(col("toks"), " ").as("seg"),
              size(col("toks")).cast("long").as("nt"))
    val expected = batchDocs
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.words(col("text"))))
      .filter(col("col") =!= "")
      .select(col("doc_id"), col("pos"), col("col").as("word"))
      .join(segB, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("nt")).as("n_tokens"),
           md5(concat_ws(" ",
             expr("transform(array_sort(collect_list(struct(pos, seg)))," +
                  " x -> x.seg)")).cast("binary")).as("seg_md5"))
      .collect().map(_.toSeq).toSet

    val artifact = graft.operators.Bpe.mergesArtifact(mergesP)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingBpeSegment(
        mem.toDF().toDF("doc_id", "text"), artifact, rounds)
      .writeStream.format("memory").queryName("bpeseg")
      .outputMode("append").start()
    mem.addData((10L, "the cat chat on that mat"))
    q.processAllAvailable()
    mem.addData((11L, "a rat sat"), (12L, "unseen wordz here"))
    q.processAllAvailable()
    val streamed = spark.table("bpeseg").collect().map(_.toSeq).toSet
    q.stop()
    assert(streamed == expected,
      s"only-stream: ${(streamed -- expected).take(3)}\n" +
        s"only-batch: ${(expected -- streamed).take(3)}")
    spark.catalog.clearCache()
  }
}
