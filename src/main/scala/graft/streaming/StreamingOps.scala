package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is batch-only (SURVEY.md
  * §2.1 Streaming: absent — scheduling is GitHub Actions), so these are
  * engine EXTENSIONS: the streaming shapes a landing-folder ingest of the
  * same payroll/event data would need — windowed aggregation with
  * watermarked late-data handling, streaming dedup, and stateful
  * sessionization. All operate on the `events` schema
  * (event_id, ts, user_id, event_type, value, props).
  */
object StreamingOps {

  /** Tumbling-window event counts with a watermark: late rows beyond
    * `lateness` are dropped instead of growing state forever — the
    * property that keeps state bounded on an unbounded stream. */
  def windowedCounts(events: DataFrame, window_ : String = "10 minutes",
                     lateness: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming twin of batch U2/U3 (state = seen keys, GC'd by
    * watermark). */
  def streamingDedup(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: each streaming row picks up its
    * lookup attributes from a static dimension (re-read per micro-batch,
    * so slowly-changing dims refresh without restarting the query). The
    * static side is a plain DataFrame — broadcast by Catalyst when small.
    * This is the streaming twin of batch J1/J8. */
  def enrich(stream: DataFrame, dim: DataFrame,
             keys: Seq[String]): DataFrame =
    stream.join(dim, keys, "left")

  /** Streaming incremental near-dup detection against a PERSISTED corpus
    * band index (the streaming twin of DedupOperators.incrementalCandidates):
    * each arriving document is shingled/signed map-side (native
    * MinHashSigMd5), exploded to its band keys, and stream-static-joined
    * against the index; docs with any band hit are flagged as candidate
    * duplicates of the matched corpus doc. Downstream can verify with
    * ngramJaccard or route to quarantine. State-free: the static index
    * carries all history, so nothing accumulates in the stream. A pair is
    * emitted once per matching band (a streaming distinct would need
    * unbounded state); downstream verification is idempotent. */
  def streamingNearDupCandidates(docs: DataFrame, corpusIndex: DataFrame,
                                 idCol: String, textCol: String,
                                 shingleN: Int = 3, k: Int = 8,
                                 bands: Int = 4): DataFrame = {
    val rows = k / bands
    val banded = docs
      .select(col(idCol).as("new_id"),
        graft.functions.TextFunctions.words(col(textCol)).as("_w"))
      // degenerate docs (< shingleN words) carry no shingle evidence and
      // are excluded from banding, mirroring the batch signatureIndex
      .filter(size(col("_w")) >= shingleN)
      .select(col("new_id"),
        graft.functions.expr.MinHashSigMd5(col("_w"), shingleN, k).as("_sig"))
      .select(col("new_id"), posexplode(
        graft.functions.TextFunctions.lshBands(col("_sig"), bands, rows)))
      .toDF("new_id", "band_idx", "band_key")
    banded.join(corpusIndex.select(col("band_idx"), col("band_key"),
                                   col("id").as("corpus_id")),
                Seq("band_idx", "band_key"))
      .filter(col("corpus_id") =!= col("new_id"))
      .select(col("new_id"), col("corpus_id"))
  }

  /** Streaming twin of batch x119
    * ([[graft.operators.DedupOperators.windowedMinhashCandidates]]):
    * near-dup candidate pairs within a time horizon over ONE stream —
    * the banded self-join as a watermarked STREAM-STREAM join keyed on
    * (band_idx, band_key) with |Δts| ≤ `withinSec` bounding event time
    * in BOTH directions, so per-band join state is GC'd by the
    * watermark. The horizon that makes batch x119's comparison state
    * bounded is exactly what makes this join runnable forever; without
    * it a streaming self near-dup would hold all history. Pairs are
    * emitted once per matching band (a streaming distinct would need
    * unbounded state — the [[streamingNearDupCandidates]] contract);
    * downstream verification is idempotent. Reconciliation: the
    * DISTINCT emitted pairs after any prefix equal the batch operator's
    * candidates over the same rows (StreamingSpec). */
  def streamingWindowedNearDup(docs: DataFrame, idCol: String,
                               textCol: String, tsCol: String,
                               withinSec: Long,
                               lateness: String = "10 minutes",
                               shingleN: Int = 3, k: Int = 8,
                               bands: Int = 4): DataFrame = {
    val rows = k / bands
    def banded(side: String) = docs
      .select(col(idCol).as(s"${side}_id"), col(tsCol).as(s"${side}_ts"),
        graft.functions.TextFunctions.words(col(textCol)).as("_w"))
      // same degenerate-doc exclusion as the batch twin, so the
      // reconciliation property stays exact on corpora with short docs
      .filter(size(col("_w")) >= shingleN)
      .select(col(s"${side}_id"), col(s"${side}_ts"),
        graft.functions.expr.MinHashSigMd5(col("_w"), shingleN, k)
          .as("_sig"))
      .select(col(s"${side}_id"), col(s"${side}_ts"), posexplode(
        graft.functions.TextFunctions.lshBands(col("_sig"), bands, rows)))
      .toDF(s"${side}_id", s"${side}_ts", s"${side}_bi", s"${side}_bk")
      .withWatermark(s"${side}_ts", lateness)
    banded("a").join(banded("b"), expr(
      s"""a_bi = b_bi AND a_bk = b_bk AND a_id < b_id AND
          b_ts >= a_ts - interval $withinSec seconds AND
          b_ts <= a_ts + interval $withinSec seconds"""))
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"))
  }

  /** Watermarked STREAM-STREAM interval join: right rows within
    * `[leftTs, leftTs + withinSec]` of a left row with the same `key`.
    * Both sides carry watermarks and the join condition bounds event time
    * in both directions, so Spark can GC join state — the property that
    * keeps a stream-stream join runnable forever. Output columns keep
    * their `l`/`r` qualifiers for disambiguation. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         leftTs: String, rightTs: String, withinSec: Long,
                         lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r = right.withWatermark(rightTs, lateness).alias("r")
    l.join(r, expr(
      s"""l.$key = r.$key AND r.$rightTs >= l.$leftTs AND
          r.$rightTs <= l.$leftTs + interval $withinSec seconds"""))
  }

  final case class Session(userId: Long, nEvents: Long, totalValue: Double,
                           startTs: java.sql.Timestamp, endTs: java.sql.Timestamp)
  final case class SessionState(n: Long, total: Double,
                                start: Long, last: Long)

  final case class FunnelAdvance(userId: Long, stage: Int, stageName: String,
                                 tsMs: Long)
  final case class FunnelState(stage: Int, lastTs: Long)

  /** Streaming conversion funnel — the streaming twin of batch
    * [[graft.RelationalQueries.eventFunnel]] (q85): per-user state machine
    * that emits one `FunnelAdvance` row each time a user reaches the next
    * stage, where stage i+1 must land strictly after and within `windowMs`
    * of the stage-i event. State is one (stage, lastTs) pair per active
    * user and is GC'd by an event-time timeout once the conversion window
    * has lapsed (no further advance is possible from it). Caveat vs batch:
    * after state GC a user's LATER first-stage event re-opens the funnel,
    * whereas the batch query anchors on the all-time first occurrence —
    * identical results within any horizon shorter than the GC window. */
  def funnelAdvances(events: Dataset[(Long, String, java.sql.Timestamp)],
                     stages: Seq[String], windowMs: Long,
                     lateness: String = "1 second"): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    events.toDF("user_id", "event_type", "ts")
      .withWatermark("ts", lateness)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(FunnelState(0, 0L))
            val out = Vector.newBuilder[FunnelAdvance]
            rows.toSeq.sortBy(r => (r._3.getTime, r._2)).foreach {
              case (_, et, ts) =>
                val t = ts.getTime
                if (st.stage < stages.length && et == stages(st.stage) &&
                    (st.stage == 0 ||
                     (t > st.lastTs && t <= st.lastTs + windowMs))) {
                  st = FunnelState(st.stage + 1, t)
                  out += FunnelAdvance(userId, st.stage, et, t)
                }
            }
            if (st.stage > 0) {
              state.update(st)
              // a timeout in the watermark's past would throw; clamp forward
              state.setTimeoutTimestamp(math.max(st.lastTs + windowMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Per-user sessionization via flatMapGroupsWithState: a session closes
    * when the WATERMARK passes `gapMs` of inactivity (event-time timeout),
    * emitting one summary row. Custom state the built-in windows can't
    * express; state size is O(active users) and GC'd by the watermark. */
  def sessionize(events: Dataset[(Long, java.sql.Timestamp, Double)],
                 gapMs: Long,
                 lateness: String = "1 second"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.toDF("user_id", "ts", "value")
      .withWatermark("ts", lateness)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.n, s.total,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last)))
          } else {
            val batch = rows.toSeq
            val ts = batch.map(_._2.getTime)
            val prev = state.getOption.getOrElse(
              SessionState(0L, 0.0, ts.min, ts.min))
            val next = SessionState(
              prev.n + batch.size, prev.total + batch.map(_._3).sum,
              math.min(prev.start, ts.min), math.max(prev.last, ts.max))
            state.update(next)
            state.setTimeoutTimestamp(next.last + gapMs)
            Iterator.empty
          }
      }
  }

  final case class HeavyHitter(shard: Int, key: String,
                               countMin: Long, countMax: Long)

  /** Streaming heavy hitters: the SpaceSaving summary (the batch x58
    * UDAF, [[graft.functions.SpaceSavingAggregator]]) maintained as
    * flatMapGroupsWithState state — per shard, a bounded map of at most
    * `capacity` (key → count, overestimate) entries, updated per
    * micro-batch and emitting the current top-`k` estimates in Update
    * mode. Sharding by key hash bounds BOTH state size (shards ×
    * capacity entries total) and per-task work; any key's true count is
    * within [countMax − err, countMax] and a global top-k is the union
    * of the per-shard reports (SpaceSaving is merge-closed, so shard
    * reports can themselves be re-merged downstream).
    */
  def streamingHeavyHitters(keys: Dataset[String], capacity: Int, k: Int,
                            shards: Int = 16): Dataset[HeavyHitter] = {
    import keys.sparkSession.implicits._
    require(capacity > 0 && k > 0 && shards > 0)
    keys
      .groupByKey(key => ((key.hashCode % shards) + shards) % shards)
      .flatMapGroupsWithState[Map[String, (Long, Long)], HeavyHitter](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (shard, rows, state: GroupState[Map[String, (Long, Long)]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
          rows.foreach { key =>
            m.get(key) match {
              case Some((c, e)) => m = m.updated(key, (c + 1, e))
              case None if m.size < capacity => m = m.updated(key, (1L, 0L))
              case None =>
                // evict the minimum (ties: lexicographic — deterministic);
                // the newcomer inherits its count as the overestimate
                val (mk, (mc, _)) = m.minBy { case (kk, (c, _)) => (c, kk) }
                m = (m - mk).updated(key, (mc + 1, mc))
            }
          }
          state.update(m)
          m.toSeq
            .sortBy { case (kk, (c, _)) => (-c, kk) }
            .take(k)
            .iterator
            .map { case (kk, (c, e)) => HeavyHitter(shard, kk, c - e, c) }
      }
  }

  final case class SampleEntry(stratum: String, rank: Int, docId: Long,
                               draw: String)

  /** Streaming min-wise sample — the unbounded-stream twin of x65's
    * batch `BottomKAggregator`: per stratum, keep the k smallest
    * (draw, id) pairs seen so far (O(k) state per stratum, no timeout —
    * a sample is meant to cover the whole stream) and re-emit the
    * current sample each micro-batch in Update mode. Because the
    * selection is the SAME merge-closed reduction as the batch
    * aggregator, the streaming sample after any prefix of the stream
    * equals the batch query over that prefix — reconciliation-tested in
    * StreamingSpec. Rows arrive as (stratum, docId, draw). */
  def streamingBottomKSample(docs: Dataset[(String, Long, String)],
                             k: Int): Dataset[SampleEntry] = {
    import docs.sparkSession.implicits._
    require(k > 0)
    val agg = new graft.functions.BottomKAggregator(k)
    docs
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(String, Long)], SampleEntry](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (stratum, rows, state: GroupState[Seq[(String, Long)]]) =>
          var buf = state.getOption.getOrElse(agg.zero)
          rows.foreach { case (_, id, draw) => buf = agg.reduce(buf, (draw, id)) }
          state.update(buf)
          buf.iterator.zipWithIndex.map { case ((draw, id), i) =>
            SampleEntry(stratum, i + 1, id, draw)
          }
      }
  }

  final case class CdcEvent(doc_id: Long, status: String, fp: String)

  /** Streaming CDC classification — the streaming twin of the batch
    * snapshot diff ([[graft.CorpusQueries.snapshotDiff]] / x71): per
    * doc_id, keep only the last-seen content fingerprint and classify
    * each arriving (doc_id, fp, deleted) record against it — `added`
    * (no state), `changed` (fingerprint differs), `unchanged` (same),
    * `removed` (delete marker on a live key; deletes of unknown keys are
    * dropped). What a batch diff computes per release falls out
    * continuously at ingest, with O(one fingerprint) state per LIVE key
    * — `state.remove()` on delete keeps the store bounded by the live
    * set, not the history. Records are applied in arrival order within
    * a batch; feed per-key ordered input (the CDC-log contract). */
  def streamingCdcClassify(
      recs: Dataset[(Long, String, Boolean)]): Dataset[CdcEvent] = {
    import recs.sparkSession.implicits._
    recs.groupByKey(_._1)
      .flatMapGroupsWithState[String, CdcEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (id, rows, state: GroupState[String]) =>
          var cur = state.getOption
          val out = Vector.newBuilder[CdcEvent]
          rows.foreach { case (_, fp, deleted) =>
            if (deleted) {
              if (cur.nonEmpty) { out += CdcEvent(id, "removed", fp) }
              cur = None
            } else cur match {
              case None =>
                out += CdcEvent(id, "added", fp); cur = Some(fp)
              case Some(prev) =>
                out += CdcEvent(id,
                  if (prev == fp) "unchanged" else "changed", fp)
                cur = Some(fp)
            }
          }
          cur match {
            case Some(f) => state.update(f)
            case None    => state.remove()
          }
          out.result().iterator
      }
  }

  final case class IvmView(key: String, n_items: Long, rev_cents: Long)
  final case class IvmState(n: Long, s: Long)

  /** Streaming twin of the batch retracting IVM
    * ([[graft.EtlQueries.ivmRetract]]): maintain a grouped
    * (count, sum) view over a SIGNED CDC stream — (key, cents, m) with
    * m = +1 insert / −1 delete. Spark's native watermarked aggregation
    * cannot retract (sum(m)/sum(m·c) would work for totals but a group
    * can never leave the view, and append mode only emits closed
    * windows); flatMapGroupsWithState holds the decomposable partials
    * (n, s) per key — O(1) state per LIVE group — and emits the group's
    * post-batch view row every micro-batch it is touched. A group whose
    * count returns to 0 emits a tombstone (n_items = 0) and FREES its
    * state, so the state store is bounded by live groups, not by every
    * key ever seen; a later re-insert starts fresh. A batch driving the
    * count negative (the feed deleted rows it never inserted) collapses
    * to the same tombstone — the contract violation is visible
    * downstream as a delete of the whole group, never published as a
    * negative count. Dimension attributes join upstream via [[enrich]]
    * (stream-static), mirroring the batch dataflow's broadcast side. */
  def streamingIvmRetract(
      recs: Dataset[(String, Long, Long)]): Dataset[IvmView] = {
    import recs.sparkSession.implicits._
    recs.groupByKey(_._1)
      .flatMapGroupsWithState[IvmState, IvmView](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[IvmState]) =>
          var st = state.getOption.getOrElse(IvmState(0L, 0L))
          rows.foreach { case (_, c, m) =>
            st = IvmState(st.n + m, st.s + m * c) }
          if (st.n <= 0L) {
            state.remove()
            Iterator.single(IvmView(key, 0L, 0L))
          } else {
            state.update(st)
            Iterator.single(IvmView(key, st.n, st.s))
          }
      }
  }

  final case class Anomaly(key: Long, value: Double, n: Long,
                           mean: Double, std: Double)
  final case class WelfordState(n: Long, mean: Double, m2: Double)

  final case class CusumAlarm(userId: Long, day: Long, c: Long,
                              cusum: Long, alarm: Boolean)
  final case class CusumState(p: Long, minP: Long)

  /** Streaming CUSUM drift detection — the streaming twin of batch x112
    * and the complement of [[streamingAnomalies]]: Welford z-scores
    * catch POINT outliers; CUSUM accumulates small persistent SHIFTS
    * (s_i = max(0, s_{i-1} + (c_i − k)), alarm at s ≥ h) that never
    * individually clear a sigma bound. State is TWO longs per key — the
    * running prefix P and min(0, min prefix) — i.e. the batch closed
    * form maintained incrementally, so after any stream prefix the
    * emitted rows equal batch x112 over the same rows EXACTLY
    * (reconciliation-tested, integer arithmetic throughout). Input
    * `(user_id, day, c)` daily counts, per-key monotone by day across
    * batches (the CDC-log contract; within a batch rows sort by day). */
  def streamingCusum(daily: Dataset[(Long, Long, Long)],
                     k: Long = 2L, h: Long = 5L): Dataset[CusumAlarm] = {
    import daily.sparkSession.implicits._
    daily.groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val out = Vector.newBuilder[CusumAlarm]
          rows.toSeq.sortBy(_._2).foreach { case (_, day, c) =>
            val p = st.p + (c - k)
            val minP = math.min(st.minP, p)
            val cusum = p - minP
            out += CusumAlarm(key, day, c, cusum, cusum >= h)
            st = CusumState(p, minP)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming z-score anomaly detection: per key, a running Welford
    * (n, mean, M2) state — O(1) memory per key, numerically stable —
    * flags values more than `kSigma` standard deviations from the mean
    * seen SO FAR (the state updates after the test, so a spike is judged
    * against history, not against itself). The monitoring primitive for
    * pipeline health at ingest: no windows to size, no history replay.
    */
  def streamingAnomalies(points: Dataset[(Long, Double)],
                         kSigma: Double = 3.0,
                         minN: Long = 5): Dataset[Anomaly] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_._1)
      .flatMapGroupsWithState[WelfordState, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[WelfordState]) =>
          var st = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
          val out = Vector.newBuilder[Anomaly]
          rows.foreach { case (_, v) =>
            if (st.n >= minN) {
              val std = math.sqrt(st.m2 / (st.n - 1))
              if (std > 0 && math.abs(v - st.mean) > kSigma * std)
                out += Anomaly(key, v, st.n, st.mean, std)
            }
            val n1 = st.n + 1
            val d = v - st.mean
            val mean1 = st.mean + d / n1
            st = WelfordState(n1, mean1, st.m2 + d * (v - mean1))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming Count-Min sketch maintenance — the streaming twin of
    * x81's relational CMS. Each micro-batch's token occurrences update
    * d·w counter cells through the SAME md5 bucketing as the batch
    * sketch, and the engine's own streaming aggregation holds the
    * sketch as state: O(d·w) rows (2048 at the defaults) REGARDLESS of
    * stream volume, which is why no watermark is needed — the state
    * never grows with the data. That bound is what makes CMS the right
    * frequency store for an unbounded token stream where exact
    * per-token counts would accumulate vocabulary-sized state.
    * Update-mode output re-emits changed cells per batch; the current
    * sketch table is the latest value per (r, b), and because both
    * twins are pure counts over the same buckets, the streamed sketch
    * after any stream prefix EQUALS the batch x81 sketch of that
    * prefix (reconciliation-tested). */
  def streamingCmsSketch(toks: DataFrame, depth: Int = 4,
                         width: Int = 512): DataFrame = {
    val probes = explode(array((0 until depth).map(r =>
      struct(lit(r.toLong).as("r"),
        (conv(substring(md5(concat_ws(":", lit(r), col("tok"))), 1, 8),
          16, 10).cast("long") % width).as("b"))): _*))
    toks.select(probes.as("p"))
      .groupBy(col("p.r").as("r"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming bucket-digest maintenance — the streaming twin of batch
    * x111's reconciliation digests. Input: `(doc_id, text)` rows (an
    * insert-only feed). State is 64 rows of (n, digest) — the digest is
    * the SUM of 48-bit md5 row fingerprints per `doc_id % 64` bucket,
    * and sums commute, so the streaming aggregation state after any
    * prefix equals the batch digest of that prefix exactly
    * (reconciliation-tested). This is the anti-entropy publisher: a
    * region streams ingest while continuously maintaining the 64-row
    * digest table another region compares against (x111's batch
    * compare), no re-scan of history ever. State bound is structural
    * (64 rows forever) — no watermark. The digest is the wrapped
    * mod-2⁶⁴ fingerprint sum ([[graft.functions.DigestFunctions]]), so
    * it stays well-defined (and engine-portable) at any bucket
    * cardinality — a plain long sum would hit ANSI overflow at ~2¹⁵
    * rows per bucket. */
  def streamingBucketDigest(docs: DataFrame): DataFrame =
    docs.select(pmod(col("doc_id"), lit(64L)).as("bucket"),
        conv(substring(md5(concat_ws(":", col("doc_id"), col("text"))
          .cast("binary")), 1, 12), 16, 10).cast("long").as("f"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           graft.functions.DigestFunctions.digestSum(col("f")).as("digest"))

  /** Streaming KMV distinct-cardinality per stratum — the streaming twin
    * of batch x94 exactly as [[streamingCmsSketch]] twins x81. Input:
    * `(stratum, key)` rows. State per stratum is the k smallest distinct
    * 48-bit md5 hashes of the keys seen so far, held by the merge-closed
    * [[graft.functions.BottomKDistinctLongAggregator]] — O(k) longs per
    * stratum FOREVER, duplicate-absorbing, so no watermark is needed:
    * like the CMS, the state bound is structural, not temporal. The
    * estimate column applies x94's integer-exact estimator ((k−1)·2⁴⁸
    * div h_(k) once saturated; the sketch size, which IS the exact
    * distinct count, below saturation), so after any stream prefix the
    * state and estimate equal the batch sketch of that prefix
    * (reconciliation-tested), and downstream set-operation estimates
    * (union/intersection across strata) compose from the emitted `kmv`
    * lists exactly as in x94. */
  final case class ScdVersion(key: Long, value: String,
                              valid_from: java.sql.Timestamp,
                              valid_to: java.sql.Timestamp,
                              stragglers_seen: Long)
  final case class ScdState(lastTs: Long, lastVal: String, dropped: Long)

  /** Streaming SCD2 maintenance: a per-key CHANGE STREAM
    * `(key, ts, value)` maintained as validity intervals — the streaming
    * twin of [[graft.ops.HistoryOps.validityIntervals]] (q42/q108). Each
    * arriving change CLOSES the key's previous version (emitting the
    * finished `[valid_from, valid_to)` row — append-mode, immutable once
    * emitted, exactly what a warehouse history table ingests) and opens
    * the next; the open head stays in state, one (ts, value) pair per
    * key FOREVER — the bound is the live-key count, not stream volume,
    * so no watermark is needed. Within a micro-batch events sort by ts;
    * ACROSS batches the feed must be per-key monotone (the CDC-log
    * contract — per-key order is what log compaction/partitioned topics
    * guarantee); an out-of-order straggler older than the open head is
    * dropped rather than silently rewriting closed history — and
    * COUNTED: the per-key state carries a cumulative drop counter,
    * surfaced as `stragglers_seen` on every emitted version, so a
    * batch-vs-stream reconciliation mismatch is attributable to feed
    * disorder instead of silent. Equal-timestamp semantics are pinned
    * deliberately: ts == open head CLOSES the head as a zero-length
    * [t, t) version — the same row the batch lead()-interval builder
    * produces for duplicate timestamps — rather than being ignored.
    * After any prefix, the emitted closed rows equal the batch
    * lead()-interval builder's non-null-valid_to rows over the same
    * events (reconciliation-tested). */
  def streamingScdIntervals(changes: Dataset[(Long, java.sql.Timestamp,
                                              String)])
      : Dataset[ScdVersion] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_._1)
      .flatMapGroupsWithState[ScdState, ScdVersion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[ScdState]) =>
          var cur = state.getOption
          val out = Vector.newBuilder[ScdVersion]
          rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, v) =>
            cur match {
              case Some(s) if ts.getTime >= s.lastTs =>
                out += ScdVersion(key, s.lastVal,
                  new java.sql.Timestamp(s.lastTs), ts, s.dropped)
                cur = Some(ScdState(ts.getTime, v, s.dropped))
              case Some(s) => // straggler older than the open head:
                // never rewrite closed history, but never drop silently
                cur = Some(s.copy(dropped = s.dropped + 1))
              case None => cur = Some(ScdState(ts.getTime, v, 0L))
            }
          }
          cur.foreach(c => state.update(c))
          out.result().iterator
      }
  }

  /** Streaming data-quality counters — x101's row-level contract
    * ([[graft.ops.QualityOps]] NotNull / InSet / Bounds / Satisfies)
    * evaluated over a stream: every check is a conditional sum in ONE
    * streaming aggregation, so the state is a single row of counters
    * regardless of stream volume or how many checks are declared (the
    * same one-scan economics as the batch report — no watermark needed,
    * the bound is structural). Output schema matches the batch report
    * (check, observed, violations, pass) per micro-batch state; after
    * any stream prefix the counters equal the batch report of that
    * prefix (reconciliation-tested). Set-level checks (Unique,
    * RefIntegrity) need keyed state and stay batch-side by design. */
  def streamingQualityCounts(df: DataFrame,
                             checks: Seq[graft.ops.QualityOps.Check])
      : DataFrame = {
    require(checks.nonEmpty, "streamingQualityCounts needs >= 1 check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      sum(when(graft.ops.QualityOps.rowViolation(c), 1L).otherwise(0L))
        .as(s"_v$i") }
    val one = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col("_n").as("observed"),
             col(s"_v$i").as("violations"))
    }
    df.agg(count(lit(1)).as("_n"), aggs: _*)
      .select(explode(array(one: _*)).as("r"))
      .select(col("r.check"), col("r.observed"), col("r.violations"),
              (col("r.violations") === 0L).as("pass"))
  }

  /** Streaming entity resolution against a static master list — x85's
    * block/score/survive dataflow as a stream: arriving dirty records
    * `(d_id, d_name, bk)` join the master `(cid, c_name, bk)` on the
    * blocking key (a stream-static equi-join — the master is re-read
    * per micro-batch, never state), every in-block candidate is
    * JW-scored by the native expression, and the per-record best match
    * is the same partial-aggregable min(struct(−jw, cid)) — held as
    * streaming aggregation state so a record whose better match arrives
    * in a later batch (or whose candidates span batches) converges to
    * the batch answer. State is O(distinct streamed records) — one
    * struct per d_id, no block fan-out retained — and update-mode
    * output re-emits a record's row whenever its best match improves.
    * Reconciliation-tested: the final state equals batch x85 restricted
    * to the streamed ids. */
  def streamingEntityMatch(dirty: DataFrame, master: DataFrame): DataFrame =
    dirty.join(master, Seq("bk"))
      .withColumn("jw", graft.functions.expr.JaroWinkler(
        col("d_name"), col("c_name")))
      .groupBy(col("d_id"))
      .agg(min(struct((-col("jw")).as("njw"),
                      col("cid").as("cid"),
                      col("jw").as("jw"))).as("m"))
      .select(col("d_id"), col("m.cid").as("matched"), col("m.jw").as("jw"))

  /** Streaming twin of batch x128 (incremental semantic dedup): each
    * arriving embedding is labeled with its FROZEN-centroid cell by
    * [[graft.operators.KMeansDet.labeled]] — a stateless codegen'd
    * projection, legal on a stream because for the k ≤ 16 literal form it
    * is just a map — then stream-static joined to the persisted cluster
    * index on the cell key and screened at cos ≥ `tau`. Emits one row per
    * (new vector, corpus match) — per-match like
    * [[streamingNearDupCandidates]], since a per-new-id min/max
    * aggregation would need stateful output; downstream keep/drop is
    * idempotent on the evidence. State: NONE (stream-static inner joins
    * are stateless; the static side re-reads per micro-batch, so a
    * refreshed index picks up without restarting). Reconciliation: the
    * distinct emitted rows after any prefix equal batch x128's pair frame
    * over the same rows (StreamingSpec). */
  def streamingSemanticScreen(stream: DataFrame, corpusIndex: DataFrame,
                              m: graft.operators.KMeansDet.Model,
                              tau: Double, idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    // beyond the literal-form threshold, labeling needs the broadcast-join
    // + re-aggregation form — a stateful shape that is not legal on a
    // stream; fail loud here instead of deep inside the stream planner
    require(m.k <= graft.operators.KMeansDet.LiteralFormMaxK,
      s"streaming screen needs the stateless literal argmin (k <= " +
        s"${graft.operators.KMeansDet.LiteralFormMaxK}), got k=${m.k}")
    val a = graft.operators.KMeansDet.labeled(stream, m, idCol, vecCol)
      .select(col(idCol).as("new_id"), col("cell"),
              col("v").as("vb"), col("nrm").as("nb"))
    val c = corpusIndex.select(col("cell"), col(idCol).as("corpus_id"),
                               col("v").as("va"), col("nrm").as("na"))
    a.join(c, Seq("cell"))
      .withColumn("cos",
        when(col("na") === 0.0 || col("nb") === 0.0,
          lit(null).cast("double"))
          .otherwise(graft.functions.VectorFunctions.dot(col("va"), col("vb"))
            / (col("na") * col("nb"))))
      .filter(col("cos") >= tau)
      .select(col("new_id"), col("cell"), col("corpus_id"),
              round(col("cos"), 4).as("cos"))
  }

  /** Streaming twin of batch x132's quantile sketch: per-bucket counts
    * maintained as a streaming aggregation — state is the ~9·900-bucket
    * count table (bounded whatever the stream does), and merging is count
    * addition, so the streamed sketch after any prefix EQUALS the batch
    * sketch over the same rows (StreamingSpec). Quantile READS happen
    * batch-side on the materialized counts ([[graft.ops.QuantileSketchOps
    * .upperBound]] + a rank scan) — the sketch is the streaming state,
    * the estimate is a query over it. */
  /** x141's streaming twin: tombstone enforcement at INGEST. Once a
    * right-to-be-forgotten cascade has produced a purged-key table, new
    * arrivals that reference a purged key must never re-enter the corpus —
    * the erasure guarantee is only as good as the front door. Arriving
    * rows are screened with a stream-static LEFT ANTI join against the
    * tombstone table: state NONE (the static side re-reads per
    * micro-batch, so a grown tombstone set is picked up without a
    * restart), output = the admissible rows plus a `screened_at_ingest`
    * audit column the sink can count. Reconciliation: rows emitted across
    * any batch split equal the batch anti join over the same rows
    * (StreamingSpec). */
  def streamingTombstoneScreen(stream: DataFrame, tombstones: DataFrame,
                               keyCol: String,
                               tombKeyCol: String = "k"): DataFrame =
    stream.join(tombstones.select(col(tombKeyCol).as("__tomb_k")),
                col(keyCol) === col("__tomb_k"), "left_anti")
      .withColumn("screened_at_ingest", lit(true))

  /** x143's streaming twin: DSIR importance scoring at INGEST against a
    * FROZEN hashed-bigram model (bucket counts + corpus totals fitted on
    * yesterday's corpus — the x128/x16 economics: history is never
    * re-scanned, the model is O(B) and rides a broadcast). Arriving docs
    * explode to (doc, bucket) rows, stream-static join the model, and
    * emit per-instance (doc_id, h, lr) evidence — per-match like
    * [[streamingSemanticScreen]], since a per-doc sum would be a
    * stateful aggregation; the downstream selector sums lr per doc
    * batch-side over the materialized evidence. State: NONE; a refreshed
    * model is picked up per micro-batch. `nr`/`nt` are the frozen corpus
    * totals (certified-small scalars the model fit produces). */
  def streamingDsirScreen(stream: DataFrame, model: DataFrame,
                          nr: Long, nt: Long,
                          buckets: Int = 1024): DataFrame = {
    require(nr > 0 && nt > 0, s"frozen totals must be positive: nr=$nr nt=$nt")
    stream
      .select(col("doc_id"),
              explode(graft.functions.TextFunctions
                .wordNgrams(col("text"), 2)).as("b"))
      .withColumn("h",
        conv(substring(md5(col("b")), 1, 12), 16, 10).cast("long")
          % buckets)
      .join(broadcast(model.select(col("h"), col("cr"), col("ct"))),
            Seq("h"), "left_outer")
      .na.fill(0L, Seq("cr", "ct")) // unseen bucket = add-one smoothing only
      .select(col("doc_id"), col("h"),
        graft.functions.TextFunctions.bitlenLogRatio(
          col("ct"), col("cr"), lit(nr), lit(nt)).as("lr"))
  }

  /** x153's streaming twin: NB quality scoring at INGEST against a FROZEN
    * classifier (per-bucket class counts + class totals — certified-small
    * artifacts of the batch fit; the [[streamingDsirScreen]] economics:
    * the labeled corpus is never re-read, the model is O(B) and rides a
    * broadcast). Arriving docs explode to (doc, bucket) token instances,
    * stream-static join the model, and emit per-instance (doc_id, h, lr)
    * evidence in [[graft.functions.TextFunctions.logRatioX256]]'s
    * 1/256-bit units — per-match, because the per-doc sum + sign decision
    * is a stateful aggregation on a stream; admission happens batch-side
    * over the materialized evidence (sum(lr) + frozen prior > 0, exactly
    * x153's decision). Unseen buckets get the smoothed prior ratio via
    * the left join's (0, 0) fill, not a drop. State: NONE; a refreshed
    * model is picked up per micro-batch. */
  def streamingNbQualityScreen(stream: DataFrame, model: DataFrame,
                               np: Long, nn: Long,
                               buckets: Int = 1024): DataFrame = {
    require(np > 0 && nn > 0,
      s"frozen class totals must be positive: np=$np nn=$nn")
    stream
      .select(col("doc_id"),
              explode(graft.functions.TextFunctions.words(col("text")))
                .as("w"))
      .filter(col("w") =!= "")
      .withColumn("h",
        conv(substring(md5(col("w")), 1, 12), 16, 10).cast("long")
          % buckets)
      .join(broadcast(model.select(col("h"), col("cp"), col("cn"))),
            Seq("h"), "left_outer")
      .na.fill(0L, Seq("cp", "cn")) // unseen bucket = smoothing only
      .select(col("doc_id"), col("h"),
        graft.functions.TextFunctions.logRatioX256(
          col("cp"), col("cn"), lit(nn), lit(np)).as("lr"))
  }

  /** x155's streaming twin: VAD frame screening at INGEST. An arriving
    * audio payload explodes to its frame grid and emits per-frame
    * (doc_id, f, energy) SPEECH evidence — the stateless projection +
    * filter half of [[graft.operators.Multimodal.vadPlan]]; the
    * gaps-and-islands segment assembly is a per-doc window (stateful on
    * a stream), so segments are cut batch-side over the materialized
    * evidence, exactly like [[streamingDsirScreen]]'s per-instance
    * split. State: NONE. At scale this is the ingest screen that
    * decides which byte ranges even reach the codec. */
  def streamingVadScreen(stream: DataFrame, frameBytes: Int = 40,
                         threshold: Int = 128): DataFrame = {
    require(frameBytes >= 1 && threshold >= 0 && threshold <= 256,
      s"streamingVadScreen: bad args frameBytes=$frameBytes " +
        s"threshold=$threshold")
    val nf = greatest(lit(1L),
      ((length(col("text")) + (frameBytes - 1)) / frameBytes).cast("long"))
    stream
      .select(col("doc_id"), col("text").as("_t"),
              explode(sequence(lit(0L), nf - 1)).as("f"))
      .withColumn("energy", graft.operators.Multimodal
        .frameEnergyStub(col("_t"), col("f"), frameBytes))
      .filter(col("energy") >= threshold)
      .select(col("doc_id"), col("f"), col("energy"))
  }

  /** x159's streaming twin: curation-funnel ADMISSION at ingest against
    * the two FROZEN artifacts — the per-source tertile cutoff table and
    * the kept-set fingerprint index. An arriving doc is gated (the
    * stateless x136/quality projection), bucketed by the frozen cutoffs
    * (stream-static broadcast left join — an uncalibrated source admits
    * to head, [[graft.ops.QualityOps.applyTertiles]]'s contract),
    * fingerprinted, and LEFT ANTI screened against the index (the
    * tombstone-twin device). Batch-internal keep-first is a rank —
    * stateful on a stream — so within-batch duplicates are admitted
    * here and deduped batch-side, exactly the reconciliation
    * StreamingSpec asserts. State: NONE; refreshed artifacts are picked
    * up per micro-batch. */
  def streamingFunnelAdmission(stream: DataFrame, cuts: DataFrame,
                               index: DataFrame): DataFrame =
    graft.ops.QualityOps.applyTertiles(
        graft.CorpusQueries.gateStage(stream).filter(!col("_rep")),
        cuts, "q", "source")
      .filter(col("bucket") =!= "tail")
      .withColumn("_fp",
        graft.functions.TextFunctions.fingerprint(col("text")))
      .join(index.select(col("_fp")), Seq("_fp"), "left_anti")
      .select(col("doc_id"), col("source"), col("q"), col("bucket"))
      .withColumn("admitted_at_ingest", lit(true))

  /** x145's streaming twin: hard-negative CANDIDACY at ingest against the
    * frozen cluster index (the x128/x148 frozen-artifact economics — the
    * corpus is never re-clustered for an arriving vector). An arriving
    * (vector, label) is assigned its frozen cell by the stateless literal
    * argmin and paired with every DIFFERENT-label corpus cell-mate;
    * output is per-match (new_id, cell, neg_id, label, neg_label, cos)
    * evidence — per-match like [[streamingSemanticScreen]], because
    * x145's per-anchor top-2 cut is a rank (stateful on a stream); the
    * miner cuts rank batch-side over the materialized evidence. State:
    * NONE; a refreshed index is picked up per micro-batch. `corpusIndex`
    * = the persisted assignWithVec frame joined with labels — columns
    * (cell, vec_id, v, nrm, lab). */
  def streamingHardNegativeScreen(stream: DataFrame, corpusIndex: DataFrame,
                                  m: graft.operators.KMeansDet.Model,
                                  idCol: String = "vec_id",
                                  vecCol: String = "embedding",
                                  labCol: String = "label"): DataFrame = {
    require(m.k <= graft.operators.KMeansDet.LiteralFormMaxK,
      s"streaming screen needs the stateless literal argmin (k <= " +
        s"${graft.operators.KMeansDet.LiteralFormMaxK}), got k=${m.k}")
    // the label rides the opaque id through the argmin projection — a
    // post-assign rejoin would be a stream-stream join (stateful)
    val packed = stream.select(
      struct(col(idCol).as("id"), col(labCol).cast("long").as("lab"))
        .as("_idl"),
      col(vecCol))
    val a = graft.operators.KMeansDet.labeled(packed, m, "_idl", vecCol)
      .select(col("_idl.id").as("new_id"), col("_idl.lab").as("lb"),
              col("cell"), col("v").as("vb"), col("nrm").as("nb"))
    val c = corpusIndex.select(col("cell"), col("vec_id").as("neg_id"),
                               col("v").as("va"), col("nrm").as("na"),
                               col("lab").as("la"))
    a.join(c, Seq("cell"))
      .filter(col("neg_id") =!= col("new_id") && col("la") =!= col("lb"))
      .withColumn("cos",
        when(col("na") === 0.0 || col("nb") === 0.0,
          lit(null).cast("double"))
          .otherwise(graft.functions.VectorFunctions.dot(col("va"), col("vb"))
            / (col("na") * col("nb"))))
      .select(col("new_id"), col("cell"), col("neg_id"),
              col("lb").as("label"), col("la").as("neg_label"),
              round(col("cos"), 4).as("cos"))
  }

  /** x146's streaming twin: diversity-quota ADMISSION at ingest. The
    * batch downsample keeps the ceil(|cell|/4) most-central rows per
    * cell — a rank, not streamable; the frozen artifact it exports is
    * the per-cell admission BOUNDARY (cell, bd, bid): the (distance,
    * vec_id) of the last admitted row under the batch's (d ASC, id ASC)
    * order. An arriving vector is admitted iff its (d, id) sorts
    * at-or-before the boundary — the identical total order, so screening
    * the corpus's own rows against its own boundaries reproduces the
    * batch keep set EXACTLY (StreamingSpec), and a new arrival gets
    * yesterday's quota discipline until the next batch refresh. State:
    * NONE — one stateless literal argmin plus two k-row broadcast
    * stream-static joins. A cell absent from `boundaries` admits
    * nothing (left join, null-safe false). */
  def streamingQuotaAdmission(stream: DataFrame, boundaries: DataFrame,
                              m: graft.operators.KMeansDet.Model,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    require(m.k <= graft.operators.KMeansDet.LiteralFormMaxK,
      s"streaming admission needs the stateless literal argmin (k <= " +
        s"${graft.operators.KMeansDet.LiteralFormMaxK}), got k=${m.k}")
    val spark = stream.sparkSession
    import spark.implicits._
    val cf = m.centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq.toDF("cell", "_c")
    graft.operators.KMeansDet.labeled(stream, m, idCol, vecCol)
      .join(broadcast(cf), Seq("cell"))
      .withColumn("d",
        graft.functions.VectorFunctions.dot(col("v"), col("v"))
          - lit(2.0) * graft.functions.VectorFunctions.dot(col("v"), col("_c"))
          + graft.functions.VectorFunctions.dot(col("_c"), col("_c")))
      .join(broadcast(boundaries.select(col("cell"), col("bd"), col("bid"))),
            Seq("cell"), "left_outer")
      .withColumn("admitted",
        coalesce(struct(col("d").as("x"), col(idCol).cast("long").as("y")) <=
                 struct(col("bd").as("x"), col("bid").cast("long").as("y")),
                 lit(false)))
      .select(col(idCol), col("cell"), round(col("d"), 4).as("d"),
              col("admitted"))
  }

  def streamingQuantileSketch(cents: DataFrame,
                              centsCol: String = "c"): DataFrame =
    cents.select(graft.ops.QuantileSketchOps.bucketOf(col(centsCol)).as("b"))
      .groupBy(col("b")).count()

  /** Streaming twin of batch x136's intra-document repetition metrics:
    * the projection is per-row and stateless (the bigram-multiplicity
    * fold runs inside the row — no explode, no aggregation), so the
    * SAME expression tree runs verbatim on the ingest stream in append
    * mode with zero state. A micro-batch's output EQUALS the batch
    * metrics over the same rows by construction (StreamingSpec
    * reconciles both arms). This is the shape to prefer whenever a
    * quality rule can be stated per-document: it screens at ingest with
    * no reprocessing and no watermark concerns. */
  def streamingRepetitionScreen(docs: DataFrame, idCol: String = "doc_id",
                                textCol: String = "text"): DataFrame =
    graft.functions.TextFunctions.docRepetition(docs, idCol, textCol)

  /** x161's streaming twin: the checksum-validated identifier screen at
    * INGEST — the same stateless projection verbatim on the stream (the
    * [[streamingRepetitionScreen]] pattern: extract → Luhn-validate →
    * redact, zero state), so card-like identifiers are masked before
    * the bytes ever land. */
  def streamingLuhnScreen(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame =
    graft.CorpusQueries.luhnScreen(docs, idCol, textCol)

  /** x148's streaming twin: graph-ANN SERVING on a query stream over
    * the PER-CELL sharded artifacts
    * ([[graft.operators.GraphSearch.serveShards]]: one row per coarse
    * cell — seed list, closure-restricted adjacency and vector maps).
    * Each query joins to ITS cell's shard row — one stream-static KEYED
    * equi-join on `cell`, zero state, no whole-corpus broadcast — and
    * the whole fixed-hop beam search runs INSIDE the joined row as
    * higher-order array functions: seed from the shard's seed list
    * (self excluded), then `hops` rounds of sort-by-(cos DESC NULLS
    * LAST, nid ASC) → take `beam` → expand `gmap` → score fresh
    * candidates via `vmap`. Per-row work is bounded by the same
    * constant budget as the batch operator (≤ beam + hops·beam·kg
    * scored candidates); the shard's closure restriction covers every
    * node a cell-seeded search can touch, so the visited set is the
    * identical pure function of (graph, seeds, query) — StreamingSpec
    * reconciles the served answer with batch
    * [[graft.operators.GraphSearch.search]] over a query split ACROSS
    * shards, and x170 hash-proves shard ≡ batch at 3 SFs. Output per
    * query: (qid, rank, nid, cos, scored_n) for rank ≤ `k`.
    *
    * This is the deployment shape for query-time ANN at ingest: each
    * serving executor holds its cell's shard resident (the HNSW
    * convention), queries route to shards by coarse cell upstream, and
    * corpus growth adds SHARDS, never widens a global artifact. */
  def streamingGraphServe(queries: DataFrame, artifacts: DataFrame,
                          beam: Int, hops: Int, k: Int): DataFrame = {
    validateShardParams(artifacts, beam, hops)
    // keyed stream-static join: each query row picks up exactly its
    // cell's shard (seeds + closure maps)
    serveCore(
      queries.join(artifacts, "cell"),
      slice(filter(
        coalesce(col("seeds"), array().cast("array<long>")),
        id => id =!= col("qid")), 1, beam),
      id => coalesce(element_at(col("gmap"), id),
                     array().cast("array<long>")),
      id => element_at(col("vmap"), id),
      beam, hops, k)
  }

  /** [[streamingGraphServe]] with TOP-2-CELL SEED INSURANCE — the
    * deployment shape of x163's measured result: top-2 seeding at the
    * same total seed count holds 91–94% recall where a mis-seeded
    * nprobe=1 serve recalls 0–6% (and static long-range edges recover
    * ~0–21%, x171), so the near-boundary query's insurance belongs on
    * the SEEDING side of the serving path, not in the graph. Each query
    * carries its top-2 coarse cells (`cell1`, `cell2` — the quantizer's
    * two nearest centroids) and joins BOTH cells' shard rows — two keyed
    * stream-static equi-joins, still zero state — seeding beam/2 ids
    * from each shard's seed list (self excluded; x163's 'two' mode
    * exactly) and resolving every adjacency/vector lookup through the
    * first shard that carries the key (closures overlap, and where they
    * do the entries are identical by construction, so lookup order
    * cannot matter). The visited set dedups by nid before every beam
    * cut and the final rank, exactly like the batch union-distinct.
    * Budget: ≤ 2× the nprobe=1 serve (both cells' seed neighborhoods
    * expand) and still CONSTANT in corpus size; x178 hash-proves the
    * two-shard serve ≡ the batch x163 top-2 search at 3 SFs.
    *
    * Contract: `beam` must be even (the per-cell split is beam/2) and
    * both cells must exist in the artifact (a query with one legitimate
    * cell repeats it in both columns — the seed dedup collapses the
    * duplicate seeds, leaving a plain nprobe=1 serve at half seeds). */
  def streamingGraphServeTop2(queries: DataFrame, artifacts: DataFrame,
                              beam: Int, hops: Int, k: Int): DataFrame = {
    require(beam % 2 == 0,
      s"top-2 serving splits the seed budget per cell — beam must be " +
        s"even, got $beam")
    validateShardParams(artifacts, beam, hops)
    def shardAs(i: Int): DataFrame = artifacts.select(
      col("cell").as(s"cell$i"), col("seeds").as(s"seeds$i"),
      col("gmap").as(s"gmap$i"), col("vmap").as(s"vmap$i"))
    def halfSeeds(c: Column): Column =
      slice(filter(coalesce(c, array().cast("array<long>")),
        id => id =!= col("qid")), 1, beam / 2)
    serveCore(
      queries.join(shardAs(1), "cell1").join(shardAs(2), "cell2"),
      array_distinct(concat(halfSeeds(col("seeds1")),
                            halfSeeds(col("seeds2")))),
      id => coalesce(element_at(col("gmap1"), id),
                     element_at(col("gmap2"), id),
                     array().cast("array<long>")),
      id => coalesce(element_at(col("vmap1"), id),
                     element_at(col("vmap2"), id)),
      beam, hops, k)
  }

  /** One-time artifact validation before the stream starts (the static
    * side of the stream-static join — |cells| rows, one tiny job): the
    * shard closure depth is a property of the BUILD, so serving a shard
    * built with different beam/hops would silently return incomplete
    * results behind the per-lookup coalesce. [[graft.operators
    * .GraphSearch.serveShards]] stamps its parameters into every row;
    * this requires them to match the serve call's. */
  private def validateShardParams(artifacts: DataFrame, beam: Int,
                                  hops: Int): Unit = {
    require(artifacts.columns.contains("beam") &&
        artifacts.columns.contains("hops"),
      "shard artifact carries no beam/hops columns — rebuild it with " +
        "GraphSearch.serveShards (the closure depth must be provable)")
    val ps = artifacts.select(col("beam"), col("hops")).distinct().collect()
    require(ps.length == 1,
      s"shard artifact carries ${ps.length} distinct (beam, hops) " +
        "pairs — expected exactly one build generation")
    val (ab, ah) = (ps(0).getInt(0), ps(0).getInt(1))
    require(ab == beam && ah == hops,
      s"shard artifact was built with beam=$ab hops=$ah but serve was " +
        s"called with beam=$beam hops=$hops — a mismatched closure " +
        "depth silently drops reachable candidates; rebuild the shards " +
        "or match the call")
  }

  /** The shared fixed-hop beam-search serve loop over a query frame
    * already joined to its shard row(s): `seedIds` is the self-excluded
    * seed id array, `gLookup`/`vLookup` resolve a node id to its
    * out-adjacency / (v, nrm) struct through whatever shard columns the
    * caller joined. Everything else — the (cos DESC NULLS LAST, nid
    * ASC) rank, the per-hop beam cut, the visited-set dedup by nid, the
    * budget column — is identical across nprobe=1 and top-2 serving. */
  private def serveCore(joined: DataFrame, seedIds: Column,
                        gLookup: Column => Column,
                        vLookup: Column => Column,
                        beam: Int, hops: Int, k: Int): DataFrame = {
    // comparator for (cos DESC NULLS LAST, nid ASC) — the batch rank
    def cmp(l: Column, r: Column): Column = {
      val byId = when(l.getField("nid") < r.getField("nid"), -1)
        .when(l.getField("nid") > r.getField("nid"), 1).otherwise(0)
      val lc = l.getField("cos"); val rc = r.getField("cos")
      when(lc.isNull && rc.isNull, byId)
        .when(lc.isNull, 1).when(rc.isNull, -1)
        .when(lc > rc, -1).when(lc < rc, 1)
        .otherwise(byId)
    }
    def scoreOf(id: Column): Column = {
      val e = vLookup(id)
      val cos = when(col("qn") === 0.0 || e.getField("nrm") === 0.0,
          lit(null).cast("double"))
        .otherwise(graft.functions.VectorFunctions.dot(
            col("qv"), e.getField("v")) / (col("qn") * e.getField("nrm")))
      struct(id.as("nid"), cos.as("cos"))
    }
    var out = joined.withColumn("visited", transform(seedIds, scoreOf(_)))
    for (_ <- 1 to hops) {
      out = out
        .withColumn("_beam", slice(array_sort(col("visited"), cmp), 1, beam))
        .withColumn("_fresh",
          filter(
            array_distinct(flatten(transform(col("_beam"), b =>
              gLookup(b.getField("nid"))))),
            id => id =!= col("qid") &&
              !exists(col("visited"), v => v.getField("nid") === id)))
        .withColumn("visited",
          concat(col("visited"), transform(col("_fresh"), scoreOf(_))))
    }
    out
      .select(col("qid"), size(col("visited")).cast("long").as("scored_n"),
              posexplode(array_sort(col("visited"), cmp)))
      .filter(col("pos") < k)
      .select(col("qid"), (col("pos") + 1).as("rank"),
              col("col").getField("nid").as("nid"),
              col("col").getField("cos").as("cos"), col("scored_n"))
  }

  /** x168's streaming twin: frozen-tokenizer segmentation at INGEST.
    * The 8-row merge artifact ([[graft.operators.Bpe.mergesArtifact]])
    * broadcasts onto the stream — one stream-static join, zero state —
    * and each doc row segments itself: words split per row, each word
    * folded through the learned merges IN ORDER (the same greedy
    * left-to-right [[graft.operators.Bpe.applyMerge]] fold, unrolled to
    * the fixed round count as nested higher-order functions). Output
    * (id, n_tokens, seg_md5) matches batch x168 exactly over any
    * micro-batch split (StreamingSpec) — token accounting and the
    * segmentation hash are available the moment a document lands,
    * under yesterday's tokenizer, with no reprocessing. Wordless docs
    * are dropped (the batch arm's join semantics).
    *
    * The artifact is VALIDATED before the first micro-batch (the same
    * fail-loud contract [[graft.operators.Bpe.segmentWords]] enforces):
    * it must be exactly one row whose `merges` array carries rounds
    * 1..`rounds` in order — under default (non-ANSI) mode a short or
    * mis-ordered array would make `element_at` return null and the
    * merge silently no-op, corrupting every segmentation. The artifact
    * is the static side of the stream-static join (rounds+0 rows by
    * contract), so the collect is certified-small and runs once. */
  def streamingBpeSegment(docs: DataFrame, artifact: DataFrame,
                          rounds: Int, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val arows = artifact.select(col("merges")).collect()
    require(arows.length == 1,
      s"merge artifact must be exactly one row, got ${arows.length}")
    val rs = arows(0).getSeq[org.apache.spark.sql.Row](0).map(_.getInt(0))
    require(rs.length == rounds &&
        rs.zipWithIndex.forall { case (r, i) => r == i + 1 },
      s"merge artifact must carry exactly rounds 1..$rounds in order, " +
        rs.mkString("got [", ",", "]"))
    def segWord(w: Column): Column = {
      var t: Column =
        transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))
      for (r <- 1 to rounds) {
        val m = element_at(col("merges"), r)
        t = graft.operators.Bpe.applyMerge(t, m.getField("a"),
                                           m.getField("b"))
      }
      t
    }
    docs.crossJoin(broadcast(artifact))
      .withColumn("_ws",
        filter(graft.functions.TextFunctions.words(col(textCol)),
               w => w =!= ""))
      .filter(size(col("_ws")) > 0)
      .withColumn("_toks", flatten(transform(col("_ws"), segWord(_))))
      .select(col(idCol),
              size(col("_toks")).cast("long").as("n_tokens"),
              md5(array_join(col("_toks"), " ").cast("binary"))
                .as("seg_md5"))
  }

  /** x176's streaming twin: corrupt-tolerant JSON parsing at INGEST —
    * the quarantine-don't-crash contract on the stream. Each arriving
    * raw line parses via `from_json` (a stateless projection, zero
    * state); a line that fails to parse lands with its struct null and
    * the RAW BYTES preserved in `_corrupt_record` (the PERMISSIVE
    * convention), so the quarantine can be re-driven or audited later
    * instead of silently vanishing at the firehose. StreamingSpec
    * reconciles the streamed good/quarantined split with batch x176's
    * populations over a line split. */
  def streamingJsonQuarantine(lines: DataFrame, schema: String,
                              lineCol: String = "value"): DataFrame = {
    // the corrupt column rides INSIDE the parse schema
    // (columnNameOfCorruptRecord) — the same PERMISSIVE mechanism the
    // batch reader uses, not a reimplementation: from_json alone would
    // return a null-FIELDED struct for malformed input,
    // indistinguishable from a legitimately-empty record
    val caller = org.apache.spark.sql.types.StructType.fromDDL(schema)
    // the quarantine column is APPENDED here — a caller schema that
    // already declares it would either collide (duplicate column) or,
    // worse, let legitimately-parsed rows carry data in the column this
    // operator uses as the quarantine verdict; fail loud instead
    require(!caller.fieldNames.contains("_corrupt_record"),
      "schema must not declare _corrupt_record — the quarantine column " +
        "is appended by streamingJsonQuarantine itself; rename the data " +
        "field or parse it separately")
    val st = caller.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val parsed = from_json(col(lineCol), st,
      Map("columnNameOfCorruptRecord" -> "_corrupt_record"))
    // a NULL line (a Kafka tombstone cast to string) makes from_json
    // return a null STRUCT — neither parsed nor corrupt-captured — so
    // it would land in the GOOD population as an all-null row; the
    // struct-level coalesce quarantines it instead (raw bytes "" — a
    // null payload has none to preserve)
    val quarantinedNull = struct(st.fields.map { f =>
      if (f.name == "_corrupt_record")
        coalesce(col(lineCol), lit("")).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    lines.select(coalesce(parsed, quarantinedNull).as("r"))
      .select(col("r.*"))
  }

  /** x172's INGEST-side streaming twin: a stream appending into the
    * partitioned columnar layout ([[graft.io.TableIo.writePartitioned]])
    * with EXACTLY-ONCE semantics. Returns the `foreachBatch` body; the
    * caller wires it with a checkpoint:
    * {{{
    *   stream.writeStream
    *     .foreachBatch(StreamingOps.partitionedSinkBatch(path, Seq("dt")))
    *     .option("checkpointLocation", ckpt).start()
    * }}}
    *
    * Exactly-once mechanics: each micro-batch writes under an extra
    * trailing `_batch_id=<id>` partition level in DYNAMIC partition-
    * overwrite mode, so a batch REPLAYED after a failure (the at-least-
    * once window between a sink write and the checkpoint commit)
    * overwrites exactly its own `(partition values, _batch_id)`
    * directories — idempotent — while every other batch's directories
    * are untouched. The business partition column stays the TOP
    * directory level, so readers prune on it exactly as on the batch
    * layout (StreamingSpec pins PartitionFilters on the read), and the
    * extra level is invisible to partition-pruned scans.
    *
    * Why not Spark's built-in file sink (`writeStream.format("orc")`):
    * it is also exactly-once, but through a driver-side `_spark_metadata`
    * transaction log that grows with every batch for the table's
    * lifetime, must be compacted, and makes the directory unreadable as
    * a PLAIN columnar layout (readers that don't consult the log see
    * uncommitted files). The batch-id partition level carries the same
    * guarantee in the layout itself — any engine can read the directory,
    * and retention/compaction work per directory (the
    * [[graft.io.Compaction]] path applies unchanged). */
  def partitionedSinkBatch(path: String, partitionCols: Seq[String],
                           format: String = "parquet")
      : (DataFrame, Long) => Unit = {
    require(partitionCols.nonEmpty,
      "partitionedSinkBatch needs at least one partition column")
    require(!partitionCols.contains("_batch_id"),
      "_batch_id is the sink's idempotency level — it cannot also be a " +
        "business partition column")
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val key = "spark.sql.sources.partitionOverwriteMode"
      val old = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try
        batch.withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .partitionBy((partitionCols :+ "_batch_id"): _*)
          .format(format).save(path)
      finally old.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
      // SEAL the batch: its directories exist from the first task
      // commit onward, so a maintenance fold running beside the stream
      // could otherwise read a half-written batch, advance the
      // watermark past it, and permanently hide the late-arriving rows
      // behind the `> watermark` tail filter. The marker is written
      // only after save() returns (the batch is complete), it is
      // underscore-prefixed (invisible to data readers), and a crash
      // between save and marker just replays the batch — the dynamic
      // overwrite and the marker rewrite are both idempotent.
      // Compaction.compactIngest folds ONLY sealed batches.
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new org.apache.hadoop.fs.Path(path).toUri,
        spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(path, s"_sealed_$batchId"),
        true).close()
    }
  }

  def streamingKmvDistinct(keys: DataFrame, k: Int = 64): DataFrame = {
    val bk = udaf(new graft.functions.BottomKDistinctLongAggregator(k),
                  org.apache.spark.sql.Encoders.scalaLong)
    keys.select(col("stratum"),
        conv(substring(md5(concat(lit("kmv:"), col("key"))), 1, 12), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("stratum"))
      .agg(bk(col("h")).as("kmv"))
      .select(col("stratum"), col("kmv"),
        when(size(col("kmv")) < k, size(col("kmv")).cast("long"))
          .otherwise(expr(
            s"${(k - 1).toLong * (1L << 48)}L div element_at(kmv, $k)"))
          .as("est_distinct"))
  }
}
