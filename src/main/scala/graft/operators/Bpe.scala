package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.CacheScope

/** Byte-pair-encoding merge LEARNING and application (x167/x168) — the
  * tokenizer-training member of the corpus toolbox (Sennrich et al.
  * 2016; the GPT-2/LLaMA vocabulary recipe).
  *
  * Everything runs on the DISTINCT-WORD VALUE DOMAIN (word, corpus
  * count) — the CCNet/house device: BPE statistics are a function of
  * the word-frequency table, never the raw corpus, so a round's cost is
  * bounded by |vocab| (Heaps-law growth) while counts still weight by
  * true corpus frequency. Per round: adjacent-pair counts (one explode
  * + map-side-combinable sum over the word domain), the argmax merge
  * pinned by (count DESC, a ASC, b ASC), and re-segmentation as a
  * PER-WORD greedy left-to-right fold (`aggregate` over the token
  * array — merge when the accumulator's last token is `a` and the
  * incoming token is `b`; a just-merged token can't re-merge because it
  * is the concatenation, which matches the canonical non-overlapping
  * scan: "aaaa" + (a,a) → [aa, aa]). The merge pair parameterizes each
  * round as a broadcast 1-row frame — fully declarative, nothing
  * driver-side.
  *
  * Training state (seg_r) is persisted per round under `scope` — each
  * round reads the previous twice (pair counts + fold), the x14/x120
  * iteration hygiene. 100 TB shape: the one corpus-sized job is the
  * word count; every round after runs on |vocab| rows. (Production
  * tokenizer training subsamples the corpus for the SAME reason — the
  * value-domain collapse is the exact equivalent with no sampling
  * noise.)
  */
object Bpe {

  /** (word, wcount) → initial character segmentation
    * (word, wcount, toks). */
  def initSeg(words: DataFrame): DataFrame =
    words.withColumn("toks",
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Greedy left-to-right merge of (a, b) over a token array. */
  def applyMerge(toks: Column, a: Column, b: Column): Column =
    aggregate(toks, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
             element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1),
                 array(concat(element_at(acc, -1), x))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent-pair corpus counts of a segmentation. (The size ≥ 2
    * guard matters: Spark's `sequence(1, 0)` DESCENDS, so a 1-token
    * word would index out of bounds under ANSI mode.) */
  def pairCounts(seg: DataFrame): DataFrame =
    seg.filter(size(col("toks")) >= 2)
      .select(col("wcount"),
        explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(toks[i - 1] AS a, toks[i] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wcount")).as("cnt"))

  /** Learn `rounds` merges over (word, wcount). Returns
    * (round, a, b, cnt, vocab_size, total_tokens) — the merge table
    * WITH the training curve (vocab and corpus token count AFTER each
    * merge) — and the final segmentation (word, wcount, toks).
    *
    * Each round's state is EAGERLY localCheckpointed (the x14/x120
    * plan-truncation device, as in [[GraphSearch.search]]): a round
    * references the previous segmentation THREE times (pair counts,
    * fold, stats), so without truncation the analyzed tree grows 3^r
    * and Catalyst ANALYSIS — not the data — exhausts the heap by
    * round 8 (measured: OOM on a 3k-word domain). Checkpointed frames
    * are |vocab|-sized, so the materialization cost is negligible. */
  def train(words: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var seg = initSeg(words).localCheckpoint()
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val best = pairCounts(seg)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1)
        .localCheckpoint() // 1 row, read by the fold and the output
      seg = seg.crossJoin(broadcast(best))
        .select(col("word"), col("wcount"),
                applyMerge(col("toks"), col("a"), col("b")).as("toks"))
        .localCheckpoint()
      val stats = seg.select(col("wcount"), explode(col("toks")).as("t"))
        .agg(countDistinct(col("t")).as("vocab_size"),
             sum(col("wcount")).as("total_tokens"))
      val row = best.crossJoin(broadcast(stats))
        .select(lit(r).as("round"), col("a"), col("b"), col("cnt"),
                col("vocab_size"), col("total_tokens"))
      out = Some(out.fold(row)(_ unionByName row))
    }
    (out.get, seg)
  }

  /** The learned merges as ONE row holding an array of (round, a, b)
    * structs in round order — the frozen-tokenizer artifact the
    * streaming twin broadcasts onto the ingest stream
    * ([[graft.streaming.StreamingOps.streamingBpeSegment]]). */
  def mergesArtifact(merges: DataFrame): DataFrame =
    merges.agg(sort_array(collect_list(
      struct(col("round"), col("a"), col("b")))).as("merges"))

  /** Apply a learned merge table — `merges` as (round, a, b) — to a
    * fresh word domain WITHOUT pair counting (x168's ingest economics:
    * training is the corpus's cost, application is `rounds` folds over
    * the batch's |vocab|). The table is COLLECTED into merge-rule
    * literals (it is the frozen artifact — `rounds` rows by contract,
    * the [[graft.operators.KMeansDet.Model]] pattern) and validated to
    * carry exactly rounds 1..`rounds`: a missing round as a silent
    * empty cross join would erase the batch. */
  def segmentWords(words: DataFrame, merges: DataFrame, rounds: Int)
      : DataFrame = {
    val ms = merges.select(col("round"), col("a"), col("b"))
      .orderBy(col("round")).collect()
    require(ms.length == rounds &&
        ms.zipWithIndex.forall { case (r, i) => r.getInt(0) == i + 1 },
      s"merge table must carry exactly rounds 1..$rounds, got " +
        ms.map(_.getInt(0)).mkString("[", ",", "]"))
    var seg = initSeg(words)
    for (m <- ms)
      seg = seg.select(col("word"), col("wcount"),
        applyMerge(col("toks"), lit(m.getString(1)), lit(m.getString(2)))
          .as("toks"))
    seg
  }
}
