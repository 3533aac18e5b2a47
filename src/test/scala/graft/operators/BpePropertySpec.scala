package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Full straight-line second implementation of BPE training (the
  * MergeTertilePropertySpec device): an in-memory trainer — per round,
  * overlapping adjacent-pair counts weighted by word frequency, argmax
  * by (cnt DESC, a ASC, b ASC), greedy left-to-right non-overlapping
  * resegmentation — compared row-for-row against [[Bpe.train]]'s merge
  * table, curve, and final segmentation over seeded random corpora. */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private def refFold(toks: Seq[String], a: String,
                      b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toSeq
  }

  private def refTrain(words: Seq[(String, Long)], rounds: Int)
      : (Seq[(Int, String, String, Long, Long, Long)],
         Map[String, Seq[String]]) = {
    var seg: Map[String, Seq[String]] =
      words.map { case (w, _) => w -> w.map(_.toString) }.toMap
    val wc = words.toMap
    val merges = Seq.newBuilder[(Int, String, String, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((w, toks) <- seg; i <- 0 until toks.length - 1)
        counts((toks(i), toks(i + 1))) =
          counts.getOrElse((toks(i), toks(i + 1)), 0L) + wc(w)
      val ((a, b), cnt) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      seg = seg.map { case (w, toks) => w -> refFold(toks, a, b) }
      val vocab = seg.values.flatten.toSet.size.toLong
      val total = seg.map { case (w, toks) => toks.length * wc(w) }.sum
      merges += ((r, a, b, cnt, vocab, total))
    }
    (merges.result(), seg)
  }

  test("Bpe.train ≡ the straight-line trainer over seeded random corpora") {
    val rnd = new scala.util.Random(20260816)
    val alphabet = "abcd"
    for (trial <- 1 to 5) {
      val words = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      }.distinct.map(w => w -> (1L + rnd.nextInt(9)))
      val rounds = 3 + rnd.nextInt(3)
      val (refMerges, refSeg) = refTrain(words, rounds)
      val (merges, seg) = Bpe.train(words.toDF("word", "wcount"), rounds)
      val got = merges.orderBy("round").collect().map(r =>
        (r.getAs[Int]("round"), r.getAs[String]("a"), r.getAs[String]("b"),
         r.getAs[Long]("cnt"), r.getAs[Long]("vocab_size"),
         r.getAs[Long]("total_tokens"))).toSeq
      assert(got == refMerges,
        s"trial $trial (rounds=$rounds, words=$words):\n$got\nvs\n$refMerges")
      val gotSeg = seg.collect()
        .map(r => r.getAs[String]("word") -> r.getSeq[String](2)).toMap
      assert(gotSeg == refSeg, s"trial $trial final segmentation")
    }
  }

  test("Bpe.trainCollected ≡ Bpe.train merge-for-merge (table, curve, " +
       "final segmentation) over seeded random corpora") {
    val rnd = new scala.util.Random(20260817)
    val alphabet = "abcde"
    for (trial <- 1 to 5) {
      val words = (1 to 15).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      }.distinct.map(w => w -> (1L + rnd.nextInt(9)))
      val rounds = 3 + rnd.nextInt(4)
      val wdf = words.toDF("word", "wcount")
      def mergeRows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("round").collect().map(r =>
          (r.getAs[Int]("round"), r.getAs[String]("a"),
           r.getAs[String]("b"), r.getAs[Long]("cnt"),
           r.getAs[Long]("vocab_size"),
           r.getAs[Long]("total_tokens"))).toSeq
      def segRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getAs[String]("word"), r.getAs[Long]("wcount"),
           r.getSeq[String](2))).sortBy(_._1).toSeq
      val (lm, ls) = Bpe.train(wdf, rounds)
      val (cm, cs) = Bpe.trainCollected(wdf, rounds)
      assert(mergeRows(cm) == mergeRows(lm),
        s"trial $trial (rounds=$rounds, words=$words) merge table")
      assert(segRows(cs) == segRows(ls), s"trial $trial segmentation")
    }
  }

  test("delta-maintained trainCollected ≡ the full-recount form at " +
       "depths the Spark loop cannot reach (table, curve, final seg)") {
    // trainCollected maintains pair counts INCREMENTALLY (only words
    // containing the merged pair are touched per round); the recount
    // form repasses the whole segmentation. They must agree
    // merge-for-merge — including the vocab/total curve, whose delta
    // bookkeeping (tokUse/total) is the easiest thing to get wrong —
    // over corpora deep enough to run hundreds of rounds.
    val rnd = new scala.util.Random(20260818)
    val alphabet = "abcdefgh"
    for (trial <- 1 to 3) {
      val words = (1 to 400).map { _ =>
        val len = 2 + rnd.nextInt(10)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      }.distinct.map(w => w -> (1L + rnd.nextInt(50)))
      val rounds = 150 + rnd.nextInt(100)
      val wdf = words.toDF("word", "wcount").localCheckpoint()
      def mergeRows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("round").collect().map(r =>
          (r.getAs[Int]("round"), r.getAs[String]("a"),
           r.getAs[String]("b"), r.getAs[Long]("cnt"),
           r.getAs[Long]("vocab_size"),
           r.getAs[Long]("total_tokens"))).toSeq
      def segRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getAs[String]("word"), r.getAs[Long]("wcount"),
           r.getSeq[String](2))).sortBy(_._1).toSeq
      val (dm, ds) = Bpe.trainCollected(wdf, rounds)
      val (rm, rs) = Bpe.trainCollectedRecount(wdf, rounds)
      assert(mergeRows(dm) == mergeRows(rm),
        s"trial $trial (rounds=$rounds) merge table/curve diverged")
      assert(segRows(ds) == segRows(rs), s"trial $trial segmentation")
    }
  }

  test("trainCollected splits by CODE POINT and exhausts loud") {
    // a supplementary character (U+1D11E, two UTF-16 code units) must
    // count as ONE initial token — Spark's substring/length semantics
    val g = new String(Character.toChars(0x1D11E))
    val words = Seq((s"$g$g", 3L), ("xy", 2L))
    val (m, s) = Bpe.trainCollected(words.toDF("word", "wcount"), 1)
    val row = m.collect().head
    // (g,g) cnt 3 beats (x,y) cnt 2
    assert(row.getAs[String]("a") == g && row.getAs[Long]("cnt") == 3L)
    assert(s.filter(col("word") === "xy").collect()
      .head.getSeq[String](2) == Seq("x", "y"))
    // rounds beyond pair exhaustion fail loud, never silently no-op
    val e = intercept[IllegalArgumentException](
      Bpe.trainCollected(Seq(("ab", 1L)).toDF("word", "wcount"), 2))
    assert(e.getMessage.contains("no adjacent pairs"))
    // the Spark loop enforces the same contract from inside the fold's
    // materialization (zero extra jobs — a raise_error on the null
    // merge rule), surfacing as a Spark-side exception chain
    val et = intercept[Throwable](
      Bpe.train(Seq(("ab", 1L)).toDF("word", "wcount"), 2))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(et).exists(_.contains("no adjacent pairs")),
      chain(et).mkString(" | "))
    // an EMPTY word domain fails loud in BOTH trainers — the one
    // boundary the row-level raise cannot see (zero rows → it never
    // evaluates; train would otherwise return silently-empty merges)
    val emptyW = Seq.empty[(String, Long)].toDF("word", "wcount")
    val e1 = intercept[IllegalArgumentException](Bpe.train(emptyW, 1))
    assert(e1.getMessage.contains("empty word domain"))
    val e2 = intercept[IllegalArgumentException](
      Bpe.trainCollected(emptyW, 1))
    assert(e2.getMessage.contains("empty word domain"))
    // the certified-small contract is ENFORCED: a word domain larger
    // than maxVocab fails loud before the collect (no driver OOM)
    val big = Seq(("aa", 1L), ("bb", 1L), ("cc", 1L))
      .toDF("word", "wcount")
    val e3 = intercept[IllegalArgumentException](
      Bpe.trainCollected(big, 1, maxVocab = 2))
    assert(e3.getMessage.contains("maxVocab"))
  }
}
