package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Bpe]] semantics on hand corpora: the greedy non-overlapping fold,
  * the (count DESC, a, b) argmax pinning, second-order merges, and the
  * frozen application path. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def wordsDF(ws: (String, Long)*) = ws.toSeq.toDF("word", "wcount")

  test("applyMerge: greedy left-to-right, merged tokens never re-merge") {
    val df = wordsDF("aaaa" -> 1L).select(
      Bpe.applyMerge(Bpe.initSeg(wordsDF("aaaa" -> 1L)).select(col("toks"))
        .collect().head.getSeq[String](0).foldLeft(array())((a, t) =>
          concat(a, array(lit(t)))), lit("a"), lit("a")).as("t"))
    assert(df.collect().head.getSeq[String](0) == Seq("aa", "aa"))
  }

  test("train: argmax pinned by (cnt DESC, a, b); curve is monotone") {
    // 'ab' x3, 'ba' x3 — tie on cnt 3 broken by a ASC: (a,b) wins
    val (merges, _) = Bpe.train(wordsDF("ab" -> 3L, "ba" -> 3L), 1)
    val r = merges.collect().head
    assert((r.getAs[String]("a"), r.getAs[String]("b")) == ("a", "b"))
    assert(r.getAs[Long]("cnt") == 3L)
    assert(r.getAs[Long]("total_tokens") == 3L + 6L) // 'ab'→1 tok, 'ba'→2
  }

  test("train learns second-order merges (pair of a prior merge)") {
    val (merges, seg) = Bpe.train(wordsDF("abab" -> 5L, "abc" -> 2L), 2)
    val ms = merges.orderBy("round").collect()
    assert((ms(0).getAs[String]("a"), ms(0).getAs[String]("b")) == ("a", "b"))
    // round 2's top pair is (ab, ab) from the re-segmented 'abab'
    assert((ms(1).getAs[String]("a"), ms(1).getAs[String]("b")) ==
      ("ab", "ab"))
    val fin = seg.filter(col("word") === "abab")
      .select(col("toks")).collect().head.getSeq[String](0)
    assert(fin == Seq("abab"))
  }

  test("segmentWords applies frozen merges without pair counting; unseen chars pass through") {
    val (merges, _) = Bpe.train(wordsDF("abab" -> 5L), 2)
    val out = Bpe.segmentWords(wordsDF("abq" -> 1L, "zz" -> 1L),
        merges.localCheckpoint(), 2)
      .collect().map(r => r.getAs[String]("word") ->
        r.getSeq[String](2)).toMap
    assert(out("abq") == Seq("ab", "q"))
    assert(out("zz") == Seq("z", "z"))
  }
}
