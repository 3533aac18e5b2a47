package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextFunctions => T}

class NgramJaccardSpec extends SparkSpec {

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox leaps over the lazy dog",
    "completely different text with no overlap at all",
    "the quick brown fox jumps over the lazy dog", // identical to #1
    "  leading and   trailing   whitespace runs  ",
    "short doc",                                   // < n words → empty set
    "tiny",                                        // 1 word
    "",                                            // empty text
    "repeat repeat repeat repeat repeat"           // duplicate shingles
  )

  test("native ngram_jaccard is bit-identical to the composed form on all defined pairs") {
    import spark.implicits._
    def nWords(s: String) = s.trim.split("\\s+", -1).length
    for (n <- Seq(2, 3)) {
      // the composed form throws DIVIDE_BY_ZERO (ANSI) when BOTH sides are
      // shingle-less — candidate generation can never produce such a pair,
      // so equivalence is over pairs with at least one shingled side
      val pairs = for {
        a <- docs; b <- docs
        if nWords(a) >= n || nWords(b) >= n
      } yield (a, b)
      val df = pairs.toDF("a", "b")
      def bits(c: org.apache.spark.sql.Column) =
        df.select(c.as("j")).collect().map(r =>
          if (r.isNullAt(0)) None
          else Some(java.lang.Double.doubleToLongBits(r.getDouble(0)))).toSeq
      assert(bits(T.ngramJaccard(col("a"), col("b"), n)) ==
             bits(T.ngramJaccardComposed(col("a"), col("b"), n)))
    }
  }

  test("both sides shingle-less → null (composed form would raise DIVIDE_BY_ZERO)") {
    import spark.implicits._
    val df = Seq(("short doc", "tiny"), ("", "x y")).toDF("a", "b")
    val out = df.select(T.ngramJaccard(col("a"), col("b"), 3))
      .collect().map(_.isNullAt(0)).toSeq
    assert(out == Seq(true, true))
  }

  test("identical docs → 1.0; disjoint docs → 0.0; null text → null") {
    import spark.implicits._
    val df = Seq(
      (docs(0), docs(3)),
      (docs(0), docs(2))).toDF("a", "b")
    val out = df.select(T.ngramJaccard(col("a"), col("b"), 3)).as[Double]
      .collect().toSeq
    assert(out == Seq(1.0, 0.0))
    val withNull = Seq((Option(docs(0)), Option.empty[String])).toDF("a", "b")
    assert(withNull.select(T.ngramJaccard(col("a"), col("b"), 3))
      .head().isNullAt(0))
  }

  test("SQL surface resolves ngram_jaccard") {
    import spark.implicits._
    val got = Seq((docs(0), docs(1))).toDF("a", "b")
      .selectExpr("ngram_jaccard(a, b, 3)").as[Double].head()
    val want = Seq((docs(0), docs(1))).toDF("a", "b")
      .select(T.ngramJaccardComposed(col("a"), col("b"), 3)).as[Double].head()
    assert(got == want)
  }
}
