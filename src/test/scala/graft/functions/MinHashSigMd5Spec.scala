package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.expr.MinHashSigMd5
import graft.functions.{TextFunctions => T}

/** The native one-pass md5 signature must be BYTE-IDENTICAL to the
  * composed `array_min(transform(shingles, md5(seed:shingle)))` form —
  * that identity is what keeps the DuckDB oracles valid. */
class MinHashSigMd5Spec extends SparkSpec {

  test("native md5 signature ≡ composed form, including edge cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (3L, "completely different content here today folks"),
      (4L, "two words"),          // fewer than n=3 words → null components
      (5L, ""),                   // empty string
      (6L, "  padded   whitespace   splits   correctly  "))
      .toDF("doc_id", "text")
    val composed = docs
      .select(col("doc_id"), T.minhashSignature(col("text"), 3, 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val native = docs
      .select(col("doc_id"), T.words(col("text")).as("_w"))
      .select(col("doc_id"), MinHashSigMd5(col("_w"), 3, 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == composed)
    assert(native(1) == native(2))
    assert(native(4).forall(_ == null))
  }

  test("SQL surface resolves minhash_sig_md5 via extensions") {
    import spark.implicits._
    val out = Seq("alpha beta gamma delta").toDF("text")
      .selectExpr("minhash_sig_md5(split(trim(text), '\\\\s+'), 3, 4) AS sig")
      .collect()(0).getSeq[String](0)
    assert(out.length == 4 && out.forall(_.length == 32))
  }
}
