package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Edge-case semantics of the x69/x70 retrieval operators (oracle parity
  * runs on real testdata; these pin boundary behaviors it may not hit). */
class FunctionQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("signBand encodes exactly the requested dims, LSB-first") {
    val df = Seq(
      (1L, vec(1, -1, 1, 1, -1, -1, -1, -1, /* band 2: */ -1, 1)),
      (2L, vec(-1, 1, -1, -1, 1, 1, 1, 1, 1, -1))
    ).toDF("id", "v")
      .select(col("id"), V.signBand(col("v"), 0, 8).as("s0"),
              V.signBand(col("v"), 8, 2).as("s1"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // id 1: bits 0,2,3 set -> 1+4+8 = 13; band2 bit1 only -> 2
    assert(df(1L) === ((13L, 2L)))
    // id 2 is the exact complement within each band
    assert(df(2L) === ((255L - 13L, 1L)))
  }

  test("x69 banding: one agreeing band is enough; disagreement on both is fatal") {
    val base = vec(1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1)
    val flipLow = base.clone(); flipLow(0) = -1f // band 0 differs, band 1 agrees
    val flipBoth = base.map(x => -x) // both bands differ
    val e = Seq((0L, base), (1L, base.clone), (2L, flipLow), (3L, flipBoth))
      .toDF("vec_id", "embedding")
    val sigs = e.select(col("vec_id"),
      V.signBand(col("embedding"), 0, 8).as("s0"),
      V.signBand(col("embedding"), 8, 8).as("s1"))
    def bandPairs(b: String) = sigs
      .select(col(b).as("bk"), col("vec_id").as("id_a"))
      .join(sigs.select(col(b).as("bk"), col("vec_id").as("id_b")), Seq("bk"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    val cand = bandPairs("s0").union(bandPairs("s1")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 1L)), "identical vectors must be candidates")
    assert(cand.contains((0L, 2L)), "band-1 agreement alone must qualify")
    assert(!cand.exists(p => p._1 == 3L || p._2 == 3L),
      "a vector disagreeing on every band can never be a candidate")
  }

  test("rrfFuse: both-list candidates sum, single-list get one term, ties break by doc_id") {
    val ttop = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("qid", "doc_id", "trank")
    val vtop = Seq((0L, 10L, 2), (0L, 12L, 1)).toDF("qid", "doc_id", "vrank")
    val out = FunctionQueries.rrfFuse(ttop, vtop, k = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // doc 10: 1000000/61 + 1000000/62 = 16393 + 16129 = 32522
    // doc 12: 1000000/61 = 16393 ; doc 11: 1000000/62 = 16129
    assert(out === Array((1, 10L, 32522L), (2, 12L, 16393L), (3, 11L, 16129L)))
  }

  test("rrfFuse: equal scores rank by doc_id ascending") {
    val ttop = Seq((0L, 20L, 1)).toDF("qid", "doc_id", "trank")
    val vtop = Seq((0L, 7L, 1)).toDF("qid", "doc_id", "vrank")
    val out = FunctionQueries.rrfFuse(ttop, vtop, k = 10)
      .orderBy(col("rank")).collect().map(_.getLong(2))
    assert(out === Array(7L, 20L), "tie at 16393 must order by doc_id")
  }
}
