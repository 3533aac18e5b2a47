package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.expr.JaroWinkler

/** Pins [[JaroWinkler]] to the DuckDB/rapidfuzz reference semantics the
  * x85 oracle depends on — exact doubles, not tolerances (the values
  * below were read off `jaro_winkler_similarity` directly). */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val RefPairs = Seq(
    // the textbook pair: jaro 0.944…, prefix 3 → winkler boost applies
    ("martha", "marhta", 0.9611111111111111),
    // jaro > 0.7 but prefix-boosted from a different base
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    // below the 0.7 boost threshold: returned UNboosted even though the
    // common prefix is nonzero
    ("CRATE", "TRACE", 0.7333333333333334),
    // reference empty semantics: 0.0, including both-empty (NOT the
    // academic 1.0 convention)
    ("", "", 0.0),
    ("a", "", 0.0),
    ("", "b", 0.0),
    // match window floor(2/2)-1 = 0 ⇒ the swap never matches
    ("ab", "ba", 0.0),
    ("abc", "abc", 1.0))

  test("reference values are reproduced bit-exactly (codegen path)") {
    val got = RefPairs.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b"))).as[Double].collect()
    RefPairs.zip(got).foreach { case ((a, b, want), g) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
             java.lang.Double.doubleToLongBits(want),
        s"jw($a, $b): got $g want $want")
    }
  }

  test("interpreted path agrees with codegen; null input yields null") {
    val df = RefPairs.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    def run() = df.select(JaroWinkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val withNull = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b"))).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("x85 best-match argmax: min(struct(-jw, key)) picks highest jw, lowest key on ties") {
    val cand = Seq(
      (1L, 10L, "martha", "marhta"),   // 0.961…
      (1L, 11L, "martha", "martha"),   // 1.0   ← winner
      (1L, 12L, "martha", "martha"),   // 1.0   (tie, higher key loses)
      (2L, 20L, "ab", "ba"),           // 0.0   ← only candidate
      (2L, 21L, "ab", "xy")            // 0.0   (tie, higher key loses)
    ).toDF("d_id", "cid", "d_name", "c_name")
      .withColumn("jw", JaroWinkler(col("d_name"), col("c_name")))
    val got = cand.groupBy(col("d_id"))
      .agg(min(struct((-col("jw")).as("njw"), col("cid").as("cid"),
                      col("jw").as("jw"))).as("m"))
      .select(col("d_id"), col("m.cid"), col("m.jw"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L) == ((11L, 1.0)), s"ties must break to the lowest key: $got")
    assert(got(2L) == ((20L, 0.0)))
  }
}
