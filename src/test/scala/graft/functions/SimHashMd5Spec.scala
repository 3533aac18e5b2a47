package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextFunctions => T}

/** The native one-pass md5 SimHash must be bit-identical to the composed
  * aggregate() form on every edge the composed form defines — that
  * equivalence is what lets x96 keep its hand-written DuckDB oracle
  * while running the fast path. */
class SimHashMd5Spec extends SparkSpec {
  import spark.implicits._

  private def both(toks: Seq[Seq[String]], bits: Int) = {
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    df.select(col("id"),
        graft.functions.expr.SimHashMd5(col("toks"), bits).as("native"),
        T.simhashFromTokens(col("toks"), bits).as("composed"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("native == composed at 16 and 32 bits, including unicode and single tokens") {
    val fixtures = Seq(
      Seq("the", "cat", "sat"),
      Seq("ABCDEF01", "12345678", "ABCDEF01"),
      Seq("héllo", "wörld", "日本語"),
      Seq("x"),
      (1 to 200).map(i => s"tok$i"))
    for (bits <- Seq(16, 32); r <- both(fixtures, bits))
      assert(r._2 == r._3, s"bits=$bits id=${r._1}: ${r._2} != ${r._3}")
  }

  test("edge semantics follow the composed form: empty -> 0, codegen == interpreted") {
    val r = both(Seq(Seq.empty[String]), 32)
    assert(r.head._2 == 0L && r.head._3 == 0L)
    // null element: composed decrements every tally; prove equivalence
    val df = Seq(1L).toDF("id")
      .select(expr("array('a', cast(null as string), 'b')").as("toks"))
    val out = df.select(
        graft.functions.expr.SimHashMd5(col("toks"), 32).as("n"),
        T.simhashFromTokens(col("toks"), 32).as("c"))
      .collect().head
    assert(out.getLong(0) == out.getLong(1))
    // interpreted path (eval) must equal the codegen'd result
    val toks = Seq("alpha", "beta", "gamma")
    val viaSql = spark.sql(
      s"SELECT simhash_md5(array(${toks.map(t => s"'$t'").mkString(",")}), 32)")
      .collect().head.getLong(0)
    val interp = graft.functions.expr.SimHashMd5
      .compute(new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray
          .asInstanceOf[Array[Any]]), 32)
    assert(viaSql == interp)
  }
}
