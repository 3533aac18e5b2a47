package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{VectorFunctions => V}

class VecDotSpec extends SparkSpec {

  private def floats(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("native vec_dot is bit-identical to the composed HOF fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(V.dot(col("a"), col("b"))).as[Double].collect()
    val want = df.select(V.dotComposed(col("a"), col("b")))
      .as[Double].collect()
    // bit-identical, not approximately equal: same widen + same fold order
    assert(got.map(java.lang.Double.doubleToLongBits(_)).toSeq ==
           want.map(java.lang.Double.doubleToLongBits(_)).toSeq)
  }

  test("length mismatch and null element yield null (zip_with semantics)") {
    import spark.implicits._
    val df = Seq(
      (floats(1, 2), floats(1, 2, 3)),                   // length mismatch
      (floats(1, 2, 3), floats(4, 5, 6))                 // clean
    ).toDF("a", "b")
    val out = df.select(V.dot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(None, Some(32.0)))

    val withNullElem = Seq(Tuple2(Seq[java.lang.Float](1.0f, null, 3.0f),
                                  Seq[java.lang.Float](1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
    assert(withNullElem.select(V.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("codegen and interpreted paths agree; double arrays accepted") {
    import spark.implicits._
    val df = Seq((Seq(0.5d, -1.25d, 3.0d), floats(2, 4, 8))).toDF("a", "b")
    def run() = df.select(V.dot(col("a"), col("b"))).as[Double].head()
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = run()
      assert(java.lang.Double.doubleToLongBits(withCodegen) ==
             java.lang.Double.doubleToLongBits(interpreted))
      assert(withCodegen == 0.5 * 2 + -1.25 * 4 + 3.0 * 8)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
