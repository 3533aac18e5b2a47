package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.functions.expr.SimHash64

class SimHash64Spec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    SimHash64.register(spark)
  }

  private def referenceSimhash(tokens: Seq[String], bits: Int): Long = {
    val counts = new Array[Int](bits)
    tokens.foreach { t =>
      val h = XXH64.hashUTF8String(UTF8String.fromString(t), 0L)
      (0 until bits).foreach { j =>
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      }
    }
    (0 until bits).foldLeft(0L)((acc, j) =>
      if (counts(j) > 0) acc | (1L << j) else acc)
  }

  test("matches the reference computation; empty array → 0") {
    import spark.implicits._
    val toks = Seq("alpha", "beta", "gamma", "alpha")
    val out = Seq(Tuple1(toks), Tuple1(Seq.empty[String])).toDF("t")
      .select(SimHash64(col("t"), 64).as("sh")).as[Long].collect()
    assert(out(0) == referenceSimhash(toks, 64))
    assert(out(1) == 0L)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("x", "y", "z"))).toDF("t")
    def run() = df.select(SimHash64(col("t"), 32)).as[Long].head()
    val cg = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run()
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    assert(cg == interp)
  }

  test("near-identical token multisets land within small hamming distance") {
    import spark.implicits._
    val a = (1 to 40).map(i => s"tok$i")
    val b = a.updated(5, "CHANGED")
    val c = (1 to 40).map(i => s"other$i")
    val out = Seq(Tuple1(a), Tuple1(b), Tuple1(c)).toDF("t")
      .select(SimHash64(col("t"), 64)).as[Long].collect()
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(out(0), out(1)) < ham(out(0), out(2)))
  }

  test("SQL surface resolves simhash64") {
    val viaSql = spark.sql("SELECT simhash64(array('a','b'), 16)").head.getLong(0)
    assert(viaSql == referenceSimhash(Seq("a", "b"), 16))
  }
}
