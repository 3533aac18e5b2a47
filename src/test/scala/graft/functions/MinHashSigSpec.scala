package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.functions.expr.MinHashSig

class MinHashSigSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    MinHashSig.register(spark)
  }

  private val K = 8

  private def referenceSig(shingles: Seq[String]): Seq[Long] =
    (0 until K).map { j =>
      shingles.map(s =>
        XXH64.hashUTF8String(UTF8String.fromString(s), j.toLong)).min
    }

  test("matches a reference computation (codegen path)") {
    import spark.implicits._
    val shingles = Seq("the quick brown", "quick brown fox", "brown fox jumps")
    val out = Seq(Tuple1(shingles)).toDF("sh")
      .select(MinHashSig(col("sh"), K).as("sig"))
      .as[Seq[Long]].head()
    assert(out == referenceSig(shingles))
  }

  test("codegen and interpreted paths agree; empty/null arrays yield null") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", "b", "c")), Tuple1(Seq.empty[String]))
      .toDF("sh")
    def run() = df.select(MinHashSig(col("sh"), 4).as("sig")).collect()
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(withCodegen.map(_.toString).toSeq == interpreted.map(_.toString).toSeq)
    assert(withCodegen(1).isNullAt(0)) // empty array → null signature
  }

  test("SQL surface: minhash_sig resolves via the function registry") {
    val r = spark.sql(
      "SELECT minhash_sig(array('x','y'), 4) AS sig").head.getSeq[Long](0)
    assert(r == referenceSig(Seq("x", "y")).take(0) ++
      (0 until 4).map(j => Seq("x", "y").map(s =>
        XXH64.hashUTF8String(UTF8String.fromString(s), j.toLong)).min))
  }

  test("identical shingle sets produce identical signatures (near-dup core)") {
    import spark.implicits._
    val a = Seq("s1", "s2", "s3")
    val out = Seq(Tuple1(a), Tuple1(a.reverse)).toDF("sh")
      .select(MinHashSig(col("sh"), K).as("sig")).as[Seq[Long]].collect()
    assert(out(0) == out(1)) // order-insensitive by construction
  }

  test("one-pass expression is faster than the k-pass md5 composition") {
    import spark.implicits._
    val docs = (0 until 2000).map { i =>
      (i.toLong, (0 until 60).map(w => s"w${(i * 31 + w * 7) % 997}").mkString(" "))
    }.toDF("doc_id", "text").cache()
    docs.count()
    val sh = TextFunctions.shingles(col("text"), 3)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths, then time; min-of-3 per arm so a box-load spike
    // during any single pass can't flip the comparison (a load flake
    // here costs a whole suite re-run)
    docs.select(MinHashSig(sh, 8)).count()
    docs.select(TextFunctions.minhashSignature(col("text"), 3, 8)).count()
    val fast = (1 to 3).map(_ =>
      time { docs.select(MinHashSig(sh, 8)).count() }).min
    val composed = (1 to 3).map(_ => time {
      docs.select(TextFunctions.minhashSignature(col("text"), 3, 8)).count()
    }).min
    info(f"one-pass: $fast%.3fs, composed md5: $composed%.3fs")
    assert(fast < composed, f"expected one-pass ($fast%.3f) < composed ($composed%.3f)")
    docs.unpersist()
  }
}
