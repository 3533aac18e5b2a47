package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** PQ contract tests: the one-projection encoder must agree with the
  * definitional per-subspace assign composition, survive repartitioning,
  * and the ADC lookup arithmetic must reproduce the exact distance when a
  * point sits ON its codebook entries. */
class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private lazy val corpus = (0L until 40L)
    .map(i => i -> Seq.tabulate(dims)(d =>
      (((i * 7 + d * 3) % 11).toFloat - 5f) / 3f))
    .toDF("vec_id", "embedding")

  test("encode == per-subspace KMeansDet.assign composition") {
    val m = ProductQuantizer.fit(corpus, m = 2, k = 4, iters = 2, dims = dims)
    val enc = ProductQuantizer.encode(corpus, m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0 until 2).foreach { j =>
      val sliced = corpus.select(col("vec_id"),
        slice(col("embedding"), j * m.subDim + 1, m.subDim).as("_sub"))
      val asg = KMeansDet.assign(sliced, m.sub(j), "vec_id", "_sub")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      corpus.select("vec_id").collect().map(_.getLong(0)).foreach { id =>
        val got = if (j == 0) enc(id)._1 else enc(id)._2
        assert(got == asg(id), s"vec $id subspace $j")
      }
    }
  }

  test("codes are invariant under repartitioning") {
    val m = ProductQuantizer.fit(corpus, 2, 4, 2, dims)
    val a = ProductQuantizer.encode(corpus, m)
      .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
    val b = ProductQuantizer.encode(corpus.repartition(7), m)
      .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("ADC equals the exact distance for a point lying on its codebook entries") {
    val m = ProductQuantizer.fit(corpus, 2, 4, 2, dims)
    // a synthetic point whose two subvectors ARE codebook entries (1, 2)
    val onGrid = m.sub(0).centroids(1) ++ m.sub(1).centroids(2)
    val q = Seq(0.25f, -1f, 2f, 0.5f, -0.75f, 1.5f, 0f, 3f)
    val row = Seq(("q", q.map(_.toDouble), 1L, 2L))
      .toDF("tag", "qv", "c0", "c1")
    val adc = row.select(
      ProductQuantizer.adcDist(m, col("qv")).as("adc")).head().getDouble(0)
    val qd = q.map(_.toDouble).toArray
    val exact = qd.zip(onGrid).foldLeft(0.0) { case (acc, (a, b)) =>
      acc + (a - b) * (a - b)
    }
    assert(math.abs(adc - exact) < 1e-9,
      s"adc=$adc exact=$exact") // forms differ only by FP regrouping
  }

  test("fit fails loud beyond the literal-codebook k bound") {
    // encode/adcDist are literal-form only; k above LiteralFormMaxK
    // would hit the measured Janino codegen cliff — require, not limp.
    val e = intercept[IllegalArgumentException] {
      ProductQuantizer.fit(corpus, m = 2, k = 17, iters = 1, dims = dims)
    }
    assert(e.getMessage.contains("k <= 16"))
  }
}
