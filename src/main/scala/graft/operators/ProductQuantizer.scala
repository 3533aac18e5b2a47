package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) on the deterministic
  * [[KMeansDet]] codebooks — the 100 TB vector-search compression step:
  * a d-dim vector becomes `m` small codes (here 4 × 3 bits), and query
  * distance is evaluated against codes via per-subspace lookup tables
  * (ADC), never against the raw vectors.
  *
  * Determinism: every codebook is a KMeansDet fit (id-rank init, pinned
  * tie-breaks, 6-dp-rounded means), so the CODES themselves are
  * oracle-checkable (x129), and the ADC recall audit (x130) measures the
  * quantization recall loss against the exact top-k with both arms
  * restated in SQL.
  *
  * Scale shape: fitting is m independent small-k fits; encoding is ONE
  * codegen'd projection over the corpus (no join, no shuffle — the same
  * literal-argmin device as the k ≤ 16 assignment pass, m·k branches);
  * the ADC scan reads only (id, m codes) — the 4-byte-per-vector scan
  * that makes billion-vector search feasible — plus a driver-side
  * m·k·(d/m) literal LUT that rides into codegen. */
object ProductQuantizer {

  /** Per-subspace codebooks; `subDim` = d/m dims per subspace. */
  final case class Model(sub: Array[KMeansDet.Model], subDim: Int) {
    def m: Int = sub.length
  }

  /** Fit one [[KMeansDet]] codebook per subspace slice. */
  def fit(corpus: DataFrame, m: Int, k: Int, iters: Int, dims: Int,
          idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    require(dims % m == 0, s"dims=$dims not divisible into m=$m subspaces")
    // encode/encodeWithCell/adcDist always use the literal argmin / LUT
    // form (unlike KMeansDet.assignPass, which switches to a broadcast
    // join above LiteralFormMaxK to dodge the measured Janino codegen
    // cliff) — so fail loud here rather than hand a large-k caller the
    // 7x interpreted fallback or multi-second codegen.
    require(k <= KMeansDet.LiteralFormMaxK,
      s"ProductQuantizer supports k <= ${KMeansDet.LiteralFormMaxK} " +
      s"(literal codebook form), got k=$k; use KMeansDet directly for " +
      "large-k clustering")
    val sd = dims / m
    val subs = (0 until m).map { j =>
      KMeansDet.fit(
        corpus.select(col(idCol),
                      slice(col(vecCol), j * sd + 1, sd).as("_sub")),
        k, iters, idCol, "_sub")
    }
    Model(subs.toArray, sd)
  }

  /** Encode every vector as m code columns c0..c{m-1} — one codegen'd
    * projection, no join, no shuffle. */
  def encode(corpus: DataFrame, model: Model, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val v = V.toDouble(col(vecCol))
    val codes = model.sub.zipWithIndex.map { case (km, j) =>
      val s = slice(v, j * model.subDim + 1, model.subDim)
      KMeansDet.argminCell(km, s, V.dot(s, s)).cast("long").as(s"c$j")
    }
    corpus.select(col(idCol) +: codes.toIndexedSeq: _*)
  }

  /** [[encode]] plus a coarse-quantizer cell label, still ONE projection
    * — the (vec_id, cell, c0..c{m-1}) serving index of x131, built
    * without the vec_id self-join of two separate labeling passes. At
    * scale this single pass is what gets written PARTITIONED BY cell. */
  def encodeWithCell(corpus: DataFrame, model: Model,
                     coarse: KMeansDet.Model, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val v = V.toDouble(col(vecCol))
    val cell = KMeansDet.argminCell(coarse, v, V.dot(v, v))
      .cast("long").as("cell")
    val codes = model.sub.zipWithIndex.map { case (km, j) =>
      val s = slice(v, j * model.subDim + 1, model.subDim)
      KMeansDet.argminCell(km, s, V.dot(s, s)).cast("long").as(s"c$j")
    }
    corpus.select(col(idCol) +: cell +: codes.toIndexedSeq: _*)
  }

  /** Asymmetric (ADC) squared-L2 distance from widened query vector `qv`
    * to the encoded point whose code columns c0..c{m-1} are in scope:
    * Σ_j [dot(q_j,q_j) − 2·dot(q_j,c) + dot(c,c)] with c looked up from
    * the literal codebook by the code — summed left-to-right, the order
    * the oracle restates. */
  def adcDist(model: Model, qv: Column): Column = {
    val terms = model.sub.zipWithIndex.map { case (km, j) =>
      val qs = slice(qv, j * model.subDim + 1, model.subDim)
      val lut = typedlit(km.centroids.map(_.toSeq).toSeq)
      val c = element_at(lut, col(s"c$j").cast("int") + 1)
      V.dot(qs, qs) - lit(2.0) * V.dot(qs, c) + V.dot(c, c)
    }
    terms.reduceLeft(_ + _)
  }
}
