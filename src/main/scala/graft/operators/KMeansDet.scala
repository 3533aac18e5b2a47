package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Deterministic Lloyd's k-means over `Array[Float]` embedding columns —
  * every arithmetic step is chosen so an independent engine (the DuckDB
  * oracle) reproduces the SAME final assignment, which is what makes
  * clustering usable as a *candidate-generation block* for semantic dedup
  * (SemDeDup, Abbas et al. 2023) and as an oracle-checkable coarse
  * quantizer for IVF-style recall audits — places where MLlib's KMeans
  * (thread-order-dependent reductions, engine-private init) cannot be
  * cross-checked row-for-row.
  *
  * Determinism contract:
  *   - init: centroids are the vectors of the `k` smallest ids (cell id =
  *     rank in that order) — no RNG, no engine-private seeding;
  *   - assignment: argmin of squared L2 `dot(v,v) − 2·dot(v,c) + dot(c,c)`
  *     with ties broken by smallest cell id (`min(struct(dist, cell))`);
  *   - update: element-wise mean, each component rounded to 6 decimals —
  *     the rounding absorbs partition-order float-sum noise (~1e-13
  *     relative) so the next iteration's distances are computed from
  *     bit-identical centroids on ANY partitioning or engine;
  *   - an emptied cell keeps its previous centroid (never NaN, never a
  *     re-seed).
  *
  * Scale shape (100 TB): per iteration, assignment is ONE broadcast pass
  * (k·d doubles ride to every task; argmin is a map-side-combinable
  * `min(struct)`), and the mean update shuffles only the partially
  * aggregated (cell, dim) sums — k·d rows per map partition, NOT the
  * corpus. The only driver materialization is the k-row centroid frame
  * per iteration (certified small: k·d doubles — the same contract as
  * BPE's K-row merge table). Fitting on a deterministic sample at very
  * large N is the caller's composition: pre-filter the fit frame with an
  * md5-bucket predicate (the [[IvfSearch.build]] device) and pass the
  * full frame to [[assign]].
  */
object KMeansDet {

  /** Final centroids; index in the array IS the cell id. */
  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def centroidFrame(df: DataFrame, m: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    m.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("_cell", "_c")
  }

  /** Squared L2 in the exact operator order the oracle restates:
    * dot(v,v) − 2·dot(v,c) + dot(c,c), left-to-right. */
  private def sqDist(v: Column, c: Column): Column =
    V.dot(v, v) - lit(2.0) * V.dot(v, c) + V.dot(c, c)

  /** One argmin-assignment pass: (id, v, cell). Broadcast centroids →
    * map-side-only candidate expansion (k rows per input row) →
    * map-side-combinable `min(struct(dist, cell))`. */
  private def assignPass(e: DataFrame, m: Model): DataFrame =
    e.crossJoin(broadcast(centroidFrame(e, m)))
      .withColumn("_d", sqDist(col("_v"), col("_c")))
      .groupBy(col("_id"))
      .agg(min(struct(col("_d"), col("_cell"))).as("_m"),
           first(col("_v")).as("_v")) // _v is constant per _id
      .select(col("_id"), col("_v"), col("_m._cell").as("_cell"))

  /** Fit `iters` Lloyd iterations from the deterministic id-rank init.
    * Each iteration runs one assignment pass and one rounded-mean update;
    * the k-row centroid collect per iteration is the certified-small
    * driver materialization documented above. */
  def fit(corpus: DataFrame, k: Int, iters: Int, idCol: String = "vec_id",
          vecCol: String = "embedding"): Model = {
    val e = corpus.select(col(idCol).as("_id"),
                          V.toDouble(col(vecCol)).as("_v"))
    // orderBy + limit: rows arrive in ascending-id order (global sort)
    val init = e.orderBy(col("_id")).limit(k).collect()
    require(init.length == k,
      s"kmeans init needs >= $k rows, got ${init.length}")
    var m = Model(init.map(_.getSeq[Double](1).toArray))
    for (_ <- 1 to iters) {
      val means = assignPass(e, m)
        .select(col("_cell"), posexplode(col("_v")).as(Seq("_p", "_x")))
        .groupBy(col("_cell"), col("_p"))
        .agg(round(avg(col("_x")), 6).as("_mv"))
        .groupBy(col("_cell"))
        .agg(transform(array_sort(collect_list(struct(col("_p"), col("_mv")))),
               t => t.getField("_mv")).as("_c"))
        .collect() // certified small: <= k rows of d doubles
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      m = Model(m.centroids.indices
        .map(i => means.getOrElse(i, m.centroids(i))).toArray)
    }
    m
  }

  /** Label every row with its nearest-centroid cell: (idCol, cell). */
  def assign(corpus: DataFrame, m: Model, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    assignPass(corpus.select(col(idCol).as("_id"),
                             V.toDouble(col(vecCol)).as("_v")), m)
      .select(col("_id").as(idCol), col("_cell").cast("long").as("cell"))

  /** [[assign]] keeping the double vector and its norm — the shape the
    * within-cell similarity passes (x126/x127) consume. */
  def assignWithVec(corpus: DataFrame, m: Model, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame =
    assignPass(corpus.select(col(idCol).as("_id"),
                             V.toDouble(col(vecCol)).as("_v")), m)
      .select(col("_id").as(idCol), col("_cell").cast("long").as("cell"),
              col("_v").as("v"), V.norm(col("_v")).as("nrm"))
}
