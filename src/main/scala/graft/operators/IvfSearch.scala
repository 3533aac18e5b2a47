package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** IVF-style approximate nearest neighbor search: a KMeans coarse
  * quantizer partitions the corpus into `nlist` cells; each query probes
  * only the `nprobe` cells whose centroids are closest, then brute-forces
  * within them.
  *
  * Scale shape: the index build is one ML fit (sampled at very large N) +
  * one labeling pass; the corpus can then be WRITTEN PARTITIONED BY cell,
  * so at query time only `nprobe/nlist` of the data is scanned — the same
  * pruning a vector database does, expressed as ordinary partition pruning.
  * Centroids are tiny (nlist × dims) and ride along as a broadcast. */
object IvfSearch {

  final case class Index(cells: DataFrame, centroids: Array[(Int, Array[Double])])

  /** Build: fit KMeans (fixed seed) and label every corpus row with its
    * cell id.
    *
    * @param fitSampleBuckets when < 256, the quantizer is FIT on a
    *        deterministic md5-bucket sample (`fitSampleBuckets`/256 of
    *        the corpus) and only the cheap labeling pass reads every
    *        row — the 100 TB shape, where fitting on the full corpus
    *        would put the iterative KMeans inner loop over all data.
    *        Cell quality degrades gracefully (centroids from a uniform
    *        sample converge to the same density optima); recall is the
    *        tunable, via `nprobe`. The md5 bucket keys on the row id, so
    *        the sample — and therefore the index — is reproducible on
    *        any partitioning. */
  def build(corpus: DataFrame, nlist: Int, idCol: String = "vec_id",
            vecCol: String = "embedding", seed: Long = 42L,
            fitSampleBuckets: Int = 256): Index = {
    val feat = corpus.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("_features"))
    val sampled =
      if (fitSampleBuckets >= 256) feat
      else feat.filter(
        conv(substring(md5(concat(lit("ivf:"), col(idCol))), 1, 2), 16, 10)
          .cast("int") < fitSampleBuckets)
    // a small corpus with an aggressive sample fraction can yield fewer
    // sample rows than nlist, which fails deep inside MLlib with an
    // opaque error — fall back to fitting on the full frame (cheap at
    // that size; the sample exists to bound fit cost on LARGE corpora)
    val fitSet =
      if (fitSampleBuckets >= 256) sampled
      else if (sampled.limit(nlist).count() < nlist) feat
      else sampled
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("_features").setPredictionCol("_cell").fit(fitSet)
    val cells = model.transform(feat).drop("_features")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c: Vector, i) => (i, c.toArray) }
    Index(cells, centroids)
  }

  /** Query: nearest `nprobe` centroids per query (computed against the
    * broadcast centroid array), then cosine top-k within the probed cells. */
  def search(index: Index, queries: DataFrame, k: Int, nprobe: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.toSeq
      .map { case (i, arr) => (i, arr) }.toDF("_cell", "_centroid")
    // distance of every query to every centroid (centroid side is tiny →
    // broadcast), keep the nprobe closest cells per query
    val qc = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
      .crossJoin(broadcast(cents))
      .withColumn("_dist",
        V.dot(col("_qv"), col("_qv")) - lit(2.0) * V.dot(col("_qv"), col("_centroid")) +
          V.dot(col("_centroid"), col("_centroid")))
      .withColumn("_cr", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("_dist").asc, col("_cell").asc)))
      .filter(col("_cr") <= nprobe)
      .select(col("qid"), col("_qv"), col("_cell"))
    // brute-force inside the probed cells only
    val cand = index.cells.select(col("_cell"), col(idCol).as("nid"),
      col(vecCol).as("_nv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    qc.join(cand, Seq("_cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", V.cosine(col("_qv"), col("_nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
