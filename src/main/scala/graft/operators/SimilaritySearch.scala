package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths with the same output shape (qid, rank, nid, cos):
  *  - [[bruteForceTopK]]: exact; broadcast the (small) query set against
  *    the corpus — a map-side O(|Q|·N) scan with a per-query top-k window.
  *    The baseline and the verifier for the approximate path.
  *  - [[lshTopK]]: sign-bit LSH buckets; each query only scans its own
  *    bucket. At 1000 executors the corpus is bucketed once (one shuffle),
  *    then lookups are bucket-local — the scale path. Recall is tunable
  *    via `planes` (fewer planes → bigger buckets → higher recall).
  */
object SimilaritySearch {

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("_nv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    broadcast(q).join(c, col("nid") =!= col("qid"))
      .withColumn("cos", V.cosine(col("_qv"), col("_nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dims: Int,
              planes: Int = 6, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"),
      V.lshBucket(col(vecCol), planes, dims).as("_bucket"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("_nv"),
      V.lshBucket(col(vecCol), planes, dims).as("_cbucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    broadcast(q)
      .join(c, col("_bucket") === col("_cbucket") && col("nid") =!= col("qid"))
      .withColumn("cos", V.cosine(col("_qv"), col("_nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
