package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for big–big equi-joins.
  *
  * AQE's skew-join split (enabled in Sessions.tuned) handles most skew at
  * runtime; explicit salting remains the tool when one join key dominates
  * so heavily that even split partitions bottleneck, or when a stable plan
  * is preferred over runtime re-planning. Technique: the left (large,
  * skewed) side gets a deterministic salt in [0, buckets); the right side
  * is replicated once per salt value; the join key becomes (key, salt), so
  * a hot key's rows spread across `buckets` reducers.
  *
  * Cost model: right side × buckets rows shuffled — use when
  * |right| × buckets ≪ |left|'s hot-key mass. Deterministic: the salt
  * derives from hashing the left row's other columns, not from rand(). */
object SkewOps {

  /** Left equi-join with salting. `saltFrom` should be column(s) roughly
    * unique per left row (an id, an ordinal) so the salt distributes
    * uniformly and reproducibly. */
  def saltedLeftJoin(left: DataFrame, right: DataFrame, key: String,
                     buckets: Int, saltFrom: Seq[Column]): DataFrame = {
    val l = left.withColumn("_salt", pmod(hash(saltFrom: _*), lit(buckets)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "_salt"), "left").drop("_salt")
  }
}
