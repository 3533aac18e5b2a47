package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The x132 mergeable quantile sketch's integer bucket algebra, shared by
  * the batch query and the streaming twin: a positive cents value
  * collapses to bucket b = digits·1000 + its leading three digits (values
  * of ≤ 3 digits are stored exactly), so the sketch is pure integer math
  * (cross-engine exact — the leading digits come from a SUBSTRING of the
  * decimal rendering, no FP division anywhere), mergeable by count
  * addition, bounded at ~9·900 buckets, and its bucket-upper-bound
  * estimate carries relative error ≤ 1/m ≤ 1%.
  *
  * Signed values: all non-positive cents collapse into bucket 0 with
  * estimate 0 — still an upper bound, but with NO precision. Callers
  * sketching signed quantities split by sign (sketch the negated
  * negatives separately) rather than feeding them through. */
object QuantileSketchOps {

  /** Bucket id for a BIGINT cents column (the oracle's
    * `c // pow(10, digits-3)` — identical to the leading-3-digit
    * substring for positive c). */
  def bucketOf(c: Column): Column = {
    val s = c.cast("string")
    val d = length(s).cast("long")
    when(c <= 0, lit(0L))
      .when(d <= 3, d * 1000 + c)
      .otherwise(d * 1000 + substring(s, 1, 3).cast("long"))
  }

  /** Upper bound (in cents) of bucket `b` — the quantile estimate.
    * pow(10, k) for k ≤ 12 is exact in double, so the cast is exact. */
  def upperBound(b: Column): Column = {
    val d = floor(b / 1000).cast("long")
    val m = b % 1000
    when(d <= 3, m)
      .otherwise((m + 1) * pow(lit(10.0), (d - 3).cast("double"))
        .cast("long") - 1)
  }
}
