package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter prefiltered semi join — the 100 TB pattern for "keep fact
  * rows whose key exists in another large table" when the key set is too
  * big to broadcast as an exact set but a few hundred MB of bloom bits
  * still fit on every executor.
  *
  * Dataflow: (1) one pass over the right side builds a bloom filter of its
  * keys (`DataFrameStatFunctions.bloomFilter` — a treeAggregate, no
  * collect of data rows); (2) the filter is broadcast and applied map-side
  * on the left, discarding the overwhelming majority of non-matching rows
  * BEFORE the shuffle; (3) a normal left-semi join removes the bloom's
  * false positives. The result is therefore EXACTLY the semi join — the
  * bloom only shrinks the shuffled volume (by ~(1-sel)·(1-fpp)), it never
  * changes the answer. This is the manual twin of Spark's runtime bloom
  * filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`), usable
  * when the optimizer's size heuristics won't fire.
  */
object BloomOps {

  /** `left WHERE leftKey IN (SELECT rightKey FROM right)`, with a bloom
    * prefilter on the left side. `expectedItems`/`fpp` size the filter
    * (n·ln(1/fpp)/ln²2 bits ≈ 9.6 MB for 10⁷ keys at 1% fpp). Keys must
    * be integral (long) — the common surrogate/fact-key case. */
  def bloomPrefilterSemiJoin(left: DataFrame, right: DataFrame,
                             leftKey: String, rightKey: String,
                             expectedItems: Long = 1000000L,
                             fpp: Double = 0.01): DataFrame = {
    val bf = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val bcast = left.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    left.filter(mightContain(col(leftKey)))
      .join(right.select(col(rightKey).as(leftKey)),
            Seq(leftKey), "left_semi")
  }
}
