package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Exact bottom-k by a sortable (key, id) pair, merge-closed.
  *
  * The window form of per-group top/bottom-k (`row_number` over
  * `partitionBy(group)`) shuffles EVERY row into its group's partition
  * before ranking — correct, but the exchange carries the whole input.
  * This aggregator keeps at most k pairs per partial buffer, so Spark
  * runs it as an ObjectHashAggregate with map-side partials: each
  * partition ships ≤ k rows per group through the shuffle regardless of
  * input size — the scalable form of fixed-size per-stratum selection
  * (x65's min-wise sample at corpus scale).
  *
  * Exact and deterministic: buffers hold the lexicographically smallest
  * k (key, id) pairs; merge = re-select smallest k of the union, which is
  * associative and commutative, so the result is independent of
  * partitioning and merge order (ids break key ties). `finish` emits
  * ascending — element i is rank i+1.
  */
class BottomKAggregator(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)],
                       Seq[(String, Long)]] {
  require(k >= 1)

  private val ord = Ordering[(String, Long)]

  private def best(s: Seq[(String, Long)]): Seq[(String, Long)] =
    s.sorted(ord).take(k)

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(buf: Seq[(String, Long)],
                      v: (String, Long)): Seq[(String, Long)] =
    if (v._1 == null) buf
    // common case: buffer full and the new pair can't displace anything
    else if (buf.length == k && ord.lteq(buf.last, v)) buf
    else best(buf :+ v)

  override def merge(a: Seq[(String, Long)],
                     b: Seq[(String, Long)]): Seq[(String, Long)] =
    if (a.isEmpty) b else if (b.isEmpty) a else best(a ++ b)

  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
