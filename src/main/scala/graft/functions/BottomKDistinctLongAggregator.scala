package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Exact k smallest DISTINCT longs per group, merge-closed.
  *
  * The dedup-aware sibling of [[BottomKAggregator]]: where that keeps the
  * k smallest (key, id) pairs of a stream already known to be duplicate-
  * free, this one answers "the first k distinct ids" over an input that
  * repeats them — x34's posting caps, where a term can occur many times
  * per document and astronomically often corpus-wide. `collect_set` then
  * `slice` is the single-buffer form: one stopword's buffer holds EVERY
  * matching document id before the slice throws all but k away. Here the
  * buffer never exceeds k values, so Spark runs an ObjectHashAggregate
  * with map-side partials and each partition ships ≤ k longs per group.
  *
  * Merge re-selects the smallest k of the distinct union — associative,
  * commutative, and duplicate-absorbing — so the result is independent of
  * partitioning and merge order. `finish` emits ascending: exactly
  * `slice(sort_array(collect_set(v)), 1, k)`.
  */
class BottomKDistinctLongAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], v: Long): Seq[Long] =
    // common case: buffer full and v can't displace anything (covers
    // v already present at the max, too)
    if (buf.length == k && buf.last <= v) buf
    else if (buf.contains(v)) buf
    else (buf :+ v).sorted.take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
