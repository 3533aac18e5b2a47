package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded-memory heavy hitters — the SpaceSaving summary (Metwally,
  * Agrawal & El Abbadi, "Efficient computation of frequent and top-k
  * elements in data streams", ICDT 2005): at most `capacity` counters per
  * group, each an OVERESTIMATE of the item's true count by at most its
  * recorded error. This is the per-group top-k you can still afford when
  * the value domain (URLs, domains, shingles) is too large to
  * hash-aggregate exactly: the buffer is O(capacity) regardless of input
  * size and merges associatively, so Spark runs it as an
  * ObjectHashAggregate with map-side partials — each partition ships one
  * bounded summary per group, never its rows.
  *
  * Exactness contract: while a group's distinct-value count stays ≤
  * `capacity`, no eviction happens anywhere, every error is 0 and counts
  * are exact — the regime the x58 oracle runs in. Beyond capacity, counts
  * remain overestimates (an insert over a full buffer evicts the smallest
  * counter and inherits its count as error) but the kept set depends on
  * arrival order, as with any streaming summary. The merge sums counters
  * pointwise and truncates to the `capacity` largest (count desc, item
  * asc), which preserves the overestimate property for every retained
  * item.
  *
  * Emits the `emitK` largest retained counters as (item, count, error),
  * ordered count desc with ties to the smallest item.
  */
class SpaceSavingAggregator(capacity: Int, emitK: Int)
    extends Aggregator[String, Map[String, (Long, Long)],
                       Seq[(String, Long, Long)]] {
  require(capacity >= 1 && emitK >= 1)

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(buf: Map[String, (Long, Long)],
                      v: String): Map[String, (Long, Long)] =
    if (v == null) buf
    else buf.get(v) match {
      case Some((c, e)) => buf.updated(v, (c + 1L, e))
      case None if buf.size < capacity => buf.updated(v, (1L, 0L))
      case None =>
        // evict the smallest counter (ties: smallest item — a fixed rule,
        // so single-partition replays are reproducible)
        val (mk, (mc, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        (buf - mk).updated(v, (mc + 1L, mc))
    }

  override def merge(a: Map[String, (Long, Long)],
                     b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val m = (a.keySet ++ b.keySet).iterator.map { k =>
      val (ca, ea) = a.getOrElse(k, (0L, 0L))
      val (cb, eb) = b.getOrElse(k, (0L, 0L))
      k -> (ca + cb, ea + eb)
    }.toMap
    if (m.size <= capacity) m
    else m.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      .take(capacity).toMap
  }

  override def finish(buf: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    buf.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }
      .take(emitK)

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    ExpressionEncoder[Map[String, (Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}
