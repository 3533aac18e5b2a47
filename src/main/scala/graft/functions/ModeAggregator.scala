package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Deterministic mode as a typed `Aggregator` UDAF — the custom-UDAF form
  * of `AggOps.modeDeterministic` (SURVEY §2.1: `mode_map`,
  * reference etl_payroll_pipeline.py:215-217). Ties break to the SMALLEST
  * value, nulls are ignored, an all-null group yields null — pandas
  * `value_counts().idxmax()` parity with a pinned tie order.
  *
  * Scale: the buffer is a value→count map, merged associatively — Spark
  * runs it as an ObjectHashAggregate with map-side partial aggregation,
  * so each partition ships one buffer per group, not its rows. Buffer
  * size is bounded by the group's DISTINCT-value count; for the
  * low-cardinality categorical columns mode is used on (segments,
  * departments) that is tiny. The composed window form
  * (AggOps.modeDeterministic) stays the default — this exists to cover
  * the engine's custom-UDAF surface and the one reference helper whose
  * composition a user might reject. */
object ModeAggregator extends Aggregator[String, Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) buf else buf.updated(v, buf.getOrElse(v, 0L) + 1L)

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    small.foldLeft(large) { case (acc, (k, n)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + n)
    }
  }

  override def finish(buf: Map[String, Long]): String =
    if (buf.isEmpty) null
    else buf.minBy { case (v, n) => (-n, v) }._1

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
