package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: distinct ≤ capacity → counts match groupBy exactly, all errors 0") {
    val data = Seq("a", "a", "a", "b", "b", "c").flatMap(x => Seq(x, x)) ++
      Seq("d")
    val hh = udaf(new SpaceSavingAggregator(capacity = 8, emitK = 10),
                  org.apache.spark.sql.Encoders.STRING)
    val out = data.toDF("v").repartition(5)
      .agg(hh(col("v")).as("hh"))
      .select(explode(col("hh"))).select("col._1", "col._2", "col._3")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 6L), ("b", 4L), ("c", 2L), ("d", 1L))
      .map { case (k, c) => (k, c, 0L) })
  }

  test("exact regime is invariant under repartitioning") {
    val data = (1 to 200).map(i => s"t${i % 7}")
    val hh = udaf(new SpaceSavingAggregator(capacity = 16, emitK = 3),
                  org.apache.spark.sql.Encoders.STRING)
    def run(parts: Int) = data.toDF("v").repartition(parts)
      .agg(hh(col("v")).as("hh")).select(explode(col("hh")))
      .select("col._1", "col._2").as[(String, Long)].collect().toSeq
    assert(run(1) === run(13))
  }

  test("eviction: the incoming item inherits the evicted count as its error (overestimate bound)") {
    val agg = new SpaceSavingAggregator(capacity = 2, emitK = 10)
    // single-counter stream, applied in a fixed order
    val buf = Seq("a", "a", "a", "b", "c")
      .foldLeft(agg.zero)(agg.reduce)
    // c evicted b (count 1): c's count 2 overestimates its true count 1
    // by exactly err 1; a is untouched
    assert(agg.finish(buf) === Seq(("a", 3L, 0L), ("c", 2L, 1L)))
  }

  test("merge sums counters pointwise and truncates to the capacity largest") {
    val agg = new SpaceSavingAggregator(capacity = 2, emitK = 10)
    val a = Map("x" -> ((5L, 0L)), "y" -> ((2L, 1L)))
    val b = Map("x" -> ((4L, 0L)), "z" -> ((3L, 0L)))
    // pointwise: x=9, z=3, y=2(+err) → capacity 2 keeps x and z
    assert(agg.finish(agg.merge(a, b)) ===
      Seq(("x", 9L, 0L), ("z", 3L, 0L)))
    // merging with an empty buffer is the identity
    assert(agg.merge(agg.zero, a) === a)
    assert(agg.merge(a, agg.zero) === a)
  }

  test("nulls are ignored; ties in the emitted ranking break to the smallest item") {
    val agg = new SpaceSavingAggregator(capacity = 8, emitK = 2)
    val buf = Seq("b", "a", null, "a", "b", null)
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq(("a", 2L, 0L), ("b", 2L, 0L)))
  }
}
