package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Structural invariants of the round-9 extension queries that the
  * value-parity oracles can't isolate: the AQP estimator's mass
  * conservation, and the digest reconciler's no-drift identity
  * (including the empty-broadcast gate). */
class ExtensionEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("x108 AQP: exactly n anchors are drawn and the estimate total is within one step of truth") {
    val rows = SparkEntry.queries("x108_aqp_sample")(
        spark, "/root/testdata/sf0.001").collect()
    val nSampled = rows.map(_.getLong(1)).sum
    assert(nSampled == 100L,
      s"systematic design must draw exactly n anchors, got $nSampled")
    // est total = step * n by construction; truth = step * n + (tot mod
    // step), so the GLOBAL estimate is within one step even though the
    // per-group split carries the sampling error
    val est = rows.map(_.getLong(2)).sum
    val exact = rows.map(_.getLong(3)).sum
    val step = exact / 100
    assert(math.abs(est - exact) <= step,
      s"global estimate must be within one step: est=$est exact=$exact step=$step")
  }

  test("x111: identical snapshots reconcile clean — every digest matches, zero diffs, empty gate") {
    // doc_ids ≡ 1 (mod 17·13·19) dodge every drift arm of the fixture:
    // old == cur exactly, so the mismatched-bucket gate is EMPTY and the
    // row-level diff must not run (broadcast of an empty frame, zeros)
    val dir = Files.createTempDirectory("graft-nodrift").toString
    (0 until 20).map(i => (1L + i * 4199L, s"text body $i"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x111_digest_reconcile")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(3), s"no-drift bucket must match: $r")
      assert(r.getLong(1) == r.getLong(2), s"counts must agree: $r")
      assert(r.getLong(4) == 0L && r.getLong(5) == 0L && r.getLong(6) == 0L,
        s"no-drift bucket must report zero diffs: $r")
    }
  }

  test("x111: a planted edit is attributed to exactly its bucket") {
    // one doc lands in the %13=5 'changed' arm (truncated text), all
    // others dodge every arm — exactly one bucket may mismatch
    val base = (0 until 12).map(i => (1L + i * 4199L, s"d" * 60))
    val edited = Seq((18L, "e" * 60)) // 18%13=5, %17=1, %19=18
    val dir = Files.createTempDirectory("graft-onedrift").toString
    (base ++ edited).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x111_digest_reconcile")(spark, dir)
      .collect()
    val bad = out.filter(!_.getBoolean(3))
    assert(bad.length == 1 && bad(0).getLong(0) == 18L % 64,
      s"exactly bucket ${18L % 64} must drift: ${bad.mkString}")
    assert(bad(0).getLong(6) == 1L && bad(0).getLong(4) == 0L &&
           bad(0).getLong(5) == 0L,
      s"the drift must be one CHANGED row: ${bad(0)}")
  }
}
