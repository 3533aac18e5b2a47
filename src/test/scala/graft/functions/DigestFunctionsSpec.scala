package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The digest contract past the old 2⁶³ bound (ADVICE r9): a bucket whose
  * fingerprint sum overflows a signed long must still produce the
  * two's-complement mod-2⁶⁴ residue — loudly NOT the ANSI overflow error
  * a plain long sum raises — and the Scala reference below is the same
  * formula [[DigestFunctions.wrap64Sql]] hands DuckDB. */
class DigestFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val W = BigInt(1) << 64
  private def expectedWrap(vals: Seq[Long]): Long = {
    val m = (vals.map(BigInt(_)).sum.mod(W) + W).mod(W)
    (if (m >= (BigInt(1) << 63)) m - W else m).toLong
  }

  test("digestSum survives (and wraps) a planted signed-long overflow") {
    // ~2^62 each: three rows land the sum in [2^63, 2^64) — past the
    // signed-long bound, inside one wrap, so the residue is negative
    val vals = Seq(1L << 62, (1L << 62) + 12345L,
                   (1L << 62) + 999999937L)
    val got = vals.toDF("f")
      .agg(DigestFunctions.digestSum(col("f")).as("d"))
      .as[Long].head()
    assert(got === expectedWrap(vals))
    assert(got < 0L, "the planted sum must actually wrap")
  }

  test("digestSum with signed multiplicities is invertible through the wrap") {
    // add rows past the wrap point, then retract them — state returns
    // exactly (the merge-ring property x116 relies on)
    val add = Seq(1L << 62, (1L << 62) + 3L, (1L << 62) + 5L)
    val addThenRemove = add.map(("a", _)) ++ add.map(("r", _))
    val net = addThenRemove.toDF("op", "f")
      .select(when(col("op") === "a", col("f")).otherwise(-col("f")).as("mf"))
      .agg(DigestFunctions.digestSum(col("mf")).as("d"))
      .as[Long].head()
    assert(net === 0L)
  }

  test("below the wrap point digestSum equals the plain long sum (hash parity)") {
    val vals = Seq(281474976710655L, 17L, 123456789L) // 48-bit-ish fps
    val got = vals.toDF("f")
      .agg(DigestFunctions.digestSum(col("f")).as("d")).as[Long].head()
    assert(got === vals.sum)
  }

  test("empty input stays NULL (sum parity for absent buckets)") {
    val got = Seq(1L).toDF("f").filter(col("f") < 0)
      .agg(DigestFunctions.digestSum(col("f")).as("d"))
      .select(col("d").isNull).as[Boolean].head()
    assert(got)
  }
}
