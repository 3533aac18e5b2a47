package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series joins Spark lacks as built-ins, expressed with the
  * partition-and-sort primitives Spark is good at — never an inequality
  * join (which Catalyst plans as a broadcast-nested-loop scan).
  *
  * Scale design:
  *  - [[asofJoinBackward]] is ONE shuffle on the join keys + one
  *    sort-within-partition; the "most recent right row" is carried by a
  *    running `last(_, ignoreNulls)` window, so cost is O(N log N_partition)
  *    regardless of how many right rows precede each left row. This is the
  *    standard distributed as-of pattern (cf. pandas merge_asof semantics,
  *    Flink temporal joins).
  *  - [[rangeSelfJoin]] buckets time into `maxGap`-wide cells and turns the
  *    |Δts| ≤ maxGap predicate into an equi-join on (keys, cell): each left
  *    row probes its own and both adjacent cells (a constant 3× explode),
  *    so the shuffle stays O(N) and AQE can split skewed cells. A pair can
  *    match in only one probed cell (the right row's own), so no dedup pass
  *    is needed.
  */
object TemporalJoins {

  /** Backward as-of LEFT join: for every left row, attach the payload of
    * the right row with the greatest `rightTs` ≤ `leftTs` within the same
    * `keys` group (null payload when none precedes). Ties on `rightTs` are
    * broken by the remaining `rightPayload` columns in order (greatest
    * wins), which keeps the result deterministic for duplicate timestamps.
    *
    * Payload columns are emitted as `<name><suffix>`; `rightTs` itself is
    * always included as `<rightTs><suffix>`.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       rightPayload: Seq[String],
                       suffix: String = "_r"): DataFrame = {
    val payloadCols = rightTs +: rightPayload
    val lrowType = StructType(left.schema.fields)
    val rpType = StructType(
      right.select(payloadCols.map(col): _*).schema.fields)
    // union the two sides: right rows sort BEFORE left rows at an equal
    // timestamp (side 0 < 1) so the join is inclusive (≤)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ats"), lit(0).as("_side"),
        struct(payloadCols.map(col): _*).as("_rp"),
        lit(null).cast(lrowType).as("_lrow")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ats"), lit(1).as("_side"),
        lit(null).cast(rpType).as("_rp"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("_lrow")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc, col("_rp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_lrow.*") +:
        payloadCols.map(c => col(s"_match.$c").as(c + suffix)): _*)
  }

  /** Forward as-of LEFT join: for every left row, attach the payload of
    * the right row with the SMALLEST `rightTs` ≥ `leftTs` within the same
    * `keys` group (null when none follows). Ties on `rightTs` are broken
    * by the remaining payload columns (smallest wins). Mirror of
    * [[asofJoinBackward]] — same single shuffle + sort, with the running
    * window looking forward instead of back. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightPayload: Seq[String],
                      suffix: String = "_r"): DataFrame = {
    val payloadCols = rightTs +: rightPayload
    val lrowType = StructType(left.schema.fields)
    val rpType = StructType(
      right.select(payloadCols.map(col): _*).schema.fields)
    // left rows sort BEFORE right rows at an equal timestamp (side 0 < 1)
    // so a right row at exactly leftTs is inside the following frame (≥)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ats"), lit(0).as("_side"),
        lit(null).cast(rpType).as("_rp"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("_lrow")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ats"), lit(1).as("_side"),
        struct(payloadCols.map(col): _*).as("_rp"),
        lit(null).cast(lrowType).as("_lrow")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc, col("_rp").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("_match", first(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(col("_lrow.*") +:
        payloadCols.map(c => col(s"_match.$c").as(c + suffix)): _*)
  }

  /** Nearest as-of LEFT join: the right row minimizing |rightTs − leftTs|
    * within the key group; exact-distance ties prefer the backward match
    * (pandas merge_asof direction='nearest' semantics). Composes the two
    * directional joins — still two shuffles total, both on the keys. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightPayload: Seq[String],
                      suffix: String = "_r"): DataFrame = {
    val payloadCols = rightTs +: rightPayload
    val back = asofJoinBackward(left, right, keys, leftTs, rightTs,
      rightPayload, "_gb")
    val both = asofJoinForward(back, right, keys, leftTs, rightTs,
      rightPayload, "_gf")
    val lSec = unix_timestamp(col(leftTs))
    val db = lSec - unix_timestamp(col(rightTs + "_gb"))
    val df_ = unix_timestamp(col(rightTs + "_gf")) - lSec
    val useBack = col(rightTs + "_gf").isNull ||
      (col(rightTs + "_gb").isNotNull && db <= df_)
    val picked = payloadCols.map { c =>
      when(useBack, col(c + "_gb")).otherwise(col(c + "_gf")).as(c + suffix)
    }
    both.select(left.columns.toIndexedSeq.map(col) ++ picked: _*)
  }

  /** All pairs of rows sharing `keys` whose timestamps differ by at most
    * `maxGapSec`, as `(id_a, id_b, gap_sec)` with `id_a < id_b`. */
  def rangeSelfJoin(df: DataFrame, keys: Seq[String], idCol: String,
                    tsCol: String, maxGapSec: Long): DataFrame = {
    require(maxGapSec > 0, "maxGapSec must be positive")
    val cell = floor(unix_timestamp(col(tsCol)) / maxGapSec)
    val base = df.select(
      keys.map(col) ++ Seq(col(idCol).as("_id"),
        unix_timestamp(col(tsCol)).as("_sec"), cell.as("_cell")): _*)
    val a = base.select(
      keys.map(col) ++ Seq(col("_id").as("id_a"), col("_sec").as("_sec_a"),
        explode(array(col("_cell") - 1, col("_cell"), col("_cell") + 1))
          .as("_probe")): _*)
    val b = base.select(
      (keys.map(n => col(n).as(s"${n}_b")) ++ Seq(col("_id").as("id_b"),
        col("_sec").as("_sec_b"), col("_cell").as("_cell_b"))): _*)
    val keyCond = keys.map(n => col(n) === col(s"${n}_b"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b, keyCond && col("_probe") === col("_cell_b") &&
              col("id_a") < col("id_b") &&
              abs(col("_sec_b") - col("_sec_a")) <= maxGapSec)
      .select(col("id_a"), col("id_b"),
              abs(col("_sec_b") - col("_sec_a")).as("gap_sec"))
  }
}
