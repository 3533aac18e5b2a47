package graft.functions.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Binary search over a sorted long array as a NATIVE codegen'd expression:
  * `sorted_lower_bound(arr, v)` = the number of elements strictly below
  * `v` (the insertion point / lower bound).
  *
  * This is the range-assignment kernel of the two-phase prefix sum
  * ([[graft.ops.PrefixSumOps]]): the composed form
  * `aggregate(bs, 0, (acc, b) -> acc + IF(v > b, 1, 0))` scans the whole
  * boundary array per row with an INTERPRETED lambda — O(splits)
  * comparisons each, which caps how many ranges one level can afford.
  * This expression is an allocation-free O(log splits) loop inside
  * whole-stage codegen, so a single level can carry thousands of ranges
  * (cited composition note in PrefixSumOps becomes an option, not a
  * requirement).
  *
  * Semantics match the composed form EXACTLY for a non-decreasing array
  * (count of b < v counts every duplicate boundary below v; the binary
  * search returns the first index with arr[i] >= v — the same number).
  * Null array or null probe → null; null ELEMENTS are a precondition
  * violation (boundary arrays are built from non-null aggregates) and
  * fail loudly at eval rather than silently mis-bucketing.
  *
  * Input: (array<bigint> sorted ascending, bigint) or (array<double>
  * sorted ascending, double) — doubles because quantile-sketch range
  * boundaries over a double-typed order column (q87's price medians)
  * would otherwise fall back to the interpreted fold, a measured 5×
  * slowdown of the whole query at bench SF. Output: int.
  */
case class SortedLowerBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "sorted_lower_bound expects (array<bigint>, bigint) or " +
          s"(array<double>, double), got $other")
    }

  private def isLong: Boolean = right.dataType == LongType

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_lower_bound"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var lo = 0
    var hi = arr.numElements()
    if (isLong) {
      val v = b.asInstanceOf[Long]
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr.isNullAt(mid))
          throw new IllegalArgumentException(
            "sorted_lower_bound: null element in boundary array")
        if (arr.getLong(mid) < v) lo = mid + 1 else hi = mid
      }
    } else {
      val v = b.asInstanceOf[Double]
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr.isNullAt(mid))
          throw new IllegalArgumentException(
            "sorted_lower_bound: null element in boundary array")
        if (arr.getDouble(mid) < v) lo = mid + 1 else hi = mid
      }
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
        int $lo = 0;
        int $hi = $a.numElements();
        while ($lo < $hi) {
          int $mid = ($lo + $hi) >>> 1;
          if ($a.isNullAt($mid)) {
            throw new IllegalArgumentException(
              "sorted_lower_bound: null element in boundary array");
          }
          if ($a.${if (isLong) "getLong" else "getDouble"}($mid) < $v) {
            $lo = $mid + 1;
          } else { $hi = $mid; }
        }
        ${ev.value} = $lo;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLowerBound =
    copy(left = newLeft, right = newRight)
}

object SortedLowerBound {

  /** Scala/Column API — requires registration (GraftExtensions or
    * [[register]]); resolution goes through the function registry. */
  def apply(arr: Column, v: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_lower_bound", arr, v)

  private def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, v) => SortedLowerBound(a, v)
    case other => throw new IllegalArgumentException(
      s"sorted_lower_bound(array, value) — got ${other.length} args")
  }

  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_lower_bound"),
    new ExpressionInfo(classOf[SortedLowerBound].getName, "sorted_lower_bound"),
    builder _)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.asInstanceOf[FunctionRegistry]
      .registerFunction(registration._1, registration._2, registration._3)
}
