package graft.functions.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Vector dot product as a NATIVE Catalyst expression with codegen.
  *
  * The composed form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is a
  * higher-order function: Spark evaluates HOF lambdas interpreted (no
  * `doGenCode`), allocating a zipped array per call — and predicate pushdown
  * can re-evaluate the whole tree on both sides of a Filter/Project pair.
  * For pair-join similarity workloads that is several interpreted 64-element
  * folds PER CANDIDATE PAIR. This expression is one allocation-free codegen'd
  * loop: the difference between interpreted-lambda and native arithmetic on
  * the 100 TB path, with IDENTICAL results.
  *
  * Semantics (deliberately bit-identical to the composed form, which is what
  * the DuckDB oracles cross-check):
  *  - elements are widened to double BEFORE multiply/accumulate;
  *  - accumulation is the same sequential left fold `((0+x₀)+x₁)+…`;
  *  - null array, length mismatch, or any null element → null (zip_with
  *    pads/poisons with null, and `null * x` / `acc + null` stay null).
  *
  * Input: two array<float> / array<double> columns. Output: double.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects two array<float|double> args, got $other")
    }

  override def dataType: DataType = DoubleType

  /** Null on length mismatch or null element even when both children are
    * non-nullable — nullability must not be inherited (same codegen trap as
    * [[MinHashSig]]). */
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  private def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xd = elemIsDouble(left)
    val yd = elemIsDouble(right)
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      def get(arr: String, isDouble: Boolean) =
        if (isDouble) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n && !$bad; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
            else { $acc += ${get(a, elemIsDouble(left))}
                           * ${get(b, elemIsDouble(right))}; }
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {

  /** Scala/Column API — requires registration (GraftExtensions or
    * [[register]]); resolution goes through the function registry. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  private def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b) => VecDot(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_dot(array, array) — got ${other.length} args")
  }

  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    builder _)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.asInstanceOf[FunctionRegistry]
      .registerFunction(registration._1, registration._2, registration._3)
}
