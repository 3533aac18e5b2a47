package graft.functions.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** One-pass MinHash signature as a NATIVE Catalyst expression with codegen.
  *
  * The composed form (graft.functions.TextFunctions.minhashSignature) builds
  * k separate `array_min(transform(...))` trees — k traversals of the
  * shingle array and k md5 allocations per shingle. This expression computes
  * all k component minima in ONE traversal using Spark's XXH64 (seeded per
  * component), allocation-free per element — the production-scale path when
  * the cross-engine-checkable md5 form isn't required.
  *
  * This is tier (b) of the custom-operator preference order (SURVEY.md §7.4
  * / build brief): a scalar `Expression` with `doGenCode`, NOT a UDF — it
  * stays inside whole-stage codegen.
  *
  * Input: array<string> shingles. Output: array<long> of length k, or null
  * when the input array has no non-null elements (matching `array_min` on
  * an empty array).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 256, s"k must be in [1,256], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Returns null for an empty / all-null-element input array even when the
    * child is non-nullable, so nullability must not be inherited — without
    * this override nullSafeCodeGen takes its non-nullable branch and the
    * generated `isNull = true` assignment references an undeclared local
    * (codegen compile failure → interpreted fallback that then violates the
    * nullability contract). */
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUTF8String(s, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      s"""
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        boolean $seen = false;
        for (int $i = 0; $i < $c.numElements(); $i++) {
          if (!$c.isNullAt($i)) {
            $seen = true;
            org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
            for (int $j = 0; $j < $k; $j++) {
              long $h = $xxh.hashUTF8String($s, (long) $j);
              if ($h < $mins[$j]) $mins[$j] = $h;
            }
          }
        }
        if (!$seen) {
          ${ev.isNull} = true;
          ${ev.value} = null;
        } else {
          ${ev.value} = new $gad($mins);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Scala/Column API — requires [[register]] (or GraftExtensions) first;
    * resolution goes through the function registry. */
  def apply(shingles: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "minhash_sig", shingles, org.apache.spark.sql.functions.lit(k))

  private def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(arr, Literal(k: Int, IntegerType)) => MinHashSig(arr, k)
    case Seq(arr) => MinHashSig(arr, 8)
    case other => throw new IllegalArgumentException(
      s"minhash_sig(array<string>[, k]) — got ${other.length} args")
  }

  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    builder _)

  /** Register into an existing session (tests / REPL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.asInstanceOf[FunctionRegistry]
      .registerFunction(registration._1, registration._2, registration._3)
}
