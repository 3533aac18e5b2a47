package graft.functions.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** One-pass SimHash as a native Catalyst expression (sibling of
  * [[MinHashSig]]). The composed form
  * (graft.functions.TextFunctions.simhash) evaluates `bits` separate
  * aggregate() trees — `bits` traversals and `bits` hash computations per
  * word. This expression hashes each word ONCE (XXH64) and accumulates all
  * bit counters in a single traversal.
  *
  * Input: array<string> tokens. Output: long (bit i set iff the +1/−1
  * tally of hash-bit i over all tokens is positive). Null array → null;
  * empty array → 0.
  */
case class SimHash64(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](bits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 0L)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
        int[] $counts = new int[$bits];
        for (int $i = 0; $i < $c.numElements(); $i++) {
          if (!$c.isNullAt($i)) {
            long $h = $xxh.hashUTF8String($c.getUTF8String($i), 0L);
            for (int $j = 0; $j < $bits; $j++) {
              if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
            }
          }
        }
        ${ev.value} = 0L;
        for (int $j = 0; $j < $bits; $j++) {
          if ($counts[$j] > 0) ${ev.value} |= (1L << $j);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Column API — requires registration (GraftExtensions / register). */
  def apply(tokens: Column, bits: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "simhash64", tokens, org.apache.spark.sql.functions.lit(bits))

  private def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(arr, Literal(b: Int, IntegerType)) => SimHash64(arr, b)
    case Seq(arr) => SimHash64(arr, 64)
    case other => throw new IllegalArgumentException(
      s"simhash64(array<string>[, bits]) — got ${other.length} args")
  }

  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    builder _)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(registration._1, registration._2, registration._3)
}
