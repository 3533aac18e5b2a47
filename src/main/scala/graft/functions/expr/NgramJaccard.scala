package graft.functions.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** n-gram-shingle Jaccard similarity as a NATIVE expression — the per-PAIR
  * verify step of near-dup dedup, i.e. the hot loop of the candidate
  * pipeline at scale.
  *
  * The composed form ([[graft.functions.TextFunctions.ngramJaccardComposed]])
  * builds two shingle arrays through `transform` lambdas (interpreted), then
  * `array_distinct` + `array_intersect` (O(n) catalyst-array allocations per
  * pair). This expression does one pass per side into a hash set and counts
  * the overlap — same result, bytecode loop.
  *
  * Exact-parity contract with the composed form (verified by
  * `NgramJaccardSpec`):
  *  - words = `split(trim(text), "\\s+")` — reproduced with the SAME
  *    UTF8String.trim/split calls Spark's `StringTrim`/`StringSplit` use;
  *  - shingles = n consecutive words joined by one space; < n words ⇒ empty
  *    set;
  *  - jaccard = |A∩B| / (|A|+|B|−|A∩B|) over DISTINCT shingles, rounded to
  *    4 digits exactly like Spark's `Round` (BigDecimal HALF_UP);
  *  - BOTH sides shingle-less (undefined similarity) ⇒ null — the composed
  *    form under default ANSI mode throws DIVIDE_BY_ZERO here, which is not
  *    acceptable mid-job at scale; candidate generation never pairs two
  *    shingle-less docs (they produce no band keys), so the two forms agree
  *    on every pair that can actually reach a verify stage.
  */
case class NgramJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n > 0 && n <= 16, s"shingle width n must be in [1,16], got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_jaccard expects two string args, got $other")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"

  /** Null on a shingle-less/shingle-less pair even when both children are
    * non-nullable — nullability must not be inherited (same codegen trap as
    * [[MinHashSig]]). */
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NgramJaccard.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("j")
      s"""
        java.lang.Double $tmp = graft.functions.expr.NgramJaccard$$.MODULE$$
          .compute($a, $b, $n);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramJaccard =
    copy(left = newLeft, right = newRight)
}

object NgramJaccard {

  private val Space = UTF8String.fromString(" ")
  private val WsRun = UTF8String.fromString("\\s+")

  /** Distinct shingle set of a document (empty when it has < n words). */
  private def shingleSet(text: UTF8String, n: Int): java.util.HashSet[UTF8String] = {
    val out = new java.util.HashSet[UTF8String]()
    // the same trim (spaces only) and regex split Spark's expressions run
    val words = text.trim().split(WsRun, -1)
    if (words.length < n) return out
    var i = 0
    while (i <= words.length - n) {
      out.add(UTF8String.concatWs(Space, words.slice(i, i + n).toSeq: _*))
      i += 1
    }
    out
  }

  /** Shared by interpreted and codegen paths; null ⇔ undefined (0/0). */
  def compute(a: UTF8String, b: UTF8String, n: Int): java.lang.Double = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (big.contains(it.next())) inter += 1
    val uni = sa.size + sb.size - inter
    if (uni == 0) return null
    java.math.BigDecimal.valueOf(inter.toDouble / uni.toDouble)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Column API — requires registration (GraftExtensions / register). */
  def apply(a: Column, b: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("ngram_jaccard",
      a, b, org.apache.spark.sql.functions.lit(n))

  private def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b, Literal(n: Int, IntegerType)) => NgramJaccard(a, b, n)
    case Seq(a, b) => NgramJaccard(a, b, 3)
    case other => throw new IllegalArgumentException(
      s"ngram_jaccard(text, text[, n]) — got ${other.length} args")
  }

  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("ngram_jaccard"),
    new ExpressionInfo(classOf[NgramJaccard].getName, "ngram_jaccard"),
    builder _)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.asInstanceOf[FunctionRegistry]
      .registerFunction(registration._1, registration._2, registration._3)
}
