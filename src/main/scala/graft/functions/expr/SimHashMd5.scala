package graft.functions.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** One-pass md5 SimHash over a token array — the native,
  * oracle-parity-preserving twin of the composed
  * `TextFunctions.simhashFromTokens` (as [[MinHashSigMd5]] is to the
  * composed minhash): per-token hash = the first 4 (bits ≤ 16) or 8 hex
  * chars of md5(token) as an integer, bit i of the output set iff the
  * +1/−1 tally of hash-bit i over all tokens is positive.
  *
  * Why native: the composed form evaluates `bits` separate aggregate()
  * trees — `bits` interpreted traversals and `bits` md5 computations PER
  * TOKEN (x96's 32-bit payload fingerprint measured 9.1 s at bench SF,
  * almost all of it redundant hashing). Here each token is hashed ONCE
  * and all bit counters accumulate in a single loop living in one
  * precompiled method; `doGenCode` emits a single static call.
  *
  * Bit-identical to the composed form, including its edge semantics:
  * null ARRAY → 0 (the composed when().otherwise(0) chain folds null to
  * 0, not null), empty array → 0, null ELEMENT → every tally
  * decremented (composed: null hash fails the bit test, contributing −1
  * per bit — the same as a token whose hash is 0). `SimHashMd5Spec`
  * proves equivalence on those edges, so DuckDB oracles written against
  * the md5 formula keep matching.
  */
case class SimHashMd5(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 32, s"bits must be in [1,32], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_md5"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    SimHashMd5.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.functions.expr.SimHashMd5$$.MODULE$$
          .compute(${c.isNull} ? null : ${c.value}, $bits);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {

  /** Hot loop — one md5 per token, all `bits` counters in one pass.
    * Hashing reads the RAW UTF8String bytes (no lossy String round
    * trip); the per-token integer is the first 2 or 4 digest bytes
    * unsigned, exactly `conv(substring(md5_hex, 1, 4|8), 16, 10)`. */
  def compute(toks: ArrayData, bits: Int): Long = {
    if (toks == null) return 0L
    val n = toks.numElements()
    if (n == 0) return 0L
    val nBytes = if (bits <= 16) 2 else 4
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        // composed form: null hash fails every bit test → −1 per bit
        var j = 0
        while (j < bits) { counts(j) -= 1; j += 1 }
      } else {
        md.reset()
        md.update(toks.getUTF8String(i).getBytes)
        val d = md.digest()
        var h = 0L
        var b = 0
        while (b < nBytes) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
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

  /** Column API — requires registration (GraftExtensions / register). */
  def apply(toks: Column, bits: Int): Column =
    org.apache.spark.sql.functions.call_function("simhash_md5",
      toks, org.apache.spark.sql.functions.lit(bits))

  private def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(arr, Literal(b: Int, IntegerType)) => SimHashMd5(arr, b)
    case other => throw new IllegalArgumentException(
      s"simhash_md5(array<string>, bits) — got ${other.length} args")
  }

  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_md5"),
    new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
    builder _)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(registration._1, registration._2, registration._3)
}
