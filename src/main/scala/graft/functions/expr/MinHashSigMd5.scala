package graft.functions.expr

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass md5 MinHash signature over a WORDS array — the native,
  * oracle-parity-preserving twin of the composed
  * `TextFunctions.minhashSignature`:
  *
  *   component_j = min over word-n-gram shingles of
  *                 md5_hex(s"$j:" + shingle)       (lexicographic min)
  *
  * Byte-identical to the composed `array_min(transform(shingles, md5(…)))`
  * chain (hex strings compare lexicographically; UTF8String comparison is
  * binary), so DuckDB oracles written against the md5 form still match.
  *
  * Why native: the composed form is a large higher-order-function tree —
  * Catalyst evaluates HOF lambdas interpreted, the expression blows past
  * codegen size limits when inlined per band, and every distinct plan
  * shape pays its own janino+JIT warm-up. Here the hot loop lives in ONE
  * precompiled method (shared by every query), and `doGenCode` emits a
  * single static call, so the generated class stays tiny.
  *
  * Output: array<string> of length k; elements are null when the document
  * has fewer than n words (matching `array_min` over an empty array), and
  * the array itself is never null (matching the composed `array(...)`).
  */
case class MinHashSigMd5(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n > 0 && n <= 16, s"shingle width n must be in [1,16], got $n")
  require(k > 0 && k <= 64, s"k must be in [1,64], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_md5 expects array<string> words, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig_md5"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    MinHashSigMd5.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], n, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ad = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        ${c.code}
        $ad ${ev.value} = graft.functions.expr.MinHashSigMd5$$.MODULE$$
          .compute(${c.isNull} ? null : ${c.value}, $n, $k);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigMd5 =
    copy(child = newChild)
}

object MinHashSigMd5 {

  private val Space = UTF8String.fromString(" ")

  /** The hot loop — plain bytecode, shared by interpreted and codegen
    * paths and by every query plan. Mirrors the composed form exactly:
    * `concat_ws(" ", …)` skips null word elements, and hashing operates on
    * the RAW UTF8String bytes (never a lossy java-String round trip), so
    * results match the composed `md5(cast(concat(…) as binary))` for any
    * byte content. */
  def compute(words: ArrayData, n: Int, k: Int): ArrayData = {
    val out = new Array[AnyRef](k)
    if (words == null) return new GenericArrayData(out)
    val nw = words.numElements()
    if (nw < n) return new GenericArrayData(out)
    // Hot-loop economics (this runs once per shingle × k per row):
    //  - ONE MessageDigest reused for the whole row (DigestUtils allocates a
    //    fresh instance per call — the dominant cost measured);
    //  - minima tracked as RAW 16-byte digests: lowercase-hex strings order
    //    exactly as their digest bytes compare unsigned, so the comparison
    //    is Arrays.compareUnsigned and hex encoding happens only for the k
    //    winners at the end — not per candidate.
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](k)
    val seedPrefix = Array.tabulate(k)(s => s"$s:".getBytes("UTF-8"))
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= nw - n) {
      var j = 0
      while (j < n) {
        // concat_ws skips nulls (concatWs ignores null inputs the same way)
        parts(j) = if (words.isNullAt(i + j)) null
                   else words.getUTF8String(i + j)
        j += 1
      }
      val shingleBytes = UTF8String.concatWs(Space, parts: _*).getBytes
      var s = 0
      while (s < k) {
        md.reset()
        md.update(seedPrefix(s))
        md.update(shingleBytes)
        val digest = md.digest()
        if (mins(s) == null ||
            java.util.Arrays.compareUnsigned(digest, mins(s)) < 0)
          mins(s) = digest
        s += 1
      }
      i += 1
    }
    var s = 0
    while (s < k) {
      if (mins(s) != null)
        out(s) = UTF8String.fromString(
          org.apache.commons.codec.binary.Hex.encodeHexString(mins(s)))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column API — requires registration (GraftExtensions / register). */
  def apply(words: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.functions.call_function("minhash_sig_md5",
      words, org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(k))

  private def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(arr, Literal(n: Int, IntegerType), Literal(k: Int, IntegerType)) =>
      MinHashSigMd5(arr, n, k)
    case other => throw new IllegalArgumentException(
      s"minhash_sig_md5(array<string>, n, k) — got ${other.length} args")
  }

  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig_md5"),
    new ExpressionInfo(classOf[MinHashSigMd5].getName, "minhash_sig_md5"),
    builder _)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(registration._1, registration._2, registration._3)
}
