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

/** One-pass content-defined chunk boundaries — the native twin of x62's
  * composed form:
  *
  *   concat(array(1),
  *     if(n >= window + 1,
  *        filter(sequence(2, n - window + 1),
  *          p -> first-24-bits(md5(utf8(substring(text, p, window))))
  *                 % mod = 0),
  *        array()),
  *     array(n + 1))
  *
  * Bit-identical: positions are 1-based CHARACTER offsets, the window
  * substring is character-sliced then UTF-8 encoded (exactly what
  * `cast(substring(text, p, w) as binary)` hashes), and the 24-bit value
  * equals parsing the first 6 hex chars of the md5 — so the DuckDB
  * oracle written against the composed form still matches.
  *
  * Why native: `filter` evaluates its lambda INTERPRETED, once per
  * character position — md5 + conv + cast through the interpreted
  * expression walker for every position of every document. Here the
  * position loop is one precompiled method with one reused
  * MessageDigest; `doGenCode` emits a single static call.
  *
  * Output: array<int> — `[1, …boundaries…, numChars + 1]` (never null;
  * empty text yields `[1, 1]`), matching the composed concat exactly.
  */
case class CdcBounds(child: Expression, window: Int, mod: Int)
    extends UnaryExpression {

  require(window >= 1 && window <= 64,
    s"window must be in [1,64], got $window")
  require(mod >= 1, s"mod must be positive, got $mod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds expects a string document, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_bounds"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else CdcBounds.compute(v.asInstanceOf[UTF8String], window, mod)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ad = classOf[ArrayData].getName
    if (nullable) {
      ev.copy(code = code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        $ad ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.expr.CdcBounds$$.MODULE$$
            .compute(${c.value}, $window, $mod);
        }""")
    } else {
      ev.copy(code = code"""
        ${c.code}
        $ad ${ev.value} = graft.functions.expr.CdcBounds$$.MODULE$$
          .compute(${c.value}, $window, $mod);""",
        isNull = FalseLiteral)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)
}

object CdcBounds {

  /** The hot loop — one md5 per character position, one reused digest
    * instance per row, boundaries collected into a growable int buffer. */
  def compute(text: UTF8String, window: Int, mod: Int): ArrayData = {
    val n = text.numChars()
    val buf = new scala.collection.mutable.ArrayBuffer[Any](16)
    buf += 1
    if (n >= window + 1) {
      val md = java.security.MessageDigest.getInstance("MD5")
      var p = 2
      val last = n - window + 1
      while (p <= last) {
        // UTF8String.substring is [start, until) in CHARACTER offsets —
        // identical slicing to SQL substring(text, p, window)
        val sub = text.substring(p - 1, p - 1 + window)
        md.reset()
        val d = md.digest(sub.getBytes)
        val h24 = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
        if (h24 % mod == 0) buf += p
        p += 1
      }
    }
    buf += n + 1
    new GenericArrayData(buf.toArray)
  }

  /** Column API — requires registration (GraftExtensions / register). */
  def apply(text: Column, window: Int, mod: Int): Column =
    org.apache.spark.sql.functions.call_function("cdc_bounds",
      text, org.apache.spark.sql.functions.lit(window),
      org.apache.spark.sql.functions.lit(mod))

  private def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(t, Literal(w: Int, IntegerType), Literal(m: Int, IntegerType)) =>
      CdcBounds(t, w, m)
    case other => throw new IllegalArgumentException(
      s"cdc_bounds(text, window, mod) — got ${other.length} args")
  }

  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cdc_bounds"),
    new ExpressionInfo(classOf[CdcBounds].getName, "cdc_bounds"),
    builder _)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(registration._1, registration._2, registration._3)
}
