package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Projection / schema operators (SURVEY.md P1–P7). */
object ReshapeOps {

  /** P3 — alias-tolerant rename: several source spellings map to one target;
    * applied only when the source exists and the target doesn't already
    * (/root/reference/etl_payroll_pipeline.py:256-261, 376-380, 563-584). */
  def renameIfExists(df: DataFrame, aliases: Seq[(String, String)]): DataFrame =
    aliases.foldLeft(df) { case (d, (src, dst)) =>
      if (d.columns.contains(src) && (src == dst || !d.columns.contains(dst)))
        d.withColumnRenamed(src, dst)
      else d
    }

  /** P4 — reshape-to-spec (ref 330-368 `col_map`): ordered output schema
    * where each output column pulls a named source column, or materializes
    * as all-null string when the source is missing. Returns the missing
    * source names for the reference's warning report (ref 360-366). */
  def reshapeToSpec(df: DataFrame, spec: Seq[(String, String)])
      : (DataFrame, Seq[String]) = {
    val have = df.columns.toSet
    val missing = spec.collect { case (_, src) if !have.contains(src) => src }
    val cols = spec.map { case (out, src) =>
      (if (have.contains(src)) col(src) else lit(null).cast(StringType)).as(out)
    }
    (df.select(cols: _*), missing)
  }

  /** P6 — header whitespace normalization (ref 205-207, applied inline for
    * CPA certs at 433-434). */
  def trimHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.trim).toIndexedSeq: _*)

  /** P5 — duplicate-column-name elimination, keep first occurrence
    * (ref 591). Spark disallows duplicate names in most operators, but a
    * join can produce them; select-by-position keeps the first. */
  def dropDuplicateColumns(df: DataFrame): DataFrame = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    val keepIdx = df.columns.zipWithIndex.collect {
      case (c, i) if seen.add(c) => i
    }
    if (keepIdx.length == df.columns.length) df
    else {
      // positional: rename everything unique first (df("name") would be
      // ambiguous), then select the first occurrence of each name
      val names = df.columns
      val tmp = df.toDF(names.indices.map(i => s"_pos$i"): _*)
      tmp.select(keepIdx.map(i => col(s"_pos$i").as(names(i))).toIndexedSeq: _*)
    }
  }

  /** P7 — schema validation against an expected column list: warn, don't
    * abort (ref 457-471). Returns (ok, unexpected, missing). */
  def validateSchema(df: DataFrame, expected: Seq[String])
      : (Boolean, Seq[String], Seq[String]) = {
    val actual = df.columns.map(_.trim).toSeq
    val unexpected = actual.diff(expected)
    val missing = expected.diff(actual)
    val ok = unexpected.isEmpty && missing.isEmpty
    if (!ok) System.err.println(
      s"[graft] WARN schema mismatch: unexpected=$unexpected missing=$missing")
    (ok, unexpected, missing)
  }
}
