package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}
import graft.ops.DedupOps
import graft.storage.StorageClient

/** Sources and sinks (SURVEY.md S4–S7).
  *
  * Ingest rule (SURVEY §1.3): every payroll column is read as StringType
  * (`inferSchema=false`) — this matches the reference's all-string output
  * and sidesteps the pandas float-artifact hazard H1. Every source attaches
  * the ingest ordinal `_ingest_ord` (H4) so keep-first dedup and
  * first-match selection stay deterministic after repartitioning.
  */
object TableIo {

  /** S5 — CSV source: header row, all columns string, headers trimmed on
    * request (P6 applies only to the CPA certs — ref 433-434). */
  def readCsv(spark: SparkSession, path: String,
              trimHeaders: Boolean = false): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .option("escape", "\"") // RFC-style doubled quotes (pandas default)
      .csv(path)
    val named = if (trimHeaders) graft.ops.ReshapeOps.trimHeaders(df) else df
    DedupOps.withIngestOrdinal(named)
  }

  /** Parquet source with a SCALE-SAFE ingest ordinal (H4): ordinal =
    * (file index in path-sorted order) ≪ 40 | row position in file, built
    * from the hidden `_metadata` columns — stable under any partitioning
    * or task count, unlike monotonically_increasing_id. The file list
    * comes from the read's own inputFiles (names only, no data job).
    * Files are assumed < 2^40 rows each. */
  def readParquetOrdered(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(path)
    // _metadata.file_path renders "file:/x" while inputFiles gives
    // "file:///x" — normalize both before joining
    val withMeta = base.select(col("*"),
      regexp_replace(col("_metadata.file_path"), "^file:/+", "file:/").as("_fp"),
      col("_metadata.row_index").as("_ri"))
    val files = base.inputFiles
      .map(_.replaceFirst("^file:/+", "file:/")).sorted.zipWithIndex.toSeq
    val fileIdx = broadcast(
      spark.createDataFrame(files).toDF("_fp", "_fidx"))
    withMeta.join(fileIdx, Seq("_fp"))
      .withColumn(DedupOps.OrdinalCol,
        (col("_fidx").cast("long") * lit(1L << 40)) + col("_ri"))
      .drop("_fp", "_ri", "_fidx")
  }

  /** S4 — XLSX source via the hand-rolled codec: first sheet, header row 0,
    * all values string. Driver-side parse (payroll workbooks are small by
    * contract — the distributed path is CSV/parquet). */
  def readXlsx(spark: SparkSession, storage: StorageClient,
               path: String): DataFrame = {
    val (header, rows) = Xlsx.readTable(storage.readBytes(path))
    val schema = StructType(header.map(c => StructField(c, StringType, nullable = true)) :+
      StructField(DedupOps.OrdinalCol, org.apache.spark.sql.types.LongType, nullable = false))
    val data = rows.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.map(_.orNull) :+ i.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  /** S6 — CSV sink: ONE file, header, UTF-8, no index column, rows in
    * ingest order (ref 396-403, 606-613). Outputs are small by contract
    * (post-aggregation pipeline results), so the bytes are assembled
    * driver-side and written through the StorageClient — this is the
    * collect-and-write path the survey documents; large results would use
    * df.write.csv. Timestamps are rendered ISO `yyyy-MM-dd HH:mm:ss`
    * (pandas default). */
  def writeCsv(df: DataFrame, storage: StorageClient, folder: String,
               name: String): String =
    storage.writeBytes(folder, name, csvBytes(df))

  def csvBytes(df: DataFrame): Array[Byte] = {
    val out = DedupOps.sortAndDropOrdinal(df)
    val cols = out.columns
    val sb = new StringBuilder
    sb.append(cols.map(csvQuote).mkString(",")).append("\r\n")
    stringRows(out).foreach { r =>
      sb.append(r.map(v => csvQuote(v.getOrElse(""))).mkString(",")).append("\r\n")
    }
    sb.toString.getBytes("UTF-8")
  }

  /** S7 — XLSX sink, mirror of S4 (ref 410-417, 620-627). */
  def writeXlsx(df: DataFrame, storage: StorageClient, folder: String,
                name: String): String = {
    val out = DedupOps.sortAndDropOrdinal(df)
    storage.writeBytes(folder, name, Xlsx.write(out.columns.toSeq, stringRows(out)))
  }

  /** Render every column to Option[String]; timestamps ISO, seconds
    * precision when sub-second is zero (pandas CSV rendering). */
  private def stringRows(df: DataFrame): Seq[Seq[Option[String]]] = {
    val rendered = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType =>
          date_format(col(f.name), "yyyy-MM-dd HH:mm:ss").as(f.name)
        case _ => col(f.name).cast(StringType).as(f.name)
      }
    }.toIndexedSeq: _*)
    rendered.collect().toSeq.map(r =>
      r.toSeq.map(v => Option(v).map(_.toString)))
  }

  private def csvQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
