package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance for parquet layouts: small-file compaction and
  * per-file zone-map manifests.
  *
  * A long-lived 100 TB table accretes files from many incremental writes
  * (streaming micro-batches, per-day appends, retried tasks): thousands of
  * KB-scale files per partition turn every scan into a task-scheduling and
  * footer-reading exercise long before any byte of data is touched. The two
  * standing remedies are (a) periodic COMPACTION into target-size files and
  * (b) a FILE-LEVEL statistics manifest so predicates prune whole files
  * without opening them — the same design Delta/Iceberg/Hudi ship, expressed
  * here directly over plain parquet directories.
  *
  * Scale design:
  *  - [[compact]] sizes the output from the listed ENCODED input bytes
  *    (compression survives a rewrite to within row-group framing), so the
  *    job needs no pre-scan. Unsorted compaction is one round-robin
  *    shuffle; sorted compaction is `repartitionByRange` +
  *    `sortWithinPartitions` — N parallel bounded sorts, never a global
  *    single-task sort, and the result is exactly the clustering
  *    [[zoneMap]] pruning profits from.
  *  - [[zoneMap]] is one scan of ONLY the profiled columns (column pruning
  *    keeps the read narrow) grouped by `_metadata.file_path` — the shuffle
  *    is |files| rows of (min,max,nulls) tuples, trivially small.
  *  - [[readPruned]] applies the manifest and hands Spark just the
  *    surviving files; the predicate is re-applied row-level, so pruning
  *    can only ever REMOVE work, never change a result.
  */
object Compaction {

  /** Leaf data files of a parquet directory with their encoded sizes —
    * a pure namenode/listing operation, no data read, no Spark job. */
  def dataFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        buf += ((f.getPath.toString, f.getLen))
    }
    buf.toSeq.sortBy(_._1)
  }

  /** Rewrite `inPath` into ~`targetBytes`-sized parquet files at `outPath`.
    *
    * Output file count = ceil(listed encoded bytes / targetBytes) — the
    * standard post-compression heuristic (row-group framing and dictionary
    * resets keep re-encoded size within ~±20% of input). With `sortCols`
    * the rewrite also range-clusters the data, which is what makes a
    * subsequent [[zoneMap]] selective; without, a round-robin shuffle
    * balances file sizes exactly. Returns the output file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long, sortCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0, "compact needs a positive target file size")
    val totalBytes = dataFiles(spark, inPath).map(_._2).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    if (sortCols.isEmpty)
      df.repartition(n).write.mode("overwrite").parquet(outPath)
    else
      TableIo.writeRangeSorted(df, outPath, n, sortCols)
    dataFiles(spark, outPath).size
  }

  /** Scheme-free canonical form shared by the HDFS listing
    * (`file:/x/y`) and `_metadata.file_path` (`file:///x/y`), so manifest
    * rows and listings compare exactly. */
  private def canon(p: String): String = p.replaceFirst("^file:/+", "/")

  private def canonCol(c: Column): Column =
    regexp_replace(c, "^file:/+", "/")

  /** Per-file zone maps: for each data file, row count plus min / max /
    * null count of every column in `cols`. One narrow scan; the manifest
    * is |files| rows — persist it next to the table and refresh on write
    * ([[zoneMapRefresh]] scans only NEW files). `file` is the canonical
    * path; columns come out as `<c>_min`, `<c>_max`, `<c>_nulls`. */
  def zoneMap(spark: SparkSession, path: String,
              cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zoneMap needs at least one column to profile")
    spark.read.parquet(path)
      .select(canonCol(col("_metadata.file_path")).as("file")
                +: cols.map(col): _*)
      .groupBy("file")
      .agg(zoneAggs(cols).head, zoneAggs(cols).tail: _*)
  }

  /** Incremental manifest maintenance: manifest rows whose files still
    * exist, unioned with freshly-profiled rows for files the manifest
    * has never seen. Which files are new comes from the LISTING alone,
    * and only those files are opened — the append-mostly refresh a
    * streaming table needs after every micro-batch stays O(new data);
    * rows for files a compaction rewrote away drop out via the same
    * listing. */
  def zoneMapRefresh(spark: SparkSession, path: String, cols: Seq[String],
                     manifest: DataFrame): DataFrame = {
    val byCanon = dataFiles(spark, path)
      .map { case (p, _) => canon(p) -> p }.toMap
    val live = byCanon.keySet
    val known = manifest.select("file").collect().map(_.getString(0)).toSet
    val kept = manifest.filter(col("file").isin(live.toSeq: _*))
    val fresh = (live -- known).toSeq.sorted
    if (fresh.isEmpty) kept
    else {
      val freshZones = spark.read.parquet(fresh.map(byCanon): _*)
        .select(canonCol(col("_metadata.file_path")).as("file")
                  +: cols.map(col): _*)
        .groupBy("file")
        .agg(zoneAggs(cols).head, zoneAggs(cols).tail: _*)
      kept.unionByName(freshZones)
    }
  }

  /** Compaction planning on the LISTING alone (no data read, no job):
    * greedily bin files smaller than `smallBytes` into rewrite groups of
    * ≈ `targetBytes`, first-fit over the size-descending order — the
    * OPTIMIZE file-selection step. Files already at or above
    * `smallBytes` are left in place (rewriting them buys nothing).
    * Deterministic: ties broken by path. */
  def planCompaction(files: Seq[(String, Long)], smallBytes: Long,
                     targetBytes: Long): Seq[Seq[String]] = {
    require(smallBytes <= targetBytes,
      "a file counted small must fit its rewrite group")
    val small = files.filter(_._2 < smallBytes)
      .sortBy { case (p, sz) => (-sz, p) }
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String], Long)]
    small.foreach { case (p, sz) =>
      bins.indexWhere(_._2 + sz <= targetBytes) match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer(p), sz))
        case i  => val (b, tot) = bins(i); b += p; bins(i) = (b, tot + sz)
      }
    }
    // a singleton group rewrites one small file into one small file —
    // pointless I/O; only multi-file groups are worth executing
    bins.toSeq.map(_._1.toSeq).filter(_.size > 1)
  }

  private def zoneAggs(cols: Seq[String]): Seq[Column] =
    count(lit(1)).as("rows") +: cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
          sum(col(c).isNull.cast("long")).as(s"${c}_nulls"))
    }

  /** Files whose `[min, max]` zone for `column` intersects `[lo, hi]` —
    * i.e. every file that COULD hold a matching row. A null min/max means
    * the file is all-null in that column, and an all-null file cannot
    * satisfy a range predicate, so it is pruned too. */
  def candidateFiles(zoneMap: DataFrame, column: String,
                     lo: Column, hi: Column): Seq[String] = {
    val mn = col(s"${column}_min"); val mx = col(s"${column}_max")
    zoneMap.filter(mn.isNotNull && mx.isNotNull && mx >= lo && mn <= hi)
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Range read through the manifest: scan only the files whose zones
    * intersect `[lo, hi]`, then re-apply the predicate row-level. On a
    * range-clustered layout (see [[compact]] with `sortCols`) this turns
    * a point/range lookup into an O(matching files) read; on a random
    * layout it degrades gracefully to a full scan with identical results.
    * Returns an empty frame with the table's schema when nothing can
    * match. */
  def readPruned(spark: SparkSession, path: String, zm: DataFrame,
                 column: String, lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(zm, column, lo, hi)
    val pred = col(column) >= lo && col(column) <= hi
    if (files.isEmpty)
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(files: _*).filter(pred)
  }
}
