package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_$tag").toString

  /** A deliberately fragmented copy of sf0.001 documents: 16 tiny files. */
  private lazy val fragmented: String = {
    val dir = tmp("frag")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(16).write.mode("overwrite").parquet(dir)
    dir
  }

  test("compact merges small files without changing content") {
    val out = tmp("compact")
    val inFiles = Compaction.dataFiles(spark, fragmented).size
    val totalBytes = Compaction.dataFiles(spark, fragmented).map(_._2).sum
    val nOut = Compaction.compact(spark, fragmented, out, totalBytes * 2)
    assert(inFiles == 16)
    assert(nOut == 1, s"2x-total target must compact to one file, got $nOut")
    val a = spark.read.parquet(fragmented)
    val b = spark.read.parquet(out)
    assert(b.count() == a.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("sorted compaction range-clusters: per-file zones are disjoint") {
    val out = tmp("sorted")
    val totalBytes = Compaction.dataFiles(spark, fragmented).map(_._2).sum
    val nOut = Compaction.compact(spark, fragmented, out,
      math.max(1L, totalBytes / 4), sortCols = Seq("doc_id"))
    assert(nOut >= 3, s"quarter-size target should yield >=3 files, got $nOut")
    val zones = Compaction.zoneMap(spark, out, Seq("doc_id"))
      .orderBy("doc_id_min")
      .select("doc_id_min", "doc_id_max").collect()
    zones.sliding(2).foreach {
      case Array(prev, next) =>
        assert(prev.getLong(1) <= next.getLong(0),
          s"zones overlap: ${prev.mkString(",")} vs ${next.mkString(",")}")
      case _ =>
    }
  }

  test("zoneMap matches brute-force per-file stats") {
    val zm = Compaction.zoneMap(spark, fragmented, Seq("doc_id", "n_chars"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(zm.size == 16)
    Compaction.dataFiles(spark, fragmented).foreach { case (f, _) =>
      val one = spark.read.parquet(f)
        .agg(count(lit(1)), min("doc_id"), max("doc_id"),
             min("n_chars"), max("n_chars"),
             sum(col("n_chars").isNull.cast("long"))).head
      // zoneMap's `file` comes from _metadata.file_path (file:/ prefix)
      val key = zm.keys.find(_.endsWith(f.replaceFirst("^file:/+", "/")))
        .getOrElse(fail(s"no zone row for $f"))
      val z = zm(key)
      assert(z.getAs[Long]("rows") == one.getLong(0))
      assert(z.getAs[Long]("doc_id_min") == one.getLong(1))
      assert(z.getAs[Long]("doc_id_max") == one.getLong(2))
      assert(z.getAs[Long]("n_chars_min") == one.getLong(3))
      assert(z.getAs[Long]("n_chars_max") == one.getLong(4))
      assert(z.getAs[Long]("n_chars_nulls") == one.getLong(5))
    }
  }

  test("readPruned on a clustered layout reads fewer files, same result") {
    val out = tmp("pruned")
    val totalBytes = Compaction.dataFiles(spark, fragmented).map(_._2).sum
    Compaction.compact(spark, fragmented, out,
      math.max(1L, totalBytes / 8), sortCols = Seq("n_chars"))
    val zm = Compaction.zoneMap(spark, out, Seq("n_chars")).cache()
    val nFiles = Compaction.dataFiles(spark, out).size
    val (lo, hi) = (lit(100), lit(200))
    val cand = Compaction.candidateFiles(zm, "n_chars", lo, hi)
    assert(cand.nonEmpty && cand.size < nFiles,
      s"narrow range should prune: ${cand.size} of $nFiles files")
    val pruned = Compaction.readPruned(spark, out, zm, "n_chars", lo, hi)
    assert(pruned.inputFiles.length == cand.size,
      "scan must touch exactly the candidate files")
    val full = spark.read.parquet(out)
      .filter(col("n_chars") >= 100 && col("n_chars") <= 200)
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    zm.unpersist()
  }

  test("readPruned returns an empty, correctly-typed frame when no file matches") {
    val zm = Compaction.zoneMap(spark, fragmented, Seq("n_chars"))
    val none = Compaction.readPruned(spark, fragmented, zm, "n_chars",
      lit(-500), lit(-100))
    assert(none.count() == 0)
    assert(none.schema.fieldNames.contains("doc_id"))
  }

  test("zoneMapRefresh profiles only new files and drops rows for vanished ones") {
    val dir = tmp("refresh")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.filter(col("doc_id") < 250).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val m0 = Compaction.zoneMap(spark, dir, Seq("n_chars"))
      .collect() // freeze the initial manifest
    val m0df = spark.createDataFrame(
      spark.sparkContext.parallelize(m0.toSeq),
      Compaction.zoneMap(spark, dir, Seq("n_chars")).schema)
    // append a batch: 4 more files land next to the original 4
    docs.filter(col("doc_id") >= 250).repartition(4)
      .write.mode("append").parquet(dir)
    val refreshed = Compaction.zoneMapRefresh(spark, dir, Seq("n_chars"), m0df)
    val full = Compaction.zoneMap(spark, dir, Seq("n_chars"))
    assert(refreshed.count() == 8)
    assert(refreshed.exceptAll(full).isEmpty && full.exceptAll(refreshed).isEmpty,
      "incremental refresh must equal a full rebuild")
    // rows for files that no longer exist must drop out
    val stale = m0df.withColumn("file", concat(col("file"), lit(".gone")))
    val cleaned = Compaction.zoneMapRefresh(spark, dir, Seq("n_chars"), stale)
    assert(cleaned.count() == 8, "stale rows dropped, all live files re-profiled")
  }

  test("planCompaction bins only sub-threshold files, never exceeds the target, skips singletons") {
    val files = Seq(
      ("a", 10L), ("b", 20L), ("c", 30L), ("d", 40L),
      ("big", 500L), ("e", 25L))
    val plan = Compaction.planCompaction(files, smallBytes = 50L,
      targetBytes = 60L)
    assert(plan.flatten.toSet.subsetOf(Set("a", "b", "c", "d", "e")),
      "an already-large file must never be rewritten")
    assert(plan.forall(g => g.size > 1), "singleton rewrites are pointless I/O")
    val size = files.toMap
    assert(plan.forall(g => g.map(size).sum <= 60L), s"over-target bin in $plan")
    // first-fit decreasing: d40+b20 fill one bin, c30+e25 the next; the
    // leftover a10 would be a singleton rewrite and is skipped
    assert(plan === Seq(Seq("d", "b"), Seq("c", "e")), plan.toString)
    assert(plan === Compaction.planCompaction(files.reverse, 50L, 60L),
      "the plan must be deterministic under listing order")
  }
}
