package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.DedupOps
import graft.storage.LocalFsStorage

class CsvRoundtripSpec extends SparkSpec {

  test("CSV sink quotes commas/quotes/newlines; Spark source reads them back") {
    import spark.implicits._
    val df = Seq(
      ("1", "plain", "x"),
      ("2", "has,comma", "y"),
      ("3", "has \"quotes\"", "z"),
      ("4", "has\nnewline", "w"),
      ("5", null, ""))
      .toDF("id", "tricky", "other")
      .withColumn("_ingest_ord", monotonically_increasing_id())
    val dir = Files.createTempDirectory("graft_csv").toString
    val storage = new LocalFsStorage
    val path = TableIo.writeCsv(df, storage, dir, "t.csv")

    val back = spark.read.option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(path).orderBy("id").collect()
    assert(back.length == 5)
    assert(back(1).getString(1) == "has,comma")
    assert(back(2).getString(1) == "has \"quotes\"")
    assert(back(3).getString(1) == "has\nnewline")
    // null and empty string both render as empty field (pandas to_csv parity)
    assert(back(4).isNullAt(1) || back(4).getString(1).isEmpty)
  }

  test("readParquetOrdered: ordinal stable across partitioning and re-reads") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pq").toString + "/t"
    // three files, values interleaved so file order ≠ value order
    (1 to 90).map(i => (i % 3, i)).toDF("part", "v")
      .repartition(3, col("part"))
      .write.parquet(dir)
    val read1 = TableIo.readParquetOrdered(spark, dir)
    assert(read1.columns.contains("_ingest_ord"))
    assert(read1.select("_ingest_ord").distinct().count() == 90)
    val order1 = read1.orderBy("_ingest_ord").select("v")
      .collect().map(_.getInt(0)).toSeq
    // a second read under different parallelism sees the identical order
    val order2 = TableIo.readParquetOrdered(spark, dir).repartition(7)
      .orderBy("_ingest_ord").select("v").collect().map(_.getInt(0)).toSeq
    assert(order1 == order2)
    // keep-first dedup over it is deterministic
    val d1 = DedupOps.dedupKeepFirst(read1, Seq("part"))
      .orderBy("part").select("v").collect().map(_.getInt(0)).toSeq
    val d2 = DedupOps.dedupKeepFirst(
        TableIo.readParquetOrdered(spark, dir).repartition(5), Seq("part"))
      .orderBy("part").select("v").collect().map(_.getInt(0)).toSeq
    assert(d1 == d2)
  }

  test("all-string CSV source attaches the ingest ordinal in file order") {
    val dir = Files.createTempDirectory("graft_csv2")
    Files.write(dir.resolve("in.csv"),
      "A,B\n1,x\n2,y\n3,z\n".getBytes("UTF-8"))
    val df = TableIo.readCsv(spark, dir.resolve("in.csv").toString)
    assert(df.schema.fields.filter(_.name != "_ingest_ord")
      .forall(_.dataType == org.apache.spark.sql.types.StringType))
    val rows = df.orderBy("_ingest_ord").select("A").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("1", "2", "3"))
  }
}
