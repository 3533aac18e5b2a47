package graft.storage

import java.nio.file.Files
import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("catalog walk: schema, lowercased extensions, listing-order ordinals") {
    val root = Files.createTempDirectory("graft_cat")
    Files.createDirectories(root.resolve("sub"))
    Files.write(root.resolve("B_File.XLSX"), "x".getBytes)
    Files.write(root.resolve("a_file.csv"), "y".getBytes)
    Files.write(root.resolve("sub/PUA extract.xlsx"), "z".getBytes)
    val cat = Catalog.build(spark, new LocalFsStorage, root.toString)
    assert(cat.columns.contains("_ingest_ord"))
    val rows = cat.orderBy("_ingest_ord").collect()
    assert(rows.length == 3)
    // sorted walk: B_File.XLSX < a_file.csv (case-sensitive) < sub/...
    assert(rows.map(_.getAs[String]("extension")).toSeq ==
      Seq(".xlsx", ".csv", ".xlsx"))
  }

  test("detection predicates: F1 contains, F2 bounded regex, F3/F5, F9 first match") {
    val root = Files.createTempDirectory("graft_cat2")
    Files.write(root.resolve("Monthly CPA Report.xlsx"), "1".getBytes)
    Files.write(root.resolve("SCPAX.xlsx"), "2".getBytes)   // no word boundary
    Files.write(root.resolve("pua_data.xlsx"), "3".getBytes)
    Files.write(root.resolve("PUA second.xlsx"), "4".getBytes)
    Files.write(root.resolve("TS_Org.csv"), "5".getBytes)
    val cat = Catalog.build(spark, new LocalFsStorage, root.toString)

    val cpa = Catalog.firstMatch(cat,
      Catalog.nameMatchesBounded("CPA") && Catalog.hasExtension(".xlsx"))
    assert(cpa.map(_.file_name).contains("Monthly CPA Report.xlsx"))

    // F1 is case-insensitive substring: matches both pua files; F9 picks the
    // positionally-first in (sorted) listing order
    val pua = Catalog.firstMatch(cat, Catalog.nameContains("PUA"))
    assert(pua.map(_.file_name).contains("PUA second.xlsx"))

    assert(Catalog.firstMatch(cat, Catalog.nameEquals("ts_org.CSV"))
      .map(_.file_name).contains("TS_Org.csv"))
    assert(Catalog.firstMatch(cat, Catalog.nameEquals("nope.csv")).isEmpty)
  }
}
