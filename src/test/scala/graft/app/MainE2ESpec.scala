package graft.app

import java.nio.file.Files
import graft.SparkSpec
import graft.io.{TableIo, Xlsx}
import graft.pipeline.PayrollFixtures._
import graft.storage.LocalFsStorage

/** End-to-end: fixture files on disk → catalog discovery → XLSX/CSV loads
  * → both pipelines → date-stamped CSV+XLSX sinks, with a pinned clock. */
class MainE2ESpec extends SparkSpec {

  private def csvBytes(cols: Seq[String], rows: Seq[Seq[Option[String]]]): Array[Byte] = {
    def cell(v: Option[String]) = v.map { s =>
      if (s.exists(c => c == ',' || c == '"' || c == '\n')) "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }.getOrElse("")
    (cols.mkString(",") + "\n" +
      rows.map(_.map(cell).mkString(",")).mkString("\n")).getBytes("UTF-8")
  }

  test("full payroll run: discovery, loads, pipelines, stamped sinks") {
    val root = Files.createTempDirectory("graft_e2e")
    val inDir = root.resolve("inputs"); val lkDir = root.resolve("lookups")
    val outDir = root.resolve("out")
    Files.createDirectories(inDir); Files.createDirectories(lkDir)
    val storage = new LocalFsStorage

    // primary PUA extract as a real XLSX produced by our own codec
    Files.write(inDir.resolve("Monthly PUA Extract.xlsx"),
      Xlsx.write(PuaColumns, PuaRows))
    // lookups + certs as CSVs with the reference's exact names/patterns
    Files.write(lkDir.resolve("TS_Org.csv"), csvBytes(TsOrgColumns, TsOrgRows))
    Files.write(lkDir.resolve("TS_Dept.csv"), csvBytes(TsDeptColumns, TsDeptRows))
    Files.write(lkDir.resolve("Overtime_E_Class.csv"),
      csvBytes(OvertimeColumns, OvertimeRows))
    Files.write(lkDir.resolve("TE_M.csv"), csvBytes(TeMColumns, TeMRows))
    Files.write(lkDir.resolve("Feeder_List.csv"),
      "col1\nv1\n".getBytes("UTF-8"))
    Files.write(lkDir.resolve("Cert BW extract.csv"),
      csvBytes(CertColumns, CertBwRows))
    Files.write(lkDir.resolve("Cert MN extract.csv"),
      csvBytes(CertColumns, CertMnRows))

    spark.catalog.clearCache() // known-clean baseline for the scope check
    val written = Main.run(spark, storage, inDir.toString, lkDir.toString,
      outDir.toString, FixedClock)

    // Main wraps each pipeline unit in CacheScope.using: every
    // operator-internal persist must be freed by the time run returns —
    // a long-lived session must not accumulate pinned executor memory
    assert(spark.sharedState.cacheManager.isEmpty,
      "pipeline-internal caches survived Main.run")

    assert(written.size == 4, s"expected 4 outputs, got $written")
    // stamped names from the pinned clock: MMddyyyy_HHmm of 2025-03-15T12:00Z
    assert(written.exists(_.endsWith("PUA_Data_Transformed_03152025_1200.csv")))
    assert(written.exists(_.endsWith("CPA_Data_Transformed_03152025_1200.xlsx")))

    // PUA CSV golden properties: 6 surviving rows, 26 columns, dedup winner
    val puaCsv = new String(Files.readAllBytes(
      java.nio.file.Paths.get(
        written.find(p => p.endsWith(".csv") && p.contains("PUA")).get)), "UTF-8")
    val lines = puaCsv.trim.split("\n").toSeq
    assert(lines.head.split(",", -1).length == 26)
    assert(lines.size == 7) // header + 6 rows
    assert(lines.exists(l => l.contains("u1") && l.contains("RGS")))
    assert(!lines.exists(_.contains("OVT"))) // dedup dropped the second u1 row

    // CPA outputs: 3 rows × 20 cols
    val cpaCsv = new String(Files.readAllBytes(
      java.nio.file.Paths.get(
        written.find(p => p.endsWith(".csv") && p.contains("CPA")).get)), "UTF-8")
    val cpaLines = cpaCsv.trim.split("\n").toSeq
    assert(cpaLines.head.split(",", -1).length == 20)
    assert(cpaLines.size == 4)
    assert(cpaLines.exists(_.contains("u2-nan") == false)) // UIN Job not in output

    // XLSX sink round-trips through our own reader
    val (h, rows) = Xlsx.readTable(storage.readBytes(
      written.find(_.endsWith("PUA_Data_Transformed_03152025_1200.xlsx")).get))
    assert(h.length == 26 && rows.size == 6)
  }
}
