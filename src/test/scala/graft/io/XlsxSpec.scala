package graft.io

class XlsxSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("write → read roundtrip preserves header, values, nulls, specials") {
    val header = Seq("A Col", "B & <Col>", "C")
    val rows = Seq(
      Seq(Some("v1"), Some("2.0"), None),
      Seq(None, Some("x & <y>"), Some("  spaced  ")),
      Seq(Some("ok"), None, None))
    val bytes = Xlsx.write(header, rows)
    val (h2, r2) = Xlsx.readTable(bytes)
    assert(h2 == header)
    assert(r2 == rows)
  }

  test("reader pads short rows and handles cell-reference gaps") {
    // hand-build a sheet where row 2 skips column B entirely
    val bytes = Xlsx.write(Seq("A", "B", "C"),
      Seq(Seq(Some("1"), None, Some("3"))))
    val (_, rows) = Xlsx.readTable(bytes)
    assert(rows.head == Seq(Some("1"), None, Some("3")))
  }

  test("binary .xls (BIFF/OLE2 magic) fails loudly, not with a zip error") {
    // an OLE2 compound-file header: D0 CF 11 E0 A1 B1 1A E1 + padding
    val biff = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte) ++ Array.fill[Byte](504)(0)
    val ex = intercept[IllegalArgumentException](Xlsx.read(biff))
    assert(ex.getMessage.contains(".xls"))
    // the message now routes to the BIFF8 reader instead of demanding a
    // manual conversion (XlsSpec covers that path)
    assert(ex.getMessage.contains("Xls.read"))
  }

  test("shared-strings workbooks parse (synthetic sharedStrings.xml)") {
    // minimal workbook using the shared-strings table instead of inline
    import java.io.ByteArrayOutputStream
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(n: String, c: String): Unit = {
      z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>H1</t></si><si><t>val one</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val (header, rows) = Xlsx.readTable(bos.toByteArray)
    assert(header == Seq("H1"))
    assert(rows == Seq(Seq(Some("val one"))))         // padded to header width
    val full = Xlsx.read(bos.toByteArray)
    assert(full(1) == Seq(Some("val one"), Some("42.5"))) // numeric as string
  }
}
