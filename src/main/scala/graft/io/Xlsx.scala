package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal XLSX codec (SURVEY.md S4/S7).
  *
  * The reference reads/writes Excel via pandas+openpyxl
  * (/root/reference/etl_payroll_pipeline.py:84,92,151,410-417,620-627); the
  * offline environment has no POI/spark-excel jar, so this is a hand-rolled
  * implementation of the subset the pipelines need: first worksheet, header
  * row 0, shared/inline strings and numeric cells — every value surfaced as
  * String (the engine's all-string ingest rule, SURVEY §1.3).
  *
  * An .xlsx file is a zip: `xl/worksheets/sheet1.xml` holds cells,
  * `xl/sharedStrings.xml` the string pool. `.xls` (binary BIFF) is
  * explicitly unsupported.
  */
object Xlsx {

  /** Read the first worksheet into rows of optional cell values.
    * Missing cells inside a row (gaps in cell references) become None.
    *
    * A binary `.xls` payload (OLE2/CFB container, magic D0 CF 11 E0 —
    * [MS-CFB] §2.2) fails loudly here instead of surfacing a raw
    * ZipException; [[Xls.read]] is the BIFF8 reader for that format
    * (TableIo.readXlsx dispatches on the magic automatically). */
  def read(bytes: Array[Byte]): Seq[Seq[Option[String]]] = {
    if (bytes.length >= 4 &&
        (bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF &&
        (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0)
      throw new IllegalArgumentException(
        "binary .xls (BIFF/OLE2) payload — use Xls.read (TableIo.readXlsx" +
          " dispatches on the magic automatically)")
    var shared = Vector.empty[String]
    var sheet: Option[Array[Byte]] = None
    var firstSheetName: Option[String] = None

    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val entries = mutable.Map.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) entries(e.getName) = readAll(zin)
      e = zin.getNextEntry
    }
    zin.close()

    entries.get("xl/sharedStrings.xml").foreach { ss =>
      shared = parseSharedStrings(ss)
    }
    // first sheet: sheet1.xml by convention (pandas reads the first sheet)
    firstSheetName = entries.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml"))
      .toSeq.sortBy(n => n.replaceAll("\\D", "").toInt).headOption
    sheet = firstSheetName.map(entries)
    sheet.map(parseSheet(_, shared)).getOrElse(Seq.empty)
  }

  /** Read into (header, dataRows) where the header is row 0 trimmed, and
    * data cells are right-padded with None to the header width. */
  def readTable(bytes: Array[Byte]): (Seq[String], Seq[Seq[Option[String]]]) = {
    val rows = read(bytes)
    if (rows.isEmpty) (Seq.empty, Seq.empty)
    else {
      val header = rows.head.map(_.getOrElse(""))
      val width = header.length
      val data = rows.tail.map(r => r.padTo(width, None).take(width))
      (header, data)
    }
  }

  /** Write a single-sheet workbook: header + rows, all inline strings;
    * None → empty cell omitted. */
  def write(header: Seq[String], rows: Seq[Seq[Option[String]]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def rowXml(r: Int, cells: Seq[Option[String]]): Unit = {
      sb.append(s"""<row r="${r + 1}">""")
      cells.zipWithIndex.foreach {
        case (Some(v), c) =>
          sb.append(s"""<c r="${colRef(c)}${r + 1}" t="inlineStr"><is><t xml:space="preserve">${escape(v)}</t></is></c>""")
        case (None, _) => // omit empty cell
      }
      sb.append("</row>")
    }
    rowXml(0, header.map(Some(_)))
    rows.zipWithIndex.foreach { case (cells, i) => rowXml(i + 1, cells) }
    sb.append("</sheetData></worksheet>")
    put("xl/worksheets/sheet1.xml", sb.toString)
    z.close()
    bos.toByteArray
  }

  // --- internals -----------------------------------------------------------

  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    var n = in.read(tmp)
    while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
    buf.toByteArray
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[String]
    var current: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => current = new StringBuilder
            case "t" if current != null => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          current.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += current.toString; current = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  private def parseSheet(bytes: Array[Byte],
                         shared: Vector[String]): Seq[Seq[Option[String]]] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val rows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Option[String]]]
    var row: mutable.ArrayBuffer[Option[String]] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    var text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer.empty
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              text = new StringBuilder
            case "v" => inV = true
            case "t" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" =>
              val raw = text.toString
              val value: Option[String] = cellType match {
                case "s" => raw.toIntOption.flatMap(shared.lift)
                case "inlineStr" | "str" | "" | "n" | "b" =>
                  if (raw.isEmpty && cellType != "inlineStr") None else Some(raw)
                case _ => if (raw.isEmpty) None else Some(raw)
              }
              while (row.length < cellCol) row += None
              row += value
            case "row" => rows += row; row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.map(_.toSeq).toSeq
  }

  /** "A"→0, "B"→1, …, "AA"→26 from a cell ref like "BC12". */
  private def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def colRef(c: Int): String = {
    var n = c + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
