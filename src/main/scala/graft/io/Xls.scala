package graft.io

import scala.collection.mutable

/** Minimal binary `.xls` (BIFF8 inside an OLE2/CFB container) reader —
  * closing the last reference-surface gap: the reference's detection
  * filter accepts `.xls` alongside `.xlsx`
  * (/root/reference/etl_payroll_pipeline.py:69,74), and until now the
  * engine failed loud with a convert-to-xlsx message.
  *
  * Scope is fixture-grade, matching [[Xlsx]]'s contract: first worksheet,
  * header row 0, every value surfaced as String (the all-string ingest
  * rule, SURVEY §1.3). Supported cell records: LABELSST, LABEL (inline),
  * NUMBER, RK, MULRK, BLANK/MULBLANK, BOOLERR's boolean value
  * ("TRUE"/"FALSE" — Excel's display strings, the xlrd bool surface),
  * and FORMULA's CACHED result (numeric — date-styled like any
  * NUMBER — boolean, blank, or string via the following STRING record,
  * INCLUDING a result spilling into CONTINUE records — the legal BIFF8
  * continuation where each fragment re-states its own encoding flag;
  * the value pandas/xlrd surfaces for a computed payroll column,
  * matching the XLSX side where the StAX reader takes `<v>` and
  * ignores `<f>`). Anything the reader cannot faithfully surface — an
  * ERROR value (cached or BOOLERR: xlrd maps those to NaN, a silent
  * value loss this reader refuses), an SST/FORMAT spilling into a
  * CONTINUE record, a STRING record arriving with no pending FORMULA
  * (record-stream desync) — FAILS LOUD with the record name, never
  * silently drops a value (the S4 discipline).
  *
  * Container ([MS-CFB]): 512-byte sectors (major version 3), FAT from
  * the header DIFAT, directory chain, and the mini-stream path — real
  * small workbooks store the Workbook stream in 64-byte mini sectors
  * (streams < 4096 bytes MUST per spec), so both chains are implemented.
  * Unsupported container shapes (version 4 / 4096-byte sectors, DIFAT
  * overflow sectors) fail loud.
  *
  * Numbers render as the shortest faithful string: integral doubles
  * print as longs (42, not 42.0), everything else as Double.toString —
  * the D3 strip-`.0` op downstream makes the pipelines insensitive to
  * this choice either way.
  */
object Xls {

  /** OLE2/CFB magic D0 CF 11 E0 A1 B1 1A E1 ([MS-CFB] §2.2). */
  def isOle2(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF &&
      (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0 &&
      (bytes(4) & 0xFF) == 0xA1 && (bytes(5) & 0xFF) == 0xB1 &&
      (bytes(6) & 0xFF) == 0x1A && (bytes(7) & 0xFF) == 0xE1

  /** Read one worksheet into rows of optional cell values —
    * [[Xlsx.read]]'s contract on the binary format: `sheetName = None`
    * reads the first sheet, `Some(name)` selects by BOUNDSHEET name
    * (fail-loud when absent). Date-styled NUMBER/RK/MULRK cells (the
    * XF's ifmt is a builtin date id or a date-like FORMAT code, with
    * the DATE1904 record honored) surface as ISO-8601 strings via
    * [[ExcelDates]]. */
  def read(bytes: Array[Byte],
           sheetName: Option[String] = None): Seq[Seq[Option[String]]] = {
    require(isOle2(bytes), "not an OLE2/CFB container (.xls)")
    val wb = cfbStreams(bytes).collectFirst {
      case (name, data) if name == "Workbook" || name == "Book" => data
    }.getOrElse(throw new IllegalArgumentException(
      "no Workbook/Book stream in the OLE2 container"))
    parseBiff(wb, sheetName)
  }

  /** (header, dataRows) — [[Xlsx.readTable]]'s contract. */
  def readTable(bytes: Array[Byte], sheetName: Option[String] = None)
      : (Seq[String], Seq[Seq[Option[String]]]) = {
    val rows = read(bytes, sheetName)
    if (rows.isEmpty) (Seq.empty, Seq.empty)
    else {
      val header = rows.head.map(_.getOrElse(""))
      val width = header.length
      (header, rows.tail.map(r => r.padTo(width, None).take(width)))
    }
  }

  // --- OLE2/CFB container ---------------------------------------------------

  private val EndOfChain = 0xFFFFFFFEL
  private val SectorSize = 512
  private val MiniSectorSize = 64
  private val MiniCutoff = 4096L

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (u16(b, off).toLong) | (u16(b, off + 2).toLong << 16)

  /** All stream entries of the container: (name, bytes). */
  private[io] def cfbStreams(b: Array[Byte]): Seq[(String, Array[Byte])] = {
    val major = u16(b, 26)
    require(major == 3,
      s"unsupported CFB major version $major (only 3 / 512-byte sectors)")
    val numDifat = u32(b, 72)
    require(numDifat == 0,
      s"DIFAT overflow sectors unsupported (numDifatSectors=$numDifat)")
    val numFat = u32(b, 44)
    val firstDir = u32(b, 48)
    val firstMiniFat = u32(b, 60)
    val numMiniFat = u32(b, 64)

    def sector(i: Long): Array[Byte] = {
      val off = SectorSize * (i.toInt + 1)
      require(off >= 0 && off + SectorSize <= b.length,
        s"sector $i out of bounds")
      java.util.Arrays.copyOfRange(b, off, off + SectorSize)
    }
    // FAT = concat of the sectors named by the header DIFAT (<= 109)
    val fat: Array[Long] = (0 until math.min(numFat, 109L).toInt).flatMap {
      j =>
        val s = sector(u32(b, 76 + 4 * j))
        (0 until SectorSize / 4).map(k => u32(s, 4 * k))
    }.toArray
    def chain(start: Long, fatArr: Array[Long]): Seq[Long] = {
      val out = mutable.ArrayBuffer.empty[Long]
      var cur = start
      while (cur != EndOfChain && cur != 0xFFFFFFFFL) {
        require(cur >= 0 && cur < fatArr.length, s"chain sector $cur invalid")
        require(out.length <= fatArr.length, "cyclic sector chain")
        out += cur
        cur = fatArr(cur.toInt)
      }
      out.toSeq
    }
    def readChain(start: Long, size: Long): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      chain(start, fat).foreach(i => buf.write(sector(i)))
      java.util.Arrays.copyOf(buf.toByteArray, size.toInt)
    }
    // directory entries (128 bytes each) from the directory chain
    val dirBytes = {
      val buf = new java.io.ByteArrayOutputStream()
      chain(firstDir, fat).foreach(i => buf.write(sector(i)))
      buf.toByteArray
    }
    final case class Entry(name: String, objType: Int, start: Long,
                           size: Long)
    val entries = (0 until dirBytes.length / 128).map { i =>
      val off = i * 128
      val nameLen = u16(dirBytes, off + 64) // bytes incl. terminator
      val name =
        if (nameLen >= 2)
          new String(dirBytes, off, nameLen - 2, "UTF-16LE")
        else ""
      Entry(name, dirBytes(off + 66) & 0xFF,
            u32(dirBytes, off + 116),
            u32(dirBytes, off + 120) | (u32(dirBytes, off + 124) << 32))
    }
    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("CFB has no root entry"))
    // mini stream: the root entry's own chain; mini FAT from the header
    lazy val miniStream = readChain(root.start, root.size)
    lazy val miniFat: Array[Long] =
      chain(firstMiniFat, fat).take(numMiniFat.toInt).flatMap { i =>
        val s = sector(i)
        (0 until SectorSize / 4).map(k => u32(s, 4 * k))
      }.toArray
    def readMiniChain(start: Long, size: Long): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      chain(start, miniFat).foreach { i =>
        val off = (i * MiniSectorSize).toInt
        require(off + MiniSectorSize <= miniStream.length,
          s"mini sector $i out of bounds")
        buf.write(miniStream, off, MiniSectorSize)
      }
      java.util.Arrays.copyOf(buf.toByteArray, size.toInt)
    }
    entries.filter(_.objType == 2).map { e =>
      e.name -> (if (e.size >= MiniCutoff) readChain(e.start, e.size)
                 else readMiniChain(e.start, e.size))
    }
  }

  // --- BIFF8 records ----------------------------------------------------

  private val RBof = 0x0809
  private val REof = 0x000A
  private val RSst = 0x00FC
  private val RContinue = 0x003C
  private val RLabelSst = 0x00FD
  private val RLabel = 0x0204
  private val RNumber = 0x0203
  private val RRk = 0x027E
  private val RMulRk = 0x00BD
  private val RFormula = 0x0006
  private val RString = 0x0207
  private val RBoolErr = 0x0205
  private val RFormat = 0x041E
  private val RXf = 0x00E0
  private val RDate1904 = 0x0022
  private val RBoundSheet = 0x0085

  private def numStr(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** 30-bit RK encoding: bit0 = ×1/100, bit1 = int-vs-double-high-bits. */
  private def rkValue(raw: Long): Double = {
    val base =
      // signed 30-bit int: reinterpret the u32 as Int FIRST so the
      // arithmetic shift carries the sign down
      if ((raw & 2L) != 0) (raw.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((raw & 0xFFFFFFFCL) << 32)
    if ((raw & 1L) != 0) base / 100.0 else base
  }

  private def parseBiff(wb: Array[Byte],
                        sheetName: Option[String]): Seq[Seq[Option[String]]] = {
    var pos = 0
    def hasRec = pos + 4 <= wb.length
    val sst = mutable.ArrayBuffer.empty[String]
    val cells = mutable.Map.empty[(Int, Int), String] // (row, col) -> value
    val xfFmt = mutable.ArrayBuffer.empty[Int]    // XF index -> ifmt
    val customFmt = mutable.Map.empty[Int, String] // ifmt -> format code
    val sheetNames = mutable.ArrayBuffer.empty[String] // BOUNDSHEET order
    var date1904 = false
    var bofDepth = 0  // which substream we are in
    var inSheet1 = false
    var sheetDone = false
    var sheetsSeen = 0
    // a FORMULA whose cached result is a string: (row, col) awaiting the
    // following STRING record
    var pendingString: Option[(Int, Int)] = None
    // target sheet ordinal: BOUNDSHEET records precede all sheet
    // substreams in the globals, so by the first sheet BOF the name
    // table is complete
    var targetOrd = 1
    def isDateXf(ixfe: Int): Boolean =
      xfFmt.lift(ixfe).exists { ifmt =>
        customFmt.get(ifmt).map(ExcelDates.isDateFormatCode)
          .getOrElse(ExcelDates.isBuiltinDate(ifmt))
      }
    def cellNum(d: Double, ixfe: Int): String =
      if (isDateXf(ixfe)) ExcelDates.serialToIso(d, date1904) else numStr(d)
    while (hasRec && !sheetDone) {
      val id = u16(wb, pos)
      val len = u16(wb, pos + 2)
      val off = pos + 4
      require(off + len <= wb.length, s"truncated BIFF record 0x${id.toHexString}")
      id match {
        case RBof =>
          bofDepth += 1
          if (bofDepth > 1) { // a substream after globals
            if (sheetsSeen == 0) sheetName.foreach { want =>
              val i = sheetNames.indexOf(want)
              require(i >= 0, s"no sheet named '$want' — workbook has " +
                sheetNames.mkString("[", ", ", "]"))
              targetOrd = i + 1
            }
            sheetsSeen += 1
            inSheet1 = sheetsSeen == targetOrd
          }
        case REof =>
          if (inSheet1) sheetDone = true
          inSheet1 = false
          require(pendingString.isEmpty,
            "sheet ended with a FORMULA string result missing its " +
              "STRING record — corrupt or unsupported workbook")
        case RDate1904 =>
          date1904 = u16(wb, off) != 0
        case RXf =>
          xfFmt += u16(wb, off + 2) // ifmt ([MS-XLS] XF, offset 2)
        case RFormat =>
          // ifmt u16 + XLUnicodeString (cch u16, grbit u8, chars) — the
          // string must FIT the record: a format code split across a
          // CONTINUE record (legal BIFF8, like the SST case) would
          // otherwise read the next record's bytes as characters
          val ifmt = u16(wb, off)
          val cch = u16(wb, off + 2)
          val grbit = wb(off + 4) & 0xFF
          val need = 5 + cch * (if ((grbit & 0x01) != 0) 2 else 1)
          require(need <= len,
            s"FORMAT record for ifmt $ifmt: $cch-char code spills into a " +
              "CONTINUE record — unsupported (fixture-grade reader); " +
              "shorten the format code or convert to .xlsx")
          customFmt(ifmt) =
            if ((grbit & 0x01) != 0)
              new String(wb, off + 5, cch * 2, "UTF-16LE")
            else {
              val cs = new Array[Char](cch)
              var j = 0
              while (j < cch) { cs(j) = (wb(off + 5 + j) & 0xFF).toChar; j += 1 }
              new String(cs)
            }
        case RBoundSheet =>
          // lbPlyPos u32, grbit u16, then ShortXLUnicodeString (cch u8);
          // bounded like FORMAT — fail descriptive, never read past the
          // record
          val cch = wb(off + 6) & 0xFF
          val grbit = wb(off + 7) & 0xFF
          val need = 8 + cch * (if ((grbit & 0x01) != 0) 2 else 1)
          require(need <= len,
            s"BOUNDSHEET record: $cch-char sheet name spills into a " +
              "CONTINUE record — unsupported (fixture-grade reader)")
          sheetNames +=
            (if ((grbit & 0x01) != 0)
               new String(wb, off + 8, cch * 2, "UTF-16LE")
             else {
               val cs = new Array[Char](cch)
               var j = 0
               while (j < cch) { cs(j) = (wb(off + 8 + j) & 0xFF).toChar; j += 1 }
               new String(cs)
             })
        case RSst =>
          // cstTotal u32, cstUnique u32, then XLUnicodeRichExtendedString*
          val unique = u32(wb, off + 4)
          var p = off + 8
          var i = 0L
          while (i < unique) {
            require(p < off + len,
              "SST spills into a CONTINUE record — unsupported (fixture-" +
                "grade reader); split the string table or convert to .xlsx")
            val cch = u16(wb, p); p += 2
            val grbit = wb(p) & 0xFF; p += 1
            val rich = (grbit & 0x08) != 0
            val ext = (grbit & 0x04) != 0
            val cRun = if (rich) { val r = u16(wb, p); p += 2; r } else 0
            val cbExt = if (ext) { val r = u32(wb, p); p += 4; r } else 0L
            val s =
              if ((grbit & 0x01) != 0) { // UTF-16LE
                val str = new String(wb, p, cch * 2, "UTF-16LE"); p += cch * 2
                str
              } else { // compressed: low bytes of UTF-16
                val cs = new Array[Char](cch)
                var j = 0
                while (j < cch) { cs(j) = (wb(p + j) & 0xFF).toChar; j += 1 }
                p += cch
                new String(cs)
              }
            p += 4 * cRun + cbExt.toInt
            sst += s
            i += 1
          }
        case RContinue =>
          // legal after many records; the SST parser above already fails
          // loud if its strings spill here, so a CONTINUE is skippable
          ()
        case RLabelSst if inSheet1 =>
          val rw = u16(wb, off); val c = u16(wb, off + 2)
          val isst = u32(wb, off + 6)
          require(isst < sst.length, s"LABELSST isst $isst out of range")
          cells((rw, c)) = sst(isst.toInt)
        case RLabel if inSheet1 =>
          val rw = u16(wb, off); val c = u16(wb, off + 2)
          val cch = u16(wb, off + 6)
          val grbit = wb(off + 8) & 0xFF
          cells((rw, c)) =
            if ((grbit & 0x01) != 0)
              new String(wb, off + 9, cch * 2, "UTF-16LE")
            else {
              val cs = new Array[Char](cch)
              var j = 0
              while (j < cch) { cs(j) = (wb(off + 9 + j) & 0xFF).toChar; j += 1 }
              new String(cs)
            }
        case RNumber if inSheet1 =>
          val rw = u16(wb, off); val c = u16(wb, off + 2)
          val ixfe = u16(wb, off + 4)
          var bits = 0L
          var j = 0
          while (j < 8) { bits |= (wb(off + 6 + j) & 0xFFL) << (8 * j); j += 1 }
          cells((rw, c)) = cellNum(java.lang.Double.longBitsToDouble(bits), ixfe)
        case RRk if inSheet1 =>
          val rw = u16(wb, off); val c = u16(wb, off + 2)
          cells((rw, c)) = cellNum(rkValue(u32(wb, off + 6)), u16(wb, off + 4))
        case RMulRk if inSheet1 =>
          val rw = u16(wb, off)
          val colFirst = u16(wb, off + 2)
          val nCells = (len - 6) / 6
          var j = 0
          while (j < nCells) {
            cells((rw, colFirst + j)) =
              cellNum(rkValue(u32(wb, off + 4 + 6 * j + 2)),
                      u16(wb, off + 4 + 6 * j))
            j += 1
          }
        case RFormula if inSheet1 =>
          // CACHED formula result ([MS-XLS] 2.4.127 FormulaValue) — the
          // value pandas/xlrd surfaces for a computed cell (a payroll
          // extract with computed columns reads its VALUES, never the
          // formula text). 8 bytes at +6: when the high word (bytes
          // 6–7) is 0xFFFF, byte 0 selects string (the text follows in
          // a STRING record) / boolean (value in byte 2, rendered
          // "TRUE"/"FALSE" — Excel's display strings, the xlrd bool
          // surface) / error / blank-string; otherwise the 8 bytes are
          // the cached IEEE double, honoring the cell's date style like
          // any NUMBER. Error results still fail loud: the all-string
          // surface has no faithful rendering (xlrd maps errors to
          // NaN — a silent value loss this reader refuses).
          require(len >= 14,
            s"truncated FORMULA record ($len bytes < the 14-byte fixed " +
              "prefix) — corrupt workbook")
          val rw = u16(wb, off); val c = u16(wb, off + 2)
          val ixfe = u16(wb, off + 4)
          require(pendingString.isEmpty,
            "FORMULA with a string result was not followed by its " +
              "STRING record — corrupt or unsupported workbook")
          if (u16(wb, off + 12) == 0xFFFF) {
            (wb(off + 6) & 0xFF) match {
              case 0 => pendingString = Some((rw, c)) // next STRING record
              case 3 => cells((rw, c)) = ""           // cached blank string
              case 1 => cells((rw, c)) =
                if ((wb(off + 8) & 0xFF) != 0) "TRUE" else "FALSE"
              case 2 => throw new IllegalArgumentException(
                "FORMULA with a cached ERROR result — the value is " +
                  "lost; recompute and export values, or convert to .xlsx")
              case other => throw new IllegalArgumentException(
                s"FORMULA cached-value type $other unsupported")
            }
          } else {
            var bits = 0L
            var j = 0
            while (j < 8) { bits |= (wb(off + 6 + j) & 0xFFL) << (8 * j); j += 1 }
            cells((rw, c)) =
              cellNum(java.lang.Double.longBitsToDouble(bits), ixfe)
          }
        case RString if inSheet1 =>
          // the cached string result of the preceding FORMULA
          // (XLUnicodeString: cch u16, grbit u8, chars). A result longer
          // than the record legally continues into CONTINUE records —
          // the BIFF8 string-continuation rule: each fragment restates
          // its OWN option-flags byte (the encoding may flip mid-string),
          // then carries characters only. The walk below reads exactly
          // cch characters across the chain, validating each fragment
          // boundary, and never consumes a byte past the declared
          // lengths — the same bounded discipline as the one-record
          // case. (The main loop re-visits the consumed CONTINUEs and
          // skips them via the RContinue no-op arm.)
          pendingString match {
            case Some((rw, c)) =>
              require(len >= 3,
                s"truncated STRING record ($len bytes < the 3-byte " +
                  "header) — corrupt workbook")
              val cch = u16(wb, off)
              val grbit0 = wb(off + 2) & 0xFF
              // rich-text (0x08) / phonetic-ext (0x04) variants shift
              // the character start (the SST parser's cRun/cbExt
              // layout) — fail loud rather than mis-decode
              require((grbit0 & 0x0C) == 0,
                "STRING record with rich-text/ext flags — unsupported " +
                  "(fixture-grade reader); convert to .xlsx")
              val sb = new java.lang.StringBuilder(cch)
              var remaining = cch
              var wide = (grbit0 & 0x01) != 0
              var p = off + 3
              var fEnd = off + len
              while (remaining > 0) {
                val avail = if (wide) (fEnd - p) / 2 else fEnd - p
                val take = math.min(remaining, avail)
                if (wide) {
                  sb.append(new String(wb, p, take * 2, "UTF-16LE"))
                  p += take * 2
                } else {
                  var j = 0
                  while (j < take) {
                    sb.append(((wb(p + j) & 0xFF)).toChar); j += 1
                  }
                  p += take
                }
                remaining -= take
                if (remaining > 0) {
                  require(p == fEnd && fEnd + 4 <= wb.length &&
                      u16(wb, fEnd) == RContinue,
                    s"STRING record: $remaining chars of the formula " +
                      "result remain but no CONTINUE record follows — " +
                      "corrupt workbook")
                  val clen = u16(wb, fEnd + 2)
                  require(clen >= 1,
                    "empty CONTINUE fragment inside a STRING result — " +
                      "corrupt workbook")
                  val g = wb(fEnd + 4) & 0xFF
                  require((g & 0xFE) == 0,
                    "STRING continuation fragment with non-encoding " +
                      "option flags — unsupported (fixture-grade reader)")
                  wide = (g & 0x01) != 0
                  p = fEnd + 5
                  fEnd = fEnd + 4 + clen
                }
              }
              cells((rw, c)) = sb.toString
              pendingString = None
            case None => throw new IllegalArgumentException(
              "STRING record with no pending FORMULA — record-stream " +
                "desync (e.g. a shared-formula layout this reader does " +
                "not model); convert to .xlsx")
          }
        case RBoolErr if inSheet1 =>
          // rw u16, col u16, ixfe u16, bBoolErr u8, fError u8: a literal
          // boolean renders like the cached-FORMULA boolean; an error
          // value stays loud (same rationale as the FORMULA error arm)
          val rw = u16(wb, off); val c = u16(wb, off + 2)
          if ((wb(off + 7) & 0xFF) == 0)
            cells((rw, c)) = if ((wb(off + 6) & 0xFF) != 0) "TRUE" else "FALSE"
          else throw new IllegalArgumentException(
            "BOOLERR cell with an ERROR value — the value is lost; " +
              "recompute and export values, or convert to .xlsx")
        case _ => () // DIMENSION/ROW/INDEX/window/format records: no values
      }
      pos = off + len
    }
    if (cells.isEmpty) Seq.empty
    else {
      val maxRow = cells.keys.map(_._1).max
      (0 to maxRow).map { r =>
        val rowCells = cells.collect { case ((`r`, c), v) => c -> v }
        if (rowCells.isEmpty) Seq.empty[Option[String]]
        else {
          val maxCol = rowCells.keys.max
          (0 to maxCol).map(c => rowCells.get(c)).toSeq
        }
      }
    }
  }
}
