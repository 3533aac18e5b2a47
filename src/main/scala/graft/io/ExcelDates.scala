package graft.io

import java.time.LocalDate

/** Excel date-cell semantics shared by the [[Xlsx]] and [[Xls]] readers
  * (SURVEY S4). A date cell in either format is a NUMBER whose style's
  * number format is date-like; pandas (via openpyxl/xlrd) surfaces it as
  * datetime64, and the reference pipelines then parse/compare it
  * (/root/reference/etl_payroll_pipeline.py:322,374,438 — `Calc Date`,
  * `TRAN_CREATE_DT`). The engine's all-string ingest rule means we
  * instead render the serial as an ISO-8601 string that
  * `try_to_timestamp` (D8) parses, with the VALUE pandas would produce.
  *
  * Serial semantics mirror openpyxl's `from_excel` exactly so the
  * string path and the pandas path agree:
  *   - 1900 system: epoch 1899-12-30, serials 0 ≤ s < 60 get +1 day
  *     (so serial 1 = 1900-01-01); the phantom 1900-02-29 (serial 60)
  *     collapses onto 1900-02-28, as openpyxl does — no error, because
  *     pandas produces that exact value.
  *   - 1904 system (workbook flag): epoch 1904-01-01, no adjustment.
  *   - 0 < s < 1 is a time-of-day in either system (openpyxl returns
  *     `datetime.time`): rendered "HH:mm:ss[.ffffff]".
  *   - fraction → time via microsecond rounding (openpyxl rounds the
  *     day fraction to 6 decimal seconds).
  * Rendering: midnight datetimes print date-only ("2025-01-10") —
  * the same all-midnight convention as the pandas `to_csv` sink
  * ([[TableIo.csvBytes]]), and what the existing payroll fixtures use;
  * otherwise "yyyy-MM-dd HH:mm:ss[.ffffff]" (fraction trimmed of
  * trailing zeros). Both shapes parse under `try_to_timestamp`.
  */
object ExcelDates {

  private val MicrosPerDay = 86400000000L

  /** Builtin numFmtIds that are date/time formats ([ECMA-376] §18.8.30;
    * 14–22 core date/time, 27–36 and 50–58 East Asian locale dates,
    * 45–47 minute/second time formats).
    *
    * Builtin 46 ('[h]:mm:ss') is DELIBERATELY included even though its
    * format code is elapsed-duration shaped: the engine's contract is
    * "the value pandas would produce", and openpyxl's BUILTIN_FORMATS
    * path datetime-converts id 46 like every other 45–47 time format —
    * a cell styled with the builtin id must round-trip to the same
    * string the pandas path yields. The CUSTOM-format path diverges on
    * purpose ([[isDateFormatCode]] fails loud on '[h]:mm:ss'): a custom
    * numFmt is authored intent — the workbook writer explicitly declared
    * a duration, and surfacing 30:15:00 as "1900-01-01 06:15:00" would
    * silently corrupt, whereas the builtin id arrives from tools that
    * picked it off a style menu and is read by pandas as a time-of-day.
    * Same glyphs, different provenance, different right answer —
    * pinned by ExcelDatesSpec on both paths. */
  private val builtinDateIds: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  def isBuiltinDate(numFmtId: Int): Boolean = builtinDateIds(numFmtId)

  /** Classify a CUSTOM format code: true = date-like (any y/m/d/h/s
    * token outside quoted literals, escapes, and color/condition/locale
    * brackets). Elapsed-duration tokens ([h], [mm], [ss]) FAIL LOUD:
    * a duration is not an instant, so surfacing it as a datetime would
    * silently corrupt (the S4 discipline — fail, never guess). */
  def isDateFormatCode(code: String): Boolean = {
    // first section only (positive-number section), like openpyxl
    val section = code.split(';').headOption.getOrElse("")
    val sb = new StringBuilder
    var i = 0
    while (i < section.length) {
      section.charAt(i) match {
        case '\\' => i += 2 // escaped literal char
        case '"' =>
          val close = section.indexOf('"', i + 1)
          i = if (close < 0) section.length else close + 1
        case '[' =>
          val close = section.indexOf(']', i + 1)
          val body = section.substring(i + 1, if (close < 0) section.length else close)
          if (body.nonEmpty && body.toLowerCase.forall(c => "hms".contains(c)))
            throw new IllegalArgumentException(
              s"elapsed-duration format code '$code' — a [${body}] token " +
                "is a duration, not an instant; export ISO strings or use " +
                "a plain date format")
          i = if (close < 0) section.length else close + 1
        case _ => sb.append(section.charAt(i)); i += 1
      }
    }
    sb.toString.toLowerCase.exists(c => "ymdhs".contains(c))
  }

  /** Render an Excel date serial as the ISO string described above. */
  def serialToIso(serial: Double, date1904: Boolean): String = {
    require(serial >= 0,
      s"negative Excel date serial $serial — before the epoch; unsupported")
    var day = math.floor(serial).toLong
    var micros = math.round((serial - day) * MicrosPerDay)
    if (micros >= MicrosPerDay) { day += 1; micros -= MicrosPerDay }
    if (serial > 0 && serial < 1 && day == 0) {
      timeStr(micros) // time-of-day cell (openpyxl returns datetime.time)
    } else {
      val epoch =
        if (date1904) LocalDate.of(1904, 1, 1) else LocalDate.of(1899, 12, 30)
      val adj = if (!date1904 && serial < 60) day + 1 else day
      val date = epoch.plusDays(adj)
      if (micros == 0L) date.toString
      else s"$date ${timeStr(micros)}"
    }
  }

  /** Inverse of [[serialToIso]] for the write side: an ISO string
    * ("yyyy-MM-dd", optionally " HH:mm:ss[.ffffff]") → 1900-system
    * serial, or None when the string is not ISO-shaped (the writer then
    * emits it as a plain string cell). Dates before 1900-03-01 return
    * None too — inside the phantom-leap-day window the serial mapping
    * is not invertible, so such values stay strings rather than guess. */
  def isoToSerial(iso: String): Option[Double] = {
    val m = IsoRe.findFirstMatchIn(iso.trim)
    m.flatMap { g =>
      try {
        val date = LocalDate.of(g.group(1).toInt, g.group(2).toInt,
                                g.group(3).toInt)
        if (date.isBefore(LocalDate.of(1900, 3, 1))) None
        else {
          val days = java.time.temporal.ChronoUnit.DAYS
            .between(LocalDate.of(1899, 12, 30), date)
          val micros =
            if (g.group(4) == null) 0L
            else {
              val frac = Option(g.group(8))
                .map(f => f.padTo(6, '0').toLong).getOrElse(0L)
              (g.group(5).toLong * 3600 + g.group(6).toLong * 60 +
                Option(g.group(7)).map(_.toLong).getOrElse(0L)) * 1000000L +
                frac
            }
          Some(days.toDouble + micros.toDouble / MicrosPerDay)
        }
      } catch { case _: java.time.DateTimeException => None }
    }
  }

  private val IsoRe =
    ("^(\\d{4})-(\\d{2})-(\\d{2})" +
      "([ T](\\d{2}):(\\d{2})(?::(\\d{2})(?:\\.(\\d{1,6}))?)?)?$").r

  private def timeStr(micros: Long): String = {
    val totalSec = micros / 1000000L
    val frac = micros % 1000000L
    val base = f"${totalSec / 3600}%02d:${totalSec / 60 % 60}%02d:${totalSec % 60}%02d"
    if (frac == 0L) base
    else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
  }
}
