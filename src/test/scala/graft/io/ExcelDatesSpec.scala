package graft.io

/** [[ExcelDates]] serial semantics pinned against hand-computed
  * openpyxl `from_excel` values (the library pandas `read_excel`
  * delegates to), including the 1900 leap-year bug window, the 1904
  * epoch, time-of-day fractions, and the format-code classifier. */
class ExcelDatesSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("1900-system serials match openpyxl (epoch shift + phantom Feb 29)") {
    assert(ExcelDates.serialToIso(0, date1904 = false) == "1899-12-31")
    assert(ExcelDates.serialToIso(1, date1904 = false) == "1900-01-01")
    assert(ExcelDates.serialToIso(59, date1904 = false) == "1900-02-28")
    // the phantom 1900-02-29 collapses onto Feb 28, as openpyxl maps it
    assert(ExcelDates.serialToIso(60, date1904 = false) == "1900-02-28")
    assert(ExcelDates.serialToIso(61, date1904 = false) == "1900-03-01")
    // modern dates: 44927 = 2023-01-01 (a well-known anchor)
    assert(ExcelDates.serialToIso(44927, date1904 = false) == "2023-01-01")
    assert(ExcelDates.serialToIso(45000, date1904 = false) == "2023-03-15")
  }

  test("fractions render time; midnight renders date-only") {
    assert(ExcelDates.serialToIso(45000.5, date1904 = false) ==
      "2023-03-15 12:00:00")
    assert(ExcelDates.serialToIso(45000.520833333336, date1904 = false) ==
      "2023-03-15 12:30:00")
    // sub-second survives via microsecond rounding, trailing zeros trimmed
    assert(ExcelDates.serialToIso(45000 + 0.25 / 86400, date1904 = false) ==
      "2023-03-15 00:00:00.25")
    // 0 < s < 1 is a time-of-day cell (openpyxl returns datetime.time)
    assert(ExcelDates.serialToIso(0.5, date1904 = false) == "12:00:00")
    assert(ExcelDates.serialToIso(0.5, date1904 = true) == "12:00:00")
  }

  test("1904-system epoch") {
    assert(ExcelDates.serialToIso(0, date1904 = true) == "1904-01-01")
    // 1904 is a real leap year: 31 + 29 + 31 + 9 = 100
    assert(ExcelDates.serialToIso(100, date1904 = true) == "1904-04-10")
    assert(ExcelDates.serialToIso(45000.5, date1904 = true) ==
      "2027-03-16 12:00:00")
  }

  test("negative serials fail loud") {
    intercept[IllegalArgumentException](
      ExcelDates.serialToIso(-1.0, date1904 = false))
  }

  test("builtin date ids: 14-22/27-36/45-47/50-58 yes, others no") {
    assert((14 to 22).forall(ExcelDates.isBuiltinDate))
    assert((45 to 47).forall(ExcelDates.isBuiltinDate))
    assert(!ExcelDates.isBuiltinDate(0))   // General
    assert(!ExcelDates.isBuiltinDate(2))   // 0.00
    assert(!ExcelDates.isBuiltinDate(44))  // currency
    assert(!ExcelDates.isBuiltinDate(49))  // @ text
  }

  test("custom format codes classify by date tokens outside literals") {
    assert(ExcelDates.isDateFormatCode("yyyy-mm-dd"))
    assert(ExcelDates.isDateFormatCode("dd/mm/yyyy hh:mm"))
    assert(ExcelDates.isDateFormatCode("[$-409]mmm\\-yy"))   // locale prefix
    assert(ExcelDates.isDateFormatCode("[Red]yyyy"))         // color prefix
    assert(!ExcelDates.isDateFormatCode("0.00"))
    assert(!ExcelDates.isDateFormatCode("#,##0"))
    assert(!ExcelDates.isDateFormatCode("General"))
    assert(!ExcelDates.isDateFormatCode("0.00E+00"))
    // date letters inside quoted literals do NOT make it a date
    assert(!ExcelDates.isDateFormatCode("0\" days\""))
    assert(!ExcelDates.isDateFormatCode("\"hms\"0"))
    // escaped literal chars are skipped too
    assert(!ExcelDates.isDateFormatCode("0\\d"))
    // only the first ;-section counts (negative section is cosmetic)
    assert(!ExcelDates.isDateFormatCode("0.0;[Red]\\-0.0"))
  }

  test("isoToSerial inverts serialToIso (write-side roundtrip)") {
    for (iso <- Seq("1900-03-01", "2023-03-15", "2025-01-15",
                    "2023-03-15 12:30:00", "2025-06-30 08:00:00",
                    "2023-03-15 00:00:00.25")) {
      val serial = ExcelDates.isoToSerial(iso)
      assert(serial.isDefined, iso)
      assert(ExcelDates.serialToIso(serial.get, date1904 = false) == iso, iso)
    }
    // non-ISO shapes and the phantom window stay unconverted
    assert(ExcelDates.isoToSerial("not-a-date").isEmpty)
    assert(ExcelDates.isoToSerial("15/01/2025").isEmpty)
    assert(ExcelDates.isoToSerial("2025-13-40").isEmpty)  // invalid date
    assert(ExcelDates.isoToSerial("1900-02-28").isEmpty)  // phantom window
    assert(ExcelDates.isoToSerial("").isEmpty)
  }

  test("elapsed-duration codes ([h]/[mm]/[ss]) fail loud, not guess") {
    val e = intercept[IllegalArgumentException](
      ExcelDates.isDateFormatCode("[h]:mm:ss"))
    assert(e.getMessage.contains("duration"))
    intercept[IllegalArgumentException](
      ExcelDates.isDateFormatCode("[mm]:ss"))
  }

  test("builtin 46 vs custom '[h]:mm:ss': openpyxl parity vs authored " +
       "intent — same glyphs, different provenance, both pinned") {
    // builtin id 46 datetime-converts (openpyxl's BUILTIN_FORMATS path:
    // pandas reads such a cell as a time), so the serial surfaces as
    // the value the pandas path would carry
    assert(ExcelDates.isBuiltinDate(46))
    // the identical format code supplied as a CUSTOM numFmt is authored
    // duration intent and must fail loud, never guess an instant
    intercept[IllegalArgumentException](
      ExcelDates.isDateFormatCode("[h]:mm:ss"))
  }
}
