package graft.ops

import java.time.{Clock, LocalDate, LocalDateTime}

/** Clock-dependent semantics (SURVEY.md D13/S8). The reference computes
  * fiscal-year bounds from the wall clock at run time
  * (/root/reference/etl_payroll_pipeline.py:443-447): FY runs Jul 1 of
  * (year-1) through Jun 30 of (year) where `year` is the current calendar
  * year. The clock is injectable so tests and oracles can pin it.
  */
object DateOps {

  final case class FiscalYear(start: LocalDateTime, end: LocalDateTime)

  /** D13 — fiscal-year bounds from an injected clock (ref 443-447).
    * A run in Aug 2026 selects FY Jul 2025 – Jun 2026, and fy_end is
    * MIDNIGHT of Jun 30 (`datetime(year, 6, 30)`) so Jun 30 intraday
    * timestamps fall OUTSIDE the window — the reference's exact (arguably
    * surprising) behavior is preserved. */
  def fiscalYearBounds(clock: Clock): FiscalYear = {
    val today = LocalDate.now(clock)
    val y = today.getYear
    FiscalYear(
      LocalDateTime.of(y - 1, 7, 1, 0, 0, 0),
      LocalDateTime.of(y, 6, 30, 0, 0, 0))
  }

  /** S8 — date-stamped output naming `PREFIX_Data_Transformed_MMddyyyy_HHmm`
    * (ref 388,392-393,598,602-603). */
  def stampedName(prefix: String, ext: String, clock: Clock): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("MMddyyyy_HHmm")
    s"${prefix}_Data_Transformed_${LocalDateTime.now(clock).format(fmt)}$ext"
  }
}
