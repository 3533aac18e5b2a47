package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.ops.DedupOps

/** Deterministic payroll fixture data (FIXTURES.md), embedded once and used
  * by BOTH sides of the q22/q23 end-to-end parity checks: the Spark
  * pipelines consume DataFrames built from these rows, and the DuckDB
  * oracle consumes a generated VALUES CTE of the same rows — so the full
  * dataflow (not the data) is what's under test.
  *
  * Rows exercise every cited hazard: trailing `.0` float artifacts (D3),
  * nulls that concat-propagate (H3), nulls that become literal "nan" (H2),
  * duplicate dedup keys (U2/U3/U4), mode ties (G1), missing '-' delimiters
  * (D7), unparseable dates (D8), fiscal-year boundary timestamps (F6/D13).
  */
object PayrollFixtures {

  private val N = None: Option[String]
  private def s(v: String): Option[String] = Some(v)

  // --- PUA primary extract -------------------------------------------------
  val PuaColumns: Seq[String] = Seq(
    "UIN", "Year", "Pay ID", "Pay #", "Seq #", "POSN", "SUFF", "TS COA",
    "TS ORG", "DEPT Code", "Department Name", "College Code", "College Name",
    "ECLS", "ECLS DESC", "TE M", "Earn Code", "DESCRIPTION",
    "ADJ Reason Code", "ADJ Reason DESC", "Calc Date")

  val PuaRows: Seq[Seq[Option[String]]] = Seq(
    // 0: normal; .0 artifacts; blank ADJ → INT/Internal; TE M "W"
    Seq(s("u1"), s("2025"), s("MN"), s("5"), s("0"), s("12345.0"), s("0"),
        s("1"), s("123"), s("61000.0"), s("Medicine"), s("KV"), s("Vet Med"),
        s("AA"), s("Academic"), s("W"), s("RGS"), s("Regular Salary"),
        s(""), s(""), s("2025-01-15")),
    // 1: duplicate dedup key of row 0 (same UIN/Pay Event/Job Number) → dropped
    Seq(s("u1"), s("2025"), s("MN"), s("5"), s("0"), s("12345"), s("0"),
        s("1"), s("123"), s("61000"), s("Medicine"), s("KV"), s("Vet Med"),
        s("AA"), s("Academic"), s("W"), s("OVT"), s("Overtime Pay"),
        s("EXT"), s("External"), s("2025-01-20")),
    // 2: null TS ORG → null TS-Org Code (H3); null College Name → null College;
    //    'nan' ADJ → INT; unparseable Calc Date → null; TE M "P"
    Seq(s("u2"), s("2025"), s("BW"), s("3"), s("1"), s("200.0"), s("1"),
        s("1"), N, s("61001.0"), s("History"), s("LA"), N,
        s("BB"), s("Grad"), s("P"), s("RGS"), s("Regular Salary"),
        s("nan"), s("nan"), s("not-a-date")),
    // 3: no dept match → Department Name fallback (D9); ADJ kept; TE M "X"
    //    (absent from lookup → Time Entry null)
    Seq(s("u3"), s("2024"), s("MN"), s("12"), s("0"), s("300"), s("2"),
        s("1"), s("456"), s("99999"), s("Physics Dept"), s("EN"), s("Engineering"),
        s("AA"), s("Academic"), s("X"), s("ADJ"), s("Adjustment"),
        s("EXT"), s("External"), s("2024-12-01")),
    // 4: null POSN → "nan" in Job Number (H2); ECLS GA → no overtime match
    Seq(s("u4"), s("2025"), s("MN"), s("1"), s("0"), N, s("00"),
        s("2"), s("777"), s("61000"), s("Chemistry"), s("LAS"), s("Sciences"),
        s("GA"), s("Grad Assist"), s("W"), s("RGS"), s("Regular Salary"),
        N, N, s("2025-02-28")),
    // 5: TE M "T" has a mode TIE in the lookup → smallest value wins (G1)
    Seq(s("u5"), s("2025"), s("BW"), s("7"), s("0"), s("500"), s("0"),
        s("1"), s("123"), s("61000"), s("Medicine"), s("KV"), s("Vet Med"),
        s("BB"), s("Grad"), s("T"), s("RGS"), s("Regular Salary"),
        s("INT"), s("Internal"), s("2025-03-15")),
    // 6: same UIN+Job Number as row 0 but different Seq # → different
    //    Pay Event → NOT a duplicate
    Seq(s("u1"), s("2025"), s("MN"), s("5"), s("1"), s("12345"), s("0"),
        s("1"), s("123"), s("61000"), s("Medicine"), s("KV"), s("Vet Med"),
        s("AA"), s("Academic"), s("W"), s("RGS"), s("Regular Salary"),
        s("EXT"), s("External"), s("2025-01-31")),
    // 7: third copy of row 0's dedup key → dropped
    Seq(s("u1"), s("2025"), s("MN"), s("5"), s("0"), s("12345"), s("0.0"),
        s("1"), s("123"), s("61000"), s("Medicine"), s("KV"), s("Vet Med"),
        s("AA"), s("Academic"), s("W"), s("BON"), s("Bonus"),
        s("EXT"), s("External"), s("2025-01-25")))

  // --- lookups -------------------------------------------------------------
  val TsOrgColumns = Seq("TS-Org Code", "TS-Org Title")
  val TsOrgRows: Seq[Seq[Option[String]]] = Seq(
    Seq(s("1-123"), s("Org Medicine")),
    Seq(s("1-123"), s("Org Medicine")), // duplicate row — J6 dedup
    Seq(s("1-456"), s("Org Engineering")),
    Seq(s("2-777"), s("Org Chemistry")))

  val TsDeptColumns = Seq("TS-Org Dept Code", "TS-Org Dept Title")
  val TsDeptRows: Seq[Seq[Option[String]]] = Seq(
    Seq(s("1-61000"), s("Dept of Medicine")),
    Seq(s("1-61001"), s("Dept of History")),
    Seq(s("2-610"), s("Dept Prefix Chem"))) // matches CPA Dept TS-Org "2-610"

  val OvertimeColumns = Seq("Job Eclass", "Pay ID", "Overtime FLSA",
                            "Job Detail E-Class Long Desc")
  val OvertimeRows: Seq[Seq[Option[String]]] = Seq(
    Seq(s("AA"), s("MN"), s("Exempt"), s("Academic Monthly Long")),
    Seq(s("AA"), s("BW"), s("Exempt"), s("Academic Biweekly Long")),
    Seq(s("BB"), s("MN"), s("NonExempt"), s("Grad Monthly Long")),
    Seq(s("BB"), s("BW"), s("NonExempt"), s("Grad Biweekly Long")))

  val TeMColumns = Seq("UIN Job", "TE M", "Time Entry Method", "Time Entry Type")
  val TeMRows: Seq[Seq[Option[String]]] = Seq(
    Seq(s("u1-12345-0"), s("W"), s("Web Time"), s("Type A")),
    Seq(s("u9-1-1"), s("W"), s("Web Time"), s("Type B")),
    Seq(s("u8-2-0"), s("P"), s("Paper"), s("Type A")),
    // TE M "T": Banner x1, Adams x1 → tie → "Adams" (smallest) wins
    Seq(s("u7-3-0"), s("T"), s("Banner"), s("Type A")),
    Seq(s("u6-4-0"), s("T"), s("Adams"), s("Type A")),
    Seq(N, s("Z"), s("Zulu"), s("Type C")),       // null key → dropped from map
    Seq(s("u0-0-0"), N, s("Nope"), s("Type C")))  // null TE M → dropped

  // --- CPA certifications (34 expected columns) ----------------------------
  val CertColumns: Seq[String] = CpaPipeline.ExpectedColumns

  private def cert(overrides: (String, Option[String])*): Seq[Option[String]] = {
    val base: Map[String, Option[String]] = Map(
      "UIN" -> s("u1"), "PAY_YEAR" -> s("2025"), "PAY_ID" -> s("MN"),
      "PAY_NBR" -> s("5"), "PAY_SEQ" -> s("0"), "TRAN_ID" -> s("T1"),
      "TRAN_COMPNT" -> s("C1"), "ADJ_REASON" -> s("LATE"),
      "TRAN_CREATE_DT" -> s("2025-01-10"), "TRAN_CLOSED_DT" -> s("2025-01-12"),
      "JOB" -> s("12345-0"), "JOB_TITLE" -> s("Professor"),
      "JOB_TS_COAS" -> s("1"), "JOB_TS_ORGN" -> s("123"),
      "JOB_ECLS" -> s("AA"), "COLLEGE" -> s("KV - Vet Med"),
      "OWNING_UIN" -> s("o1"), "LAST_NAME" -> s("Smith"),
      "FIRST_NAME" -> s("Ann"), "UI_ENTERPRISE_ID" -> s("asmith"),
      "EMAIL_ADDR" -> s("a@x.edu"), "HRLY_RATE" -> s("50.0"),
      "RT_LEAVE_DT" -> N, "RT_ENTER_DT" -> N, "RT_CREATE_DT" -> s("2025-01-09"),
      "LVL" -> s("1"), "ROLE" -> s("R1"), "ACTION" -> s("3 - Apply"),
      "ROUTED_BY_UIN" -> s("r1"), "RETURNED_FLAG" -> s("N"),
      "TRAN_ROUTE_DT" -> s("2025-01-11"), "ELAPSED_WORK_TIME" -> s("5"),
      "ROUTE_STOP_TIME" -> s("2"), "ELAPSED_TRAN_TIME" -> s("7"))
    val m = base ++ overrides.toMap
    CertColumns.map(m)
  }

  /** BW rows (union block 1). */
  val CertBwRows: Seq[Seq[Option[String]]] = Seq(
    cert(), // 0: the canonical apply row, in FY
    cert("UIN" -> s("uX"), "TRAN_CREATE_DT" -> s("2023-01-01"),
         "TRAN_ID" -> s("T2")), // 1: out of fiscal year → filtered
    cert("UIN" -> s("u9"), "ACTION" -> s("1 - Route"),
         "TRAN_ID" -> s("T3")), // 2: not "3 - Apply" → filtered
    cert("UIN" -> s("u2"), "JOB" -> N, "JOB_ECLS" -> s("ZZ"),
         "COLLEGE" -> s("NOHYPHEN"), "TRAN_ID" -> s("T4"),
         "JOB_TS_COAS" -> s("1"), "JOB_TS_ORGN" -> N,
         "PAY_ID" -> s("BW")))   // 3: null JOB → "u2-nan"; no '-' in COLLEGE

  /** MN rows (union block 2 — ordered after BW). */
  val CertMnRows: Seq[Seq[Option[String]]] = Seq(
    cert(), // 0: full-row duplicate of BW row 0 → U3 distinct drops it
    cert("TRAN_ID" -> s("T9")), // 1: same UIN Job, different TRAN_ID → U4 drops (BW first)
    cert("UIN" -> s("u3"), "JOB" -> s("777-1"), "JOB_TS_COAS" -> s("2"),
         "JOB_TS_ORGN" -> s("777"), "PAY_ID" -> s("BW"), "JOB_ECLS" -> s("BB"),
         "COLLEGE" -> s("LP-Liberal Arts"), "TRAN_ID" -> s("T5"),
         "TRAN_CREATE_DT" -> s("2025-06-30")), // 2: ON fy_end midnight → kept
    cert("UIN" -> s("u4"), "JOB" -> s("888-1"), "TRAN_ID" -> s("T6"),
         "TRAN_CREATE_DT" -> s("2025-06-30 08:00:00"))) // 3: after midnight → filtered

  /** Fixed clock for CPA fiscal-year semantics: 2025-03-15 ⇒ FY
    * Jul 1 2024 – Jun 30 2025 (midnight). */
  val FixedClock: java.time.Clock = java.time.Clock.fixed(
    java.time.Instant.parse("2025-03-15T12:00:00Z"), java.time.ZoneOffset.UTC)

  // --- builders ------------------------------------------------------------

  /** Fixture table → all-string DataFrame with `_ingest_ord` = row index. */
  def df(spark: SparkSession, columns: Seq[String],
         rows: Seq[Seq[Option[String]]]): DataFrame = {
    val schema = StructType(
      columns.map(c => StructField(c, StringType, nullable = true)) :+
        StructField(DedupOps.OrdinalCol, LongType, nullable = false))
    val data = rows.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.map(_.orNull) :+ i.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  /** Fixture table → DuckDB VALUES CTE body: `(ord, 'v', NULL, ...), ...`.
    * All values are SQL string literals (or NULL); ord is an integer. */
  def valuesCte(name: String, columns: Seq[String],
                rows: Seq[Seq[Option[String]]]): String = {
    def lit(v: Option[String]): String =
      v.map(x => "'" + x.replace("'", "''") + "'").getOrElse("NULL")
    val cols = (Seq("ord") ++ columns).map(c => "\"" + c + "\"").mkString(", ")
    val body = rows.zipWithIndex
      .map { case (r, i) => s"($i, ${r.map(lit).mkString(", ")})" }
      .mkString(",\n    ")
    s"""$name($cols) AS (VALUES\n    $body)"""
  }
}
