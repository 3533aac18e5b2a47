package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** q22/q23 — end-to-end pipeline parity (SURVEY.md §2.2 Q22/Q23).
  *
  * The Spark side runs the real PuaPipeline/CpaPipeline over the embedded
  * fixtures; the oracle is a self-contained DuckDB WITH-query over VALUES
  * CTEs generated from the SAME fixture constants, re-expressing the full
  * reference dataflow in SQL (joins, mode map, keep-first dedup, 'nan'
  * conventions, fiscal-year window under the pinned clock). */
object PayrollQueries {

  import PayrollFixtures._

  private val PuaOrder = Seq("UIN", "Job Number", "Year", "Pay ID", "Pay #", "Seq #")
  private val CpaOrder = Seq("UIN", "Job Number")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_pua_pipeline" -> ((s, _) => {
      val out = PuaPipeline.run(PuaPipeline.Inputs(
        pua = df(s, PuaColumns, PuaRows),
        tsOrg = df(s, TsOrgColumns, TsOrgRows),
        tsDept = df(s, TsDeptColumns, TsDeptRows),
        overtime = df(s, OvertimeColumns, OvertimeRows),
        teM = df(s, TeMColumns, TeMRows)))
      out.drop(DedupOps.OrdinalCol).orderBy(PuaOrder.map(col): _*)
    }),
    // x162 — the q22 dataflow fed through a DATE-CELLED workbook: the
    // fixture is serialized to real XLSX bytes with `Calc Date` written
    // as date-styled NUMERIC cells (1900-system serials, builtin numFmt
    // 22 — what pandas `to_excel` emits for datetime64), read back
    // through the Xlsx codec's styles.xml/numFmt resolution, and run
    // through the same PuaPipeline. The oracle is q22's VERBATIM (string
    // dataflow): green means serial→ISO resolution is value-exact.
    // ("not-a-date" stays a string cell and still coerces to null.)
    "x162_pua_datecell_xlsx" -> ((s, _) => {
      val bytes = graft.io.Xlsx.write(PuaColumns, PuaRows, Set("Calc Date"))
      val (h, rows) = graft.io.Xlsx.readTable(bytes)
      val out = PuaPipeline.run(PuaPipeline.Inputs(
        pua = df(s, h, rows),
        tsOrg = df(s, TsOrgColumns, TsOrgRows),
        tsDept = df(s, TsDeptColumns, TsDeptRows),
        overtime = df(s, OvertimeColumns, OvertimeRows),
        teM = df(s, TeMColumns, TeMRows)))
      out.drop(DedupOps.OrdinalCol).orderBy(PuaOrder.map(col): _*)
    }),
    "q23_cpa_pipeline" -> ((s, _) => {
      val out = CpaPipeline.run(CpaPipeline.Inputs(
        certBw = df(s, CertColumns, CertBwRows),
        certMn = df(s, CertColumns, CertMnRows),
        tsOrg = df(s, TsOrgColumns, TsOrgRows),
        tsDept = df(s, TsDeptColumns, TsDeptRows),
        overtime = df(s, OvertimeColumns, OvertimeRows),
        teM = df(s, TeMColumns, TeMRows)), FixedClock)
      out.drop(DedupOps.OrdinalCol).orderBy(CpaOrder.map(col): _*)
    }))

  // --- oracle SQL ----------------------------------------------------------

  private def q(c: String) = "\"" + c + "\""

  val oracleSql: Map[String, String] = Map(
    "q22_pua_pipeline" -> puaOracle,
    // same oracle as q22: the date-cell roundtrip must be value-invisible
    "x162_pua_datecell_xlsx" -> puaOracle,
    "q23_cpa_pipeline" -> cpaOracle)

  /** nan-coercing strip: pandas astype(str).str.strip() (H2). */
  private def nanStrip(c: String) = s"coalesce(trim(${q(c)}), 'nan')"

  private lazy val puaOracle: String = {
    val ctes = Seq(
      valuesCte("pua", PuaColumns, PuaRows),
      valuesCte("ts_org", TsOrgColumns, TsOrgRows),
      valuesCte("ts_dept", TsDeptColumns, TsDeptRows),
      valuesCte("ot", OvertimeColumns, OvertimeRows),
      valuesCte("te_m", TeMColumns, TeMRows)).mkString(",\n  ")
    s"""WITH
  $ctes,
  d1 AS (
    SELECT ord, "UIN",
      trim("TS COA") AS "TS COA", trim("TS ORG") AS "TS ORG",
      trim("TS COA") || '-' || trim("TS ORG") AS "TS-Org Code",
      regexp_replace(${nanStrip("DEPT Code")}, '\\.0$$', '') AS "DEPT Code",
      trim("Department Name") AS "Department Name",
      trim("Year") AS "Year", trim("Pay ID") AS "Pay ID",
      trim("Pay #") AS "Pay #", trim("Seq #") AS "Seq #",
      regexp_replace(${nanStrip("POSN")}, '\\.0$$', '') AS "POSN",
      regexp_replace(${nanStrip("SUFF")}, '\\.0$$', '') AS "SUFF",
      trim("College Code") AS "College Code",
      trim("College Name") AS "College Name",
      "ECLS", "ECLS DESC", "TE M", "Earn Code", "DESCRIPTION",
      "ADJ Reason Code", "ADJ Reason DESC", "Calc Date"
    FROM pua),
  d2 AS (
    SELECT *,
      "TS COA" || '-' || "DEPT Code" AS "TS-Org Department Code",
      "Year" || "Pay ID" || "Pay #" || "Seq #" AS "Pay Event",
      "POSN" || '-' || "SUFF" AS "Job Number",
      "College Code" || '-' || "College Name" AS "College"
    FROM d1),
  j1 AS (
    SELECT d2.*, o."TS-Org Title"
    FROM d2 LEFT JOIN
      (SELECT DISTINCT "TS-Org Code" AS k, "TS-Org Title" FROM ts_org) o
      ON d2."TS-Org Code" = o.k),
  j2 AS (
    SELECT j1.*, p."TS-Org Dept Code",
      coalesce(p."TS-Org Dept Title", j1."Department Name") AS "TS-Org Dept Title"
    FROM j1 LEFT JOIN
      (SELECT DISTINCT "TS-Org Dept Code", "TS-Org Dept Title" FROM ts_dept) p
      ON j1."TS-Org Department Code" = p."TS-Org Dept Code"),
  j3 AS (
    SELECT j2.*, o2."Overtime FLSA" AS "Overtime"
    FROM j2 LEFT JOIN
      (SELECT DISTINCT "Job Eclass" AS k, "Overtime FLSA" FROM ot) o2
      ON j2."ECLS" = o2.k),
  tmode AS (
    SELECT k, v FROM (
      SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY cnt DESC, v ASC) AS rn
      FROM (SELECT trim("TE M") AS k, trim("Time Entry Method") AS v,
                   count(*) AS cnt
            FROM te_m
            WHERE "TE M" IS NOT NULL AND "Time Entry Method" IS NOT NULL
            GROUP BY 1, 2) c) r
    WHERE rn = 1),
  j4 AS (
    SELECT j3.*, ${nanStrip("TE M")} AS te_m2, tmode.v AS "Time Entry"
    FROM j3 LEFT JOIN tmode ON ${nanStrip("TE M")} = tmode.k),
  dd AS (
    SELECT * FROM (
      SELECT j4.*, row_number() OVER (
        PARTITION BY "UIN", "Pay Event", "Job Number" ORDER BY ord) AS rn
      FROM j4) t
    WHERE rn = 1)
  SELECT
    trim("UIN") AS "UIN", "Pay ID", "Year", "Pay #", "Seq #", "Job Number",
    "College Code", "College Name", "College", "TS COA", "TS ORG",
    "TS-Org Code", trim("TS-Org Title") AS "TS-Org Title",
    "DEPT Code" AS "Dept Code",
    trim("TS-Org Dept Code") AS "TS-Org Dept Code",
    trim("TS-Org Dept Title") AS "TS-Org Dept Title",
    trim("ECLS") AS "E-Class Code", trim("ECLS DESC") AS "E-Class",
    te_m2 AS "TE M", trim("Time Entry") AS "Time Entry",
    trim("Overtime") AS "Overtime", trim("Earn Code") AS "Earn Code",
    trim("DESCRIPTION") AS "Earn Code Description",
    CASE WHEN trim("ADJ Reason Code") IS NULL
              OR trim("ADJ Reason Code") IN ('', 'nan', 'NaN')
         THEN 'INT' ELSE trim("ADJ Reason Code") END AS "Adjustment Reason Code",
    CASE WHEN trim("ADJ Reason Code") IS NULL
              OR trim("ADJ Reason Code") IN ('', 'nan', 'NaN')
         THEN 'Internal' ELSE trim("ADJ Reason DESC") END
      AS "Adjustment Reason Description",
    TRY_CAST("Calc Date" AS TIMESTAMP) AS "Calc Date"
  FROM dd
  ORDER BY ${PuaOrder.map(q).mkString(", ")}"""
  }

  private lazy val cpaOracle: String = {
    val stripCols = CpaPipeline.ExpectedColumns
      .filterNot(_ == "TRAN_CREATE_DT")
      .map(c => s"${nanStrip(c)} AS ${q(c)}").mkString(",\n      ")
    val certColsQ = (Seq("ord") ++ CertColumns).map(q).mkString(", ")
    val ctes = Seq(
      valuesCte("bw", CertColumns, CertBwRows),
      valuesCte("mn", CertColumns, CertMnRows),
      valuesCte("ts_org", TsOrgColumns, TsOrgRows),
      valuesCte("ts_dept", TsDeptColumns, TsDeptRows),
      valuesCte("ot", OvertimeColumns, OvertimeRows),
      valuesCte("te_m", TeMColumns, TeMRows)).mkString(",\n  ")
    s"""WITH
  $ctes,
  u AS (
    SELECT $certColsQ FROM bw
    UNION ALL
    SELECT "ord" + 1000000 AS "ord", ${CertColumns.map(q).mkString(", ")} FROM mn),
  f AS (
    SELECT * FROM (
      SELECT * EXCLUDE ("TRAN_CREATE_DT"),
             TRY_CAST("TRAN_CREATE_DT" AS TIMESTAMP) AS "TRAN_CREATE_DT"
      FROM u) t
    WHERE "TRAN_CREATE_DT" >= TIMESTAMP '2024-07-01 00:00:00'
      AND "TRAN_CREATE_DT" <= TIMESTAMP '2025-06-30 00:00:00'),
  strip AS (
    SELECT ord, "TRAN_CREATE_DT",
      $stripCols,
      ${nanStrip("JOB_TS_COAS")} || '-' || ${nanStrip("JOB_TS_ORGN")} AS "TS-Org Code",
      substr(${nanStrip("JOB_TS_COAS")} || '-' || ${nanStrip("JOB_TS_ORGN")}, 1, 5)
        AS "Dept TS-Org",
      ${nanStrip("UIN")} || '-' || ${nanStrip("JOB")} AS "UIN Job"
    FROM f),
  j1 AS (
    SELECT strip.*, o."TS-Org Title" AS "TS-Org Name"
    FROM strip LEFT JOIN
      (SELECT DISTINCT "TS-Org Code" AS k, "TS-Org Title" FROM ts_org) o
      ON strip."TS-Org Code" = o.k),
  j2 AS (
    SELECT j1.*, p."TS-Org Dept Code",
           p."TS-Org Dept Title" AS "TS-Org Department Name"
    FROM j1 LEFT JOIN
      (SELECT DISTINCT "TS-Org Dept Code", "TS-Org Dept Title" FROM ts_dept) p
      ON j1."Dept TS-Org" = p."TS-Org Dept Code"),
  j5 AS (
    SELECT j2.*, t."TE M", t."Time Entry Method", t."Time Entry Type"
    FROM j2 LEFT JOIN
      (SELECT DISTINCT "UIN Job" AS k, "TE M", "Time Entry Method",
                       "Time Entry Type" FROM te_m) t
      ON j2."UIN Job" = t.k),
  tmode AS (
    SELECT k, v FROM (
      SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY cnt DESC, v ASC) AS rn
      FROM (SELECT trim("TE M") AS k, trim("Time Entry Method") AS v,
                   count(*) AS cnt
            FROM te_m
            WHERE "TE M" IS NOT NULL AND "Time Entry Method" IS NOT NULL
            GROUP BY 1, 2) c) r
    WHERE rn = 1),
  jt AS (
    SELECT j5.*, ${nanStrip("TE M")} AS te_m2, tmode.v AS "Time Entry"
    FROM j5 LEFT JOIN tmode ON ${nanStrip("TE M")} = tmode.k),
  j4 AS (
    SELECT jt.*, o2."Overtime FLSA", o2."Job Detail E-Class Long Desc"
    FROM jt LEFT JOIN
      (SELECT DISTINCT ${nanStrip("Job Eclass")} AS k1, ${nanStrip("Pay ID")} AS k2,
              "Overtime FLSA", "Job Detail E-Class Long Desc" FROM ot) o2
      ON jt."JOB_ECLS" = o2.k1 AND jt."PAY_ID" = o2.k2),
  applied AS (SELECT * FROM j4 WHERE "ACTION" = '3 - Apply'),
  u3 AS (
    SELECT * EXCLUDE (ord), min(ord) AS ord FROM applied GROUP BY ALL),
  u4 AS (
    SELECT * FROM (
      SELECT u3.*, row_number() OVER (PARTITION BY "UIN Job" ORDER BY ord) AS rn
      FROM u3) t
    WHERE rn = 1)
  SELECT
    "UIN", "PAY_ID" AS "Pay ID", "PAY_YEAR" AS "Year", "PAY_NBR" AS "Pay #",
    "PAY_SEQ" AS "Seq #", "JOB" AS "Job Number",
    trim(split_part("COLLEGE", '-', 1)) AS "College Code",
    CASE WHEN strpos("COLLEGE", '-') = 0 THEN NULL
         ELSE trim(split_part("COLLEGE", '-', 2)) END AS "College Name",
    "COLLEGE" AS "College", "JOB_TS_COAS" AS "TS COA",
    "JOB_TS_ORGN" AS "TS Org", "TS-Org Code",
    "TS-Org Name" AS "TS-Org Title", "TS-Org Dept Code",
    "TS-Org Department Name" AS "TS-Org Dept Title",
    "JOB_ECLS" AS "E-Class Code",
    "Job Detail E-Class Long Desc" AS "E-Class",
    te_m2 AS "TE M", "Time Entry", "Overtime FLSA" AS "Overtime"
  FROM u4
  ORDER BY ${CpaOrder.map(q).mkString(", ")}"""
  }
}
