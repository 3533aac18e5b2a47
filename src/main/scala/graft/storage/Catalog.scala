package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-catalog relation + detection predicates (SURVEY.md S2/S3, F1–F5,
  * F8–F9). The reference builds a DataFrame of Box file metadata and selects
  * inputs by name pattern (/root/reference/etl_payroll_pipeline.py:62-94,
  * 113-173); here the catalog is a small driver-built DataFrame and the
  * selections are pure functions returning the positionally-FIRST match in
  * listing order (F9/H4 — pandas iloc[0]). */
object Catalog {

  /** S2/S3 — catalog DataFrame from a storage listing. */
  def build(spark: SparkSession, storage: StorageClient, root: String): DataFrame = {
    import spark.implicits._
    storage.listRecursive(root).toDF()
  }

  /** F1 — case-insensitive substring containment, null-safe (na=False). */
  def nameContains(sub: String) =
    col("file_name").isNotNull &&
      lower(col("file_name")).contains(sub.toLowerCase)

  /** F2 — case-insensitive boundary-anchored regex containment
    * (ref 72-75: `(^|\s|_)CPA(\s|_|$)`). */
  def nameMatchesBounded(word: String) =
    col("file_name").rlike(s"(?i)(^|[\\s_])${java.util.regex.Pattern.quote(word)}([\\s_]|$$)")

  /** F3 — extension set membership. */
  def hasExtension(exts: String*) = col("extension").isin(exts: _*)

  /** F5 — case-insensitive exact-name equality (ref 124). */
  def nameEquals(name: String) = lower(col("file_name")) === name.toLowerCase

  /** F8/F9 — first match in listing order, or None (ref .empty guards +
    * iloc[0] at 81-94,125-171: warn-and-skip when missing). */
  def firstMatch(catalog: DataFrame, pred: org.apache.spark.sql.Column): Option[FileMeta] = {
    import catalog.sparkSession.implicits._
    catalog.filter(pred).orderBy(col("_ingest_ord")).as[FileMeta]
      .take(1).headOption
  }
}
