package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity by generalization-ladder suppression — the privacy
  * governance step a curation pipeline runs before releasing records
  * keyed by quasi-identifiers (the x30 PII detector finds direct
  * identifiers; THIS bounds re-identification through indirect ones).
  *
  * Semantics (global recoding over residuals — a REAL guarantee, not the
  * local-recoding shortcut): level 0 keeps all quasi-identifier columns;
  * each subsequent level drops the last remaining one ('*'); the final
  * level is full suppression. A record publishes at the FIRST level where
  * the group it would join — counted over records still unpublished at
  * that level — reaches size >= k. Counting over residuals matters: the
  * popular local-recoding shortcut (test each record against
  * full-population counts per level) publishes L1 groups whose actual
  * released population is < k once their L0-satisfied members are
  * removed, silently voiding the guarantee. Here every published group
  * except the fully-suppressed residual has >= k released members, and
  * the group size is part of the output (audited, never silent — the
  * x123 discipline). The fully-suppressed level carries no
  * quasi-identifier information, so its size may be < k.
  *
  * Scale shape (100 TB): the base projection is persisted once; each
  * ladder level is one keyed COUNT aggregate (map-side combinable,
  * result bounded by the level's group cardinality — dimension-sized,
  * not data-sized) broadcast back onto the residual. Levels = ladder
  * height (a constant), so the whole cascade is h tiny shuffles over
  * one cached scan. No window over the full table, no driver-side data.
  *
  * Quasi-identifier columns must be non-null (null keys would fall out
  * of the equi-joins); pre-fill sentinel values if needed. */
object PrivacyOps {

  /** Anonymize `df` over the quasi-identifiers `qis` (most- to
    * least-specific; level l drops the last l of them). Returns
    * (idCol, level: int, gen: string, grp_n: long) — `gen` is the
    * published generalized value, kept values joined by '|' with '*'
    * per dropped column. */
  def kAnonymize(df: DataFrame, idCol: String, qis: Seq[String], k: Long)
                (implicit scope: CacheScope): DataFrame = {
    require(qis.nonEmpty, "need at least one quasi-identifier column")
    require(k > 0, s"k must be positive, got $k")
    val base = scope.persist(
      df.select((idCol +: qis).map(col).toIndexedSeq: _*))
    base.count() // eager: read by every ladder level (the x114 lesson)

    def genCol(kept: Seq[String]): Column =
      concat_ws("|",
        (kept.map(c => col(c).cast("string")) ++
         Seq.fill(qis.size - kept.size)(lit("*"))).toIndexedSeq: _*)

    var residual = base
    val published = (0 to qis.size).map { l =>
      val kept = qis.take(qis.size - l)
      if (kept.isEmpty) {
        // full suppression: one residual group, size = its own count
        val total = residual.select(count(lit(1)).as("_cnt"))
        residual.crossJoin(broadcast(total))
          .select(col(idCol), lit(l).as("level"),
                  genCol(kept).as("gen"), col("_cnt").as("grp_n"))
      } else {
        val cnts = residual.groupBy(kept.map(col).toIndexedSeq: _*)
          .agg(count(lit(1)).as("_cnt"))
        val joined = residual.join(broadcast(cnts), kept)
        val out = joined.filter(col("_cnt") >= k)
          .select(col(idCol), lit(l).as("level"),
                  genCol(kept).as("gen"), col("_cnt").as("grp_n"))
        residual = joined.filter(col("_cnt") < k)
          .select((idCol +: qis).map(col).toIndexedSeq: _*)
        out
      }
    }
    published.reduce(_.union(_))
  }
}
