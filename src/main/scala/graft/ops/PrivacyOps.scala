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

  /** Distinct l-diversity on top of the k-anonymity ladder (Machanavajjhala
    * et al. 2007): a k-sized group whose members all share one sensitive
    * value still discloses that value to anyone who can place a person in
    * the group (the homogeneity attack k-anonymity alone permits). A record
    * publishes at the first ladder level where its RESIDUAL group has both
    * >= k released members and >= l distinct sensitive values; groups
    * failing either test cascade down. Same residual-counting discipline as
    * [[kAnonymize]] — both guarantees hold over what is actually released,
    * and both group size and diversity are in the output (audited, never
    * silent). The fully-suppressed residual carries no quasi-identifier
    * information (nothing to link the sensitive value to), so it is exempt
    * from both thresholds, like kAnonymize's last level.
    *
    * Scale shape: identical to [[kAnonymize]] — h dimension-sized
    * count+distinct aggregates broadcast over one cached scan. The distinct
    * count is two-phase (partial by (group, sensitive), then by group), so
    * it stays map-side combinable. */
  def lDiversify(df: DataFrame, idCol: String, qis: Seq[String],
                 sensitive: String, k: Long, l: Long)
                (implicit scope: CacheScope): DataFrame = {
    require(qis.nonEmpty, "need at least one quasi-identifier column")
    require(k > 0 && l > 0, s"k and l must be positive, got k=$k l=$l")
    val base = scope.persist(
      df.select((idCol +: qis :+ sensitive).map(col).toIndexedSeq: _*))
    base.count() // eager: read by every ladder level (the x114 lesson)

    def genCol(kept: Seq[String]): Column =
      concat_ws("|",
        (kept.map(c => col(c).cast("string")) ++
         Seq.fill(qis.size - kept.size)(lit("*"))).toIndexedSeq: _*)

    var residual = base
    val published = (0 to qis.size).map { lev =>
      val kept = qis.take(qis.size - lev)
      if (kept.isEmpty) {
        val total = residual.select(
          count(lit(1)).as("_cnt"), countDistinct(col(sensitive)).as("_ndv"))
        residual.crossJoin(broadcast(total))
          .select(col(idCol), lit(lev).as("level"), genCol(kept).as("gen"),
                  col("_cnt").as("grp_n"), col("_ndv").as("div_n"))
      } else {
        val stats = residual.groupBy(kept.map(col).toIndexedSeq: _*)
          .agg(count(lit(1)).as("_cnt"),
               countDistinct(col(sensitive)).as("_ndv"))
        val joined = residual.join(broadcast(stats), kept)
        val ok = col("_cnt") >= k && col("_ndv") >= l
        val out = joined.filter(ok)
          .select(col(idCol), lit(lev).as("level"), genCol(kept).as("gen"),
                  col("_cnt").as("grp_n"), col("_ndv").as("div_n"))
        residual = joined.filter(!ok)
          .select((idCol +: qis :+ sensitive).map(col).toIndexedSeq: _*)
        out
      }
    }
    published.reduce(_.union(_))
  }

  /** Deterministic two-sided-geometric noise — the geometric mechanism of
    * Ghosh/Roughgarden/Sundararajan 2009, the discrete analogue of Laplace
    * noise. noise = G1 − G2 with G ~ Geometric(1/2), i.e. the discrete
    * Laplace with α = 1/2, giving ε = ln 2-DP for count queries
    * (sensitivity 1). Each geometric draw is the TRAILING-ZERO count of a
    * 48-bit md5 integer — P(tz = j) = 2^−(j+1) exactly, pure integer
    * algebra (`bit_count((h & −h) − 1)`), no FP and no library RNG, so
    * both engines derive the identical draw from the identical key. The
    * determinism (noise is a function of the group key + salts) is what
    * makes the mechanism oracle-checkable; a production release would fold
    * a per-release secret into the salts — the algebra is unchanged.
    * h = 0 (probability 2^−48) is pinned to tz = 48. */
  def geometricNoise(key: Column, salt1: String, salt2: String): Column = {
    // equal salts would make the two draws identical and the noise
    // IDENTICALLY ZERO — a silent, total failure of the mechanism
    require(salt1 != salt2,
      s"geometric draws need distinct salts, got '$salt1' twice")
    // composition note: each RELEASE must use a fresh salt pair — reusing
    // a pair across two releases of overlapping groups correlates their
    // noise, and the ε's of correlated releases do not compose additively
    def tz(salt: String): Column = {
      val h = conv(substring(md5(concat(lit(salt), key.cast("string"))),
                             1, 12), 16, 10).cast("long")
      when(h === 0L, lit(48))
        .otherwise(bit_count(h.bitwiseAND(-h) - 1)).cast("long")
    }
    tz(salt1) - tz(salt2)
  }

  /** The DuckDB spelling of [[geometricNoise]]'s single draw, kept beside
    * the Spark formula so the two can only drift loudly. `key` must be a
    * VARCHAR-valued SQL expression. */
  def tzSql(key: String, salt: String): String = {
    val h = s"(('0x' || substr(md5('$salt' || $key), 1, 12))::BIGINT)"
    s"(CASE WHEN $h = 0 THEN 48 ELSE bit_count(($h & (-$h)) - 1) END)::BIGINT"
  }
}
