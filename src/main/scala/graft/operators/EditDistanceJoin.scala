package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact threshold edit-distance join (ed ≤ k) via Ed-Join q-gram prefix
  * filtering — the string member of the exact-join family (Jaccard and
  * cosine in [[SetSimJoin]], subsumption in [[ContainmentJoin]]).
  *
  * Candidates: each string's positional q-grams are ranked by GLOBAL
  * document frequency (computed over probes ∪ corpus — one keyed agg),
  * and only the q·k+1 rarest distinct grams of each string enter the
  * candidate equi-join (Xiao et al., Ed-Join): a pair within distance k
  * shares at least one gram in both prefixes, so constant stopgrams
  * shared by every row never pair anything. The length filter
  * (||a|−|b|| ≤ k) prunes inside the join; survivors are verified with
  * the bounded `levenshtein(·,·,k)`, which early-exits the DP for far
  * pairs (O(len·k) per candidate, not O(len²)).
  *
  * Shape note (x99): on a DENSE key space the symmetric all-pairs form
  * has quadratic OUTPUT; run probe-batch-vs-corpus (the daily-ingest
  * shape), which is linear in the batch. Strings shorter than q·k+q−1
  * can qualify while sharing zero grams — callers on such data must
  * pre-split short strings into a brute-force arm; the per-name prefix
  * rank is a bounded window (≤ |string| grams per partition,
  * WindowGroupLimit-pushed).
  */
object EditDistanceJoin {

  /** @param probes (`idA`, `strA`) batch side
    * @param corpus (`idB`, `strB`) master side
    * @return (idA, idB, lev) for every pair with lev ≤ k. */
  def join(probes: DataFrame, corpus: DataFrame,
           idA: String, strA: String, idB: String, strB: String,
           k: Int = 2, q: Int = 2): DataFrame = {
    require(k >= 1 && q >= 1, s"editDistanceJoin: k=$k q=$q must be >= 1")
    val pref = q * k + 1
    def grams(df: DataFrame, id: String, nm: String): DataFrame = df
      .select(col(id), explode(array_distinct(expr(
        s"transform(sequence(1, greatest(1, length($nm) - ${q - 1}))," +
        s" i -> substring($nm, i, $q))"))).as("g"))
    val gd = grams(probes, idA, strA)
    val gc = grams(corpus, idB, strB)
    val dfreq = gd.select(col("g")).unionAll(gc.select(col("g")))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
    def prefix(g: DataFrame, id: String): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(col("df"), col("g"))
      g.join(dfreq, Seq("g"))
        .withColumn("_rk", row_number().over(w))
        .filter(col("_rk") <= pref).select(col(id), col("g"))
    }
    prefix(gd, idA).join(prefix(gc, idB), Seq("g"))
      .select(col(idA), col(idB)).distinct()
      .join(probes, Seq(idA)).join(corpus, Seq(idB))
      .filter(abs(length(col(strA)) - length(col(strB))) <= k)
      .withColumn("lev", levenshtein(col(strA), col(strB), k))
      .filter(col("lev") >= 0 && col("lev") <= k)
      .select(col(idA), col(idB), col("lev"))
  }
}
