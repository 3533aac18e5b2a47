package graft

import graft.ops.PrivacyOps
import org.apache.spark.sql.functions._

/** The k-anonymity cascade's guarantee, on a fixture built to expose the
  * local-recoding trap: an L1 group whose FULL population passes k but
  * whose residual (after its L0-published members leave) does not. */
class PrivacyOpsSpec extends SparkSpec {
  import spark.implicits._

  // (id, a, b) with k = 3:
  //  X: (1,1) x3 -> published at level 0
  //  Y: (1,2) x2 -> L0 under-k; L1 group a=1 has FULL population 5 >= 3
  //     but residual population 2 < 3 -> must fall through to level 2
  //  Z: (2,*) x3 distinct b -> L0 all singletons; residual L1 a=2 count 3
  //     -> published at level 1 with grp_n = 3
  private val rows = Seq(
    (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L),
    (4L, 1L, 2L), (5L, 1L, 2L),
    (6L, 2L, 1L), (7L, 2L, 2L), (8L, 2L, 3L))

  private lazy val out =
    PrivacyOps.kAnonymize(rows.toDF("id", "a", "b"), "id",
                          Seq("a", "b"), k = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2), r.getLong(3)))).toMap

  test("residual counting: a full-population-satisfied L1 group still suppresses when its released members are < k") {
    Seq(1L, 2L, 3L).foreach(id => assert(out(id) == ((0, "1|1", 3L))))
    // the trap: local recoding would publish ids 4,5 as '1|*' (full
    // population 5 >= 3) with only 2 released members
    Seq(4L, 5L).foreach(id => assert(out(id) == ((2, "*|*", 2L))))
    Seq(6L, 7L, 8L).foreach(id => assert(out(id) == ((1, "2|*", 3L))))
  }

  test("every published non-suppressed group has >= k released members and an honest grp_n") {
    val df = PrivacyOps.kAnonymize(rows.toDF("id", "a", "b"), "id",
                                   Seq("a", "b"), k = 3L)
    val sizes = df.groupBy(col("level"), col("gen"))
      .agg(count(lit(1)).as("released"), min(col("grp_n")).as("lo"),
           max(col("grp_n")).as("hi"))
      .collect()
    sizes.foreach { r =>
      assert(r.getAs[Long]("lo") == r.getAs[Long]("hi"))
      assert(r.getAs[Long]("released") == r.getAs[Long]("lo"),
        s"grp_n must equal the released group size: $r")
      if (r.getInt(0) < 2)
        assert(r.getAs[Long]("released") >= 3L, s"under-k group released: $r")
    }
  }

  test("fails loud on empty ladders and non-positive k") {
    val df = rows.toDF("id", "a", "b")
    intercept[IllegalArgumentException](
      PrivacyOps.kAnonymize(df, "id", Seq.empty, 3L))
    intercept[IllegalArgumentException](
      PrivacyOps.kAnonymize(df, "id", Seq("a"), 0L))
  }

  // --- lDiversify: the homogeneity attack k-anonymity alone permits ------

  // (id, a, b, s) with k = 2, l = 2:
  //  H: (1,1) x3, all s='x' -> k-satisfied but HOMOGENEOUS (ndv 1 < 2):
  //     must NOT publish at L0; at L1 a=1 the residual is still all-'x'
  //     -> falls through to full suppression
  //  D: (1,2) x2, s='x','y' -> publishes at L0 (size 2, ndv 2)
  //  S: (2,1) x1 + (2,2) x1, s='x','y' -> L0 singletons; L1 a=2 has
  //     size 2, ndv 2 -> publishes at L1
  private val ldRows = Seq(
    (1L, 1L, 1L, "x"), (2L, 1L, 1L, "x"), (3L, 1L, 1L, "x"),
    (4L, 1L, 2L, "x"), (5L, 1L, 2L, "y"),
    (6L, 2L, 1L, "x"), (7L, 2L, 2L, "y"))

  private lazy val ldOut =
    PrivacyOps.lDiversify(ldRows.toDF("id", "a", "b", "s"), "id",
                          Seq("a", "b"), "s", k = 2L, l = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap

  test("lDiversify refuses homogeneous groups k-anonymity would publish") {
    // the attack: plain kAnonymize(k=2) publishes ids 1-3 at level 0 —
    // anyone who can place a person in group (1,1) learns s='x'
    val kOnly = PrivacyOps.kAnonymize(
      ldRows.toDF("id", "a", "b", "s").drop("s"), "id", Seq("a", "b"), 2L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(kOnly(_) == 0))
    // lDiversify cascades them to full suppression (L1 a=1 residual is
    // still homogeneous), with honest grp_n and div_n
    Seq(1L, 2L, 3L).foreach(id => assert(ldOut(id) == ((2, "*|*", 3L, 1L))))
    Seq(4L, 5L).foreach(id => assert(ldOut(id) == ((0, "1|2", 2L, 2L))))
    Seq(6L, 7L).foreach(id => assert(ldOut(id) == ((1, "2|*", 2L, 2L))))
  }

  test("every published non-suppressed l-diverse group meets both floors over RELEASED members") {
    val df = PrivacyOps.lDiversify(ldRows.toDF("id", "a", "b", "s"), "id",
                                   Seq("a", "b"), "s", k = 2L, l = 2L)
      .join(ldRows.toDF("id", "a", "b", "s").select(col("id"), col("s")),
            "id")
    val stats = df.groupBy(col("level"), col("gen"))
      .agg(count(lit(1)).as("released"),
           countDistinct(col("s")).as("released_ndv"),
           min(col("grp_n")).as("gn"), min(col("div_n")).as("dn"))
      .collect()
    stats.foreach { r =>
      assert(r.getAs[Long]("released") == r.getAs[Long]("gn"))
      assert(r.getAs[Long]("released_ndv") == r.getAs[Long]("dn"))
      if (r.getInt(0) < 2) {
        assert(r.getAs[Long]("released") >= 2L)
        assert(r.getAs[Long]("released_ndv") >= 2L,
          s"homogeneous group released: $r")
      }
    }
  }

  // --- geometricNoise: the trailing-zero draw vs a straight-line reference

  private def refTz(key: String, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + key).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val h = java.lang.Long.parseLong(hex, 16)
    if (h == 0L) 48L else java.lang.Long.numberOfTrailingZeros(h).toLong
  }

  test("geometricNoise matches the md5 trailing-zero reference and is a pure key function") {
    val keys = (0 until 512).map(i => s"grp:$i")
    val got = keys.toDF("k")
      .select(col("k"),
              PrivacyOps.geometricNoise(col("k"), "dpa:", "dpb:").as("nz"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(got(k) == refTz(k, "dpa:") - refTz(k, "dpb:"), s"key $k")
    }
  }

  test("geometricNoise refuses equal salts (noise would be identically zero)") {
    intercept[IllegalArgumentException](
      PrivacyOps.geometricNoise(col("k"), "same:", "same:"))
  }

  test("geometric draws have the advertised shape: P(tz=0) ~ 1/2, mean ~ 1") {
    // deterministic given the fixed key set — a distribution audit, not a
    // flaky statistical test
    val draws = (0 until 4096).map(i => refTz(s"grp:$i", "dpa:"))
    val p0 = draws.count(_ == 0L).toDouble / draws.size
    val mean = draws.sum.toDouble / draws.size
    assert(math.abs(p0 - 0.5) < 0.03, s"P(tz=0) = $p0")
    assert(math.abs(mean - 1.0) < 0.1, s"mean = $mean")
  }
}
