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
}
