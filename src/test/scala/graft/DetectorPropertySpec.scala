package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized equivalence for the round-9 sequential-form operators: the
  * distributed closed forms must equal the textbook row-at-a-time
  * recurrences on arbitrary inputs, and the attribution split must
  * conserve credit exactly. */
class DetectorPropertySpec extends SparkSpec {
  import spark.implicits._

  test("x112 closed prefix form equals the sequential CUSUM recurrence on random series") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val k = 2L
      val series = (1 to 5).flatMap { u =>
        (1 to 40).map(d => (u.toLong, d.toLong, rnd.nextInt(6).toLong))
      }
      // textbook recurrence per user
      val want = series.groupBy(_._1).flatMap { case (u, rows) =>
        var s = 0L
        rows.sortBy(_._2).map { case (_, d, c) =>
          s = math.max(0L, s + (c - k)); (u, d, s)
        }
      }.toSet
      val w = Window.partitionBy(col("u")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val got = series.toDF("u", "d", "c")
        .withColumn("p", sum(col("c") - lit(k)).over(w))
        .withColumn("cusum",
          col("p") - least(lit(0L), min(col("p")).over(w)))
        .select(col("u"), col("d"), col("cusum"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"trial $trial: closed form must equal recurrence")
      assert(want.exists(_._3 > 0), s"trial $trial fixture vacuous")
    }
  }

  test("x113 U-shaped credits conserve exactly 1000 permille per conversion for every touch count") {
    // drive the weight formula across n = 1..50 directly
    for (n <- 1 to 50) {
      val credits = (1 to n).map { rn =>
        if (n == 1) 1000L
        else if (n == 2) 500L
        else if (rn == 1 || rn == n) 400L
        else 200L / (n - 2) + (if (rn - 2 < 200 % (n - 2)) 1L else 0L)
      }
      assert(credits.sum == 1000L, s"n=$n: ${credits.sum}")
      assert(credits.forall(_ >= 0L), s"n=$n negative credit")
      if (n >= 3) assert(credits.head == 400L && credits.last == 400L)
    }
  }

  test("x116 digest ring: incremental merge equals recompute under random add/remove/edit deltas") {
    val rnd = new scala.util.Random(23)
    def fp(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .select(pmod(col("doc_id"), lit(8L)).as("bucket"),
        conv(substring(md5(concat_ws(":", col("doc_id"), col("text"))
          .cast("binary")), 1, 12), 16, 10).cast("long").as("f"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("f")).as("d"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    for (trial <- 1 to 3) {
      val before = (1L to 40L).map(i => i -> s"doc $i v${rnd.nextInt(3)}")
      val removedIds = before.map(_._1).filter(_ => rnd.nextBoolean()).take(8)
      val editedIds = before.map(_._1)
        .filterNot(removedIds.contains).filter(_ => rnd.nextBoolean()).take(6)
      val after = before.filterNot(r => removedIds.contains(r._1))
        .map { case (i, t) =>
          i -> (if (editedIds.contains(i)) t + " EDITED" else t) } ++
        (100L to 104L).map(i => i -> s"new $i")
      // signed delta from the two states
      val bm = before.toMap
      val am = after.toMap
      val delta = removedIds.map(i => (i, bm(i), -1L)) ++
        editedIds.flatMap(i => Seq((i, bm(i), -1L), (i, am(i), 1L))) ++
        (100L to 104L).map(i => (i, am(i), 1L))
      val deltaDig = delta.toDF("doc_id", "text", "m")
        .select(pmod(col("doc_id"), lit(8L)).as("bucket"), col("m"),
          (col("m") * conv(substring(md5(concat_ws(":", col("doc_id"),
            col("text")).cast("binary")), 1, 12), 16, 10).cast("long"))
            .as("mf"))
        .groupBy(col("bucket"))
        .agg(sum(col("m")).as("dn"), sum(col("mf")).as("dd"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
      val merged = (fp(before.toSeq).keySet ++ deltaDig.keySet).map { b =>
        val (n0, d0) = fp(before.toSeq).getOrElse(b, (0L, 0L))
        val (dn, dd) = deltaDig.getOrElse(b, (0L, 0L))
        b -> ((n0 + dn, d0 + dd))
      }.filter(_._2._1 > 0).toMap
      assert(merged == fp(after.toSeq),
        s"trial $trial: incremental digest must equal recompute")
    }
  }

  test("wrap64 equals the BigInt two's-complement reference on random signed sums") {
    import graft.functions.DigestFunctions
    val rnd = new scala.util.Random(31)
    val W = BigInt(1) << 64
    def ref(vals: Seq[Long]): Long = {
      val m = (vals.map(BigInt(_)).sum.mod(W) + W).mod(W)
      (if (m >= (BigInt(1) << 63)) m - W else m).toLong
    }
    for (trial <- 1 to 5) {
      // mix magnitudes so some trials wrap multiple times and some not
      // at all, with both signs
      val vals = (1 to 30).map { _ =>
        val mag = rnd.nextInt(3) match {
          case 0 => rnd.nextLong() >>> 16 // ~2^48, the fingerprint regime
          case 1 => rnd.nextLong() >>> 2  // ~2^62, forces wraps
          case _ => rnd.nextInt(1000).toLong
        }
        if (rnd.nextBoolean()) mag else -mag
      }
      val got = vals.toDF("f")
        .agg(DigestFunctions.digestSum(col("f")).as("d"))
        .as[Long].head()
      assert(got === ref(vals), s"trial $trial: $vals")
    }
  }

  test("JoinAdvisor estimates dominate exact pairwise join sizes on random relations") {
    import graft.ops.JoinAdvisorOps
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val rels: Map[String, Seq[Int]] = Map(
        "r1" -> (1 to 200).filter(_ => rnd.nextBoolean()),
        "r2" -> (1 to 200).filter(_ => rnd.nextInt(3) == 0)
          .flatMap(k => Seq.fill(1 + rnd.nextInt(3))(k)), // dup keys
        "r3" -> (100 to 300).filter(_ => rnd.nextBoolean()))
      val frames = rels.map { case (n, ks) =>
        n -> ks.map(_.toString).toDF("k")
      }
      val sk = frames.map { case (n, df) =>
        n -> JoinAdvisorOps.sketch(df, "k").persist()
      }
      val advice = JoinAdvisorOps.advise(sk)
      // exact pairwise inner-join sizes (with multiplicity)
      def exact(a: String, b: String): Long = {
        val cb = rels(b).groupBy(identity).view.mapValues(_.size).toMap
        rels(a).map(k => cb.getOrElse(k, 0).toLong).sum
      }
      advice.pairs.foreach { p =>
        assert(p.est >= exact(p.a, p.b),
          s"trial $trial ${p.label}: est ${p.est} < exact ${exact(p.a, p.b)}")
      }
      spark.catalog.clearCache()
    }
  }
}
