package graft.ops

import org.apache.spark.sql.functions._
import scala.util.Random
import graft.SparkSpec

/** Property-style checks (SURVEY.md §5.2.4) over seeded random inputs,
  * evaluated through real Spark plans so the codegen paths are what's
  * tested. Seed fixed for reproducibility. */
class PropertySpec extends SparkSpec {

  private val rnd = new Random(42)
  private def plainStr(): String =
    Random.alphanumeric.take(rnd.nextInt(12)).mkString

  test("D3 never alters strings lacking the trailing .0 artifact") {
    import spark.implicits._
    for (_ <- 1 to 10) {
      val in = List.fill(25)(plainStr()).filterNot(_.endsWith(".0"))
      val out = in.toDF("v")
        .select(ColumnOps.stripDecimalStr(col("v"))).as[String].collect()
      assert(out.toSeq == in)
    }
  }

  test("D11 mask equivalence: defaulted ⇔ value was a missing marker") {
    import spark.implicits._
    val pool: Seq[() => String] = Seq(
      () => null, () => "", () => " nan ", () => "NaN", () => plainStr())
    for (_ <- 1 to 5) {
      val xs = List.fill(40)(pool(rnd.nextInt(pool.size))())
      val out = xs.toDF("v")
        .select(col("v"), ColumnOps.defaultIfMissing(col("v"), "INT").as("r"))
        .collect()
      out.foreach { row =>
        val v = Option(row.getString(0)).map(_.trim)
        val missing = v.isEmpty || v.exists(Set("", "nan", "NaN"))
        assert((row.getString(1) == "INT") == (missing || v.contains("INT")),
          s"v=$v r=${row.getString(1)}")
      }
    }
  }

  test("U2: no duplicate keys survive; every survivor is its group's min ordinal") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val xs = List.fill(50)((rnd.nextInt(6), plainStr()))
      val df = xs.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", DedupOps.OrdinalCol)
        .repartition(3) // property must hold under arbitrary partitioning
      val out = DedupOps.dedupKeepFirst(df, Seq("k"))
        .select("k", DedupOps.OrdinalCol).as[(Int, Long)].collect()
      assert(out.map(_._1).distinct.length == out.length, s"trial $trial")
      val minOrd = xs.zipWithIndex.groupBy(_._1._1)
        .view.mapValues(_.map(_._2.toLong).min).toMap
      out.foreach { case (k, ord) =>
        assert(ord == minOrd(k), s"trial $trial key $k kept $ord") }
    }
  }

  test("U1: union row count is the sum and column set is the union") {
    import spark.implicits._
    for (_ <- 1 to 5) {
      val na = rnd.nextInt(9); val nb = rnd.nextInt(9)
      val a = (0 until na).map(i => (s"a$i", i)).toDF("id", "x")
      val b = (0 until nb).map(i => (s"b$i", i.toDouble)).toDF("id", "y")
      val u = DedupOps.unionByNameOrdered(a, b)
      assert(u.count() == na + nb)
      assert(u.columns.toSet == Set("id", "x", "y", DedupOps.OrdinalCol))
    }
  }

  test("G1: result frequency is maximal; ties take the least value") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val xs = List.fill(40)((rnd.nextInt(4), rnd.nextInt(5)))
      val df = xs.map { case (k, v) => (s"k$k", s"v$v") }.toDF("k", "v")
      val out = AggOps.modeDeterministic(df, "k", "v")
        .as[(String, String)].collect().toMap
      xs.groupBy(_._1).foreach { case (k, group) =>
        val freq = group.groupBy(_._2).view.mapValues(_.size).toMap
        val maxF = freq.values.max
        val expected = freq.collect { case (v, f) if f == maxF => s"v$v" }.min
        assert(out(s"k$k") == expected, s"trial $trial key k$k")
      }
    }
  }

  test("as-of backward ≡ brute force over random keyed timelines") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val r = new Random(100 + trial)
      def mk(n: Int, base: Int) = (1 to n).map { i =>
        ((base + i).toLong, s"k${r.nextInt(4)}",
         new java.sql.Timestamp(1700000000000L + r.nextInt(500000) * 1000L))
      }
      val lv = mk(120, 0)
      val rv = mk(80, 1000)
      val out = graft.operators.TemporalJoins.asofJoinBackward(
          lv.toDF("id", "k", "ts"), rv.toDF("id", "k", "ts"),
          Seq("k"), "ts", "ts", Seq("id"), "_m")
        .select("id", "id_m").collect()
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
      val expected = lv.map { case (lid, lk, lts) =>
        val cands = rv.filter(c => c._2 == lk && !c._3.after(lts))
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(c => (c._3.getTime, c._1))._1))
      }.toMap
      assert(out == expected, s"trial $trial")
    }
  }

  test("validityIntervals tile the timeline for every key, every trial") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val r = new Random(200 + trial)
      val log = (1 to 100).map { i =>
        (i.toLong, s"k${r.nextInt(6)}",
         new java.sql.Timestamp(1700000000000L + r.nextInt(100000) * 1000L))
      }
      val iv = HistoryOps.validityIntervals(
          log.toDF("id", "k", "ts"), Seq("k"), "ts",
          Seq(col("id")))
        .collect().map(x => (x.getString(1), x.getLong(0),
          x.getTimestamp(3), Option(x.getTimestamp(4))))
      iv.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(x => (x._3.getTime, x._2))
        // exactly one open interval per key, and it is the last one
        assert(sorted.count(_._4.isEmpty) == 1 && sorted.last._4.isEmpty)
        // each valid_to equals the next row's valid_from
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._4.contains(b._3))
          case _ =>
        }
      }
    }
  }

  test("x38 chunking: windows cover every token, overlap is exactly size−stride") {
    for (n <- Seq(1, 5, 39, 40, 41, 50, 51, 89, 90, 91, 200) ++
              List.fill(5)(1 + rnd.nextInt(400))) {
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      val chunks = graft.RelationalQueriesSpecHelper
        .chunks(spark, Seq((1L, text)))
      // starts are 0, 40, 80, …, ≤ n-1
      assert(chunks.size == (n - 1) / 40 + 1, s"n=$n")
      chunks.foreach { case (_, cid, len) =>
        val start = cid * 40
        assert(len == math.min(50, n - start), s"n=$n chunk=$cid")
      }
      // coverage: the union of [start, start+len) is [0, n)
      val covered = chunks.flatMap { case (_, cid, len) =>
        (cid * 40) until (cid * 40 + len) }.toSet
      assert(covered == (0L until n.toLong).toSet, s"n=$n")
      // full interior chunks overlap the next chunk by exactly 10 tokens
      chunks.sliding(2).foreach {
        case Seq((_, c1, l1), (_, c2, _)) if l1 == 50 && c2 == c1 + 1 =>
          assert(c1 * 40 + l1 - c2 * 40 == 10)
        case _ =>
      }
    }
  }
}
