package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomOps

/** Semantics the q72–q77 / x38–x39 oracles can't isolate: bloom-prefilter
  * exactness (including false-positive removal), chunking boundaries, and
  * plan shapes for the decorrelated subqueries. */
class RelationalQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q74 bloom prefilter semi join ≡ plain semi join (false positives removed)") {
    val left = (0L until 1000L).toDF("k")
    val right = Seq(3L, 7L, 500L, 999L).toDF("rk")
    // tiny filter + high fpp forces real false positives through the bloom
    val got = BloomOps.bloomPrefilterSemiJoin(left, right, "k", "rk",
        expectedItems = 4, fpp = 0.5)
      .orderBy("k").as[Long].collect()
    assert(got.toSeq === Seq(3L, 7L, 500L, 999L))
  }

  test("q117 retracting IVM: deletes retract sums, a fully-deleted group leaves the view") {
    val dim = Seq((1L, "HIGH"), (2L, "HIGH"), (3L, "LOW"))
      .toDF("ok", "prio")
    val base = Seq((1L, 100L), (2L, 50L), (3L, 30L)).toDF("ok", "c")
    // delete ok=2 (partial retraction of HIGH), delete ok=3 AND insert
    // nothing for LOW (full retraction), insert ok=1 a second time
    val batch = Seq((2L, 50L, -1L), (3L, 30L, -1L), (1L, 200L, 1L))
      .toDF("ok", "c", "m")
    val got = EtlQueries.ivmRetract(base, batch, dim)
      .orderBy("prio")
      .as[(String, Long, Long, Long)].collect().toSeq
    // HIGH: rows (1,100),(1,200) → n=2, s=300, avg=150; LOW: gone
    assert(got === Seq(("HIGH", 2L, 300L, 150L)),
      s"retraction must drop LOW and re-aggregate HIGH, got $got")
  }

  test("q74 bloom prefilter: null left keys never match") {
    val left = Seq(Some(1L), None, Some(2L)).toDF("k")
    val right = Seq(1L).toDF("rk")
    val got = BloomOps.bloomPrefilterSemiJoin(left, right, "k", "rk",
        expectedItems = 4)
      .as[Option[Long]].collect()
    assert(got.toSeq === Seq(Some(1L)))
  }

  test("q72 EXISTS/NOT EXISTS decorrelate to semi/anti joins (no subquery re-execution)") {
    Seq((1L, "a")).toDF("c_custkey", "c_name").createOrReplaceTempView("c_t")
    Seq((1L, 5L)).toDF("o_custkey", "v").createOrReplaceTempView("o_t")
    val plan = spark.sql(
      """SELECT c_custkey FROM c_t c
         WHERE EXISTS (SELECT 1 FROM o_t o WHERE o.o_custkey = c.c_custkey)
           AND NOT EXISTS (SELECT 1 FROM o_t o2
                           WHERE o2.o_custkey = c.c_custkey AND o2.v < 0)""")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("x38 chunking: stride windows cover every token exactly once per stride") {
    // 90 tokens, chunk 50 / stride 40 → chunks at 0 (50 tokens) and 40 (50)
    val text = (0 until 90).map(i => s"t$i").mkString(" ")
    val out = RelationalQueriesSpecHelper.chunks(spark, Seq((1L, text)))
    assert(out === Seq((1L, 0L, 50L), (1L, 1L, 50L), (1L, 2L, 10L)))
  }

  test("x38 chunking: a doc shorter than one chunk yields a single short chunk") {
    val out = RelationalQueriesSpecHelper.chunks(spark, Seq((1L, "a b c")))
    assert(out === Seq((1L, 0L, 3L)))
  }

  test("q76 array set ops: empty sides behave as empty sets, duplicates collapse") {
    val df = Seq(
      (1L, 1L, 30.0, 0.01),  // only a
      (1L, 1L, 30.0, 0.01),  // duplicate linenumber in a
      (1L, 2L, 10.0, 0.10))  // only b
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    val row = df.groupBy(col("l_orderkey"))
      .agg(
        sort_array(collect_list(
          when(col("l_quantity") > 25, col("l_linenumber")))).as("_a"),
        sort_array(collect_list(
          when(col("l_discount") > 0.05, col("l_linenumber")))).as("_b"))
      .select(
        array_sort(array_intersect(col("_a"), col("_b"))).as("ln_both"),
        array_sort(array_union(col("_a"), col("_b"))).as("ln_any"),
        array_sort(array_except(col("_a"), col("_b"))).as("ln_only_a"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].head()
    assert(row === ((Seq.empty[Long], Seq(1L, 2L), Seq(1L))))
  }

  test("q83 BFS: minimum hop wins when a node is reachable at several depths") {
    // diamond a→{b,c}, b→c: c is reachable at depth 1 (direct) and 2 (via b)
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = graft.ops.GraphOps.bfs(edges, seeds, maxDepth = 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 3L))
  }

  test("q83 BFS: maxDepth bounds expansion; disconnected nodes never appear") {
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = graft.ops.GraphOps.bfs(edges, seeds, maxDepth = 1)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 1L))
  }

  test("q83 BFS: exits early when the frontier drains; no leaked cache blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    // maxDepth far beyond the graph's diameter: the drained-frontier exit
    // must stop the loop, and the answer must equal the exact-depth run
    val r1 = graft.ops.GraphOps.bfs(edges, seeds, maxDepth = 10)
    val got = r1.as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 3L))
    // everything except the returned (checkpointed) result is freed
    // synchronously inside bfs — repeated runs must not accumulate blocks
    val afterFirst = sc.getPersistentRDDs.size
    assert(afterFirst <= before + 1,
      s"bfs leaked cache blocks: before=$before after=$afterFirst")
    graft.ops.CheckpointOps.free(r1)
    val r2 = graft.ops.GraphOps.bfs(edges, seeds, maxDepth = 10)
    assert(r2.count() === 5)
    val afterSecond = sc.getPersistentRDDs.size
    assert(afterSecond <= before + 1,
      s"bfs rerun leaked cache blocks: before=$before after=$afterSecond")
    graft.ops.CheckpointOps.free(r2)
    assert(sc.getPersistentRDDs.size <= before,
      "CheckpointOps.free must release the returned checkpoint's blocks")
  }

  test("q83 BFS: the shuffled-frontier path (smallFrontier=false) returns identical hops") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = graft.ops.GraphOps
      .bfs(edges, seeds, maxDepth = 4, smallFrontier = false)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 3L))
  }

  test("q82 exact-moment regression agrees with Spark's native regr_* aggregates") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q82_regr_agg")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    Tables(spark, sf, "lineitem").createOrReplaceTempView("li_q82spec")
    val native = spark.sql(
      """SELECT l_returnflag, regr_slope(y, x), regr_intercept(y, x),
                corr(x, y) * corr(x, y)
         FROM (SELECT l_returnflag,
                 CAST(round(l_quantity) AS DOUBLE) AS x,
                 CAST(round(l_extendedprice * 100) AS DOUBLE) AS y
               FROM li_q82spec)
         GROUP BY l_returnflag""").collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet === native.keySet)
    def close(a: Double, b: Double) =
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b))
    for (k <- got.keySet) {
      val ((s1, i1, r1), (s2, i2, r2)) = (got(k), native(k))
      assert(close(s1, s2), s"slope $k: $s1 vs $s2")
      assert(close(i1, i2), s"intercept $k: $i1 vs $i2")
      assert(close(r1, r2), s"r2 $k: $r1 vs $r2")
    }
  }
  test("q85 funnel: pre-view clicks and out-of-window events don't convert; bounds are (strict, inclusive]") {
    val ev = Seq(
      // user 1: clean view → click → purchase chain, all inside 24 h
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:30:00"),
      (1L, "purchase", "2024-01-01 11:00:00"),
      // user 2: a click BEFORE the first view (ignored) and one > 24 h
      // after it (outside the window) → stage 1 only
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-02 11:01:00"),
      // user 3: converts to click; purchase lands 2 days later → stage 2
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "click", "2024-01-01 10:05:00"),
      (3L, "purchase", "2024-01-03 10:05:00"),
      // user 5: click EXACTLY 24 h after the view (inclusive bound → in),
      // purchase at the same instant as the click (strict bound → out)
      (5L, "view", "2024-01-01 10:00:00"),
      (5L, "click", "2024-01-02 10:00:00"),
      (5L, "purchase", "2024-01-02 10:00:00"),
      // user 6: purchase with no view at all → no stage
      (6L, "purchase", "2024-01-01 12:00:00"))
      .toDF("user_id", "event_type", "_t")
      .withColumn("ts", to_timestamp(col("_t")))
    val got = RelationalQueries
      .eventFunnel(ev, Seq("view", "click", "purchase"), "INTERVAL 24 HOURS")
      .select("stage", "stage_name", "users")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "view", 4L), (2L, "click", 3L),
                       (3L, "purchase", 1L)))
  }

  test("q86 retention: same-day repeats collapse; offsets are from each user's own cohort day") {
    val ev = Seq(
      (1L, "2024-01-02 09:00:00"), // user 1 cohort day 1...
      (1L, "2024-01-02 21:00:00"), // same day again → counted once
      (1L, "2024-01-05 09:00:00"), // offset 3
      (2L, "2024-01-05 10:00:00")) // user 2 cohort day 4, offset 0
      .toDF("user_id", "_t")
      .withColumn("ts", to_timestamp(col("_t")))
    val got = RelationalQueries.retentionCohorts(ev, "2024-01-01")
      .select("cohort_day", "offset_day", "n_users")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L, 1L), (1L, 3L, 1L), (4L, 0L, 1L)))
  }

  test("q87 discrete median: k-th smallest of the expanded multiset, k = (n+1) DIV 2") {
    val vc = Seq(
      // even count, distinct values: k = 2 → 2nd smallest (no interpolation)
      ("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L), ("a", 4.0, 1L),
      // a single value with multiplicity: k = 2 lands inside its run
      ("b", 5.0, 3L),
      // multiplicities spanning the midpoint: n = 3, k = 2 → the c=2 value
      ("c", 1.0, 2L), ("c", 10.0, 1L))
      .toDF("prio", "v", "c")
    val got = RelationalQueries.discreteMedian(vc, "v")
      .orderBy("prio").as[(String, Double)].collect().toSeq
    assert(got === Seq(("a", 2.0), ("b", 5.0), ("c", 1.0)))
  }

  test("q88 markov: pairs are per-user adjacent, ppm is over outgoing total, single events drop") {
    val ev = Seq(
      // user 1: A → B → B  (pairs A→B, B→B)
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (2L, 1L, "B", "2024-01-01 10:01:00"),
      (3L, 1L, "B", "2024-01-01 10:02:00"),
      // user 2: A → C; the tie on ts is broken by event_id (4 before 5)
      (4L, 2L, "A", "2024-01-01 09:00:00"),
      (5L, 2L, "C", "2024-01-01 09:00:00"),
      // user 3: a single event yields no transition
      (6L, 3L, "B", "2024-01-01 08:00:00"))
      .toDF("event_id", "user_id", "event_type", "_t")
      .withColumn("ts", to_timestamp(col("_t")))
    val got = RelationalQueries.markovTransitions(ev)
      .as[(String, String, Long, Long)].collect().toSeq
    // A's outgoing total is 2 → each A-pair is 500000 ppm
    assert(got === Seq(("A", "B", 1L, 500000L), ("A", "C", 1L, 500000L),
                       ("B", "B", 1L, 1000000L)))
  }

  test("q89 interval peak: closed intervals, earliest peak day wins") {
    val li = Seq(
      // flag R: [Jan2,Jan4] and [Jan3,Jan5] overlap Jan3–Jan4
      // (peak 2, first reached on Jan3 = day 2)
      ("R", "1992-01-02", 2), ("R", "1992-01-03", 2),
      // flag N: [Jan3,Jan5] and [Jan5,Jan6] meet ONLY at the shared
      // endpoint — closed intervals → both open on Jan5 (= day 4)
      ("N", "1992-01-03", 2), ("N", "1992-01-05", 1))
      .toDF("flag", "_d", "qty")
      .withColumn("d0", col("_d").cast("date"))
    val got = RelationalQueries.intervalPeak(li, "1992-01-01")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("N", 2L, 4L), ("R", 2L, 2L)))
  }

  test("q91 triangle count: each triangle counted once under degree orientation") {
    // two triangles sharing the edge 2–3, plus an isolated edge 5–6
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 6L))
      .toDF("u", "v")
    val got = RelationalQueries.triangleCount(e)
      .as[(Long, Long, Long)].head()
    assert(got === ((6L, 6L, 2L)))
  }

  test("q91 triangle count: a triangle-free bipartite square yields zero") {
    val e = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("u", "v")
    val got = RelationalQueries.triangleCount(e)
      .as[(Long, Long, Long)].head()
    assert(got === ((4L, 4L, 0L)))
  }

  test("q112 skyline: dominance, same-price ties, and duplicate points") {
    val pts = Seq(
      ("g", 1L, 10L, 5L),  // cheapest price → trivially on the frontier
      ("g", 2L, 10L, 3L),  // same price, smaller size → dominated by id 1
      ("g", 3L, 20L, 7L),  // bigger than every cheaper row (5) → survives
      ("g", 4L, 20L, 7L),  // exact duplicate of id 3 → BOTH survive
      ("g", 5L, 30L, 7L),  // id 3 is cheaper at equal size → dominated
      ("g", 6L, 30L, 9L),  // new max size → survives
      ("h", 7L, 99L, 1L))  // singleton group → survives
      .toDF("p_brand", "p_partkey", "price_cents", "sz")
    val got = RelationalQueries.skyline(pts)
      .orderBy("p_brand", "p_partkey")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("g", 1L, 10L, 5L), ("g", 3L, 20L, 7L), ("g", 4L, 20L, 7L),
      ("g", 6L, 30L, 9L), ("h", 7L, 99L, 1L)))
  }

  test("q113 MAD: zero-MAD heavy mode and a skewed tail both census correctly") {
    val rows = Seq.fill(9)(("a", 100L)) ++ Seq(("a", 1000L)) ++
      Seq(("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L), ("b", 100L))
    val got = RelationalQueries.madOutliers(rows.toDF("flag", "v"))
      .orderBy("flag").as[(String, Long, Long, Long, Long)].collect().toSeq
    // a: med=100, MAD=0 (9 of 10 devs are 0) → the 1000 is 900 > 0 → 1 out
    // b: med=3, devs {2,1,0,1,97} → MAD=1 → only 100 exceeds 3·1
    assert(got === Seq(("a", 100L, 0L, 10L, 1L), ("b", 3L, 1L, 5L, 1L)))
  }

  test("q90 weighted median: smallest value whose cumulative weight reaches (W+1) DIV 2") {
    val rows = Seq(
      // flag a: W=10, k=5 → v=2 (cum 3 < 5 ≤ 7)
      ("a", 1L, 3L), ("a", 2L, 4L), ("a", 3L, 3L),
      // flag b: heavy head — W=101, k=51 lands inside v=1's run
      ("b", 1L, 100L), ("b", 9L, 1L),
      // flag c: duplicate (v) rows merge before the cumulative pass
      ("c", 5L, 1L), ("c", 5L, 1L), ("c", 4L, 1L))
      .toDF("flag", "v", "w")
    val got = RelationalQueries.weightedMedian(rows)
      .orderBy("flag").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 2L, 10L), ("b", 1L, 101L), ("c", 5L, 3L)))
  }

  test("q110 interval lookup: misses stay NULL, bounds land inclusive, unsorted dim fails fast") {
    val facts = Seq(-5L, 0L, 9L, 10L, 11L, 99L).toDF("v")
    val got = graft.ops.RangeLookupOps
      .intervalLookup(facts, col("v"), Seq(0L -> "a", 10L -> "b"))
      .orderBy("v")
      .as[(Long, Option[Long], Option[String], Option[Long])]
      .collect().toSeq
    assert(got === Seq(
      (-5L, None, None, None),               // below every bound → miss
      (0L, Some(0L), Some("a"), Some(0L)),   // lower bound is inclusive
      (9L, Some(0L), Some("a"), Some(0L)),
      (10L, Some(1L), Some("b"), Some(10L)), // boundary-exact → next tier
      (11L, Some(1L), Some("b"), Some(10L)),
      (99L, Some(1L), Some("b"), Some(10L)))) // last tier open-ended
    // Long.MaxValue: the +1 probe would wrap to MinValue and report a
    // miss — the branched path must land it in the open-ended last tier
    val top = graft.ops.RangeLookupOps
      .intervalLookup(Seq(Long.MaxValue).toDF("v"), col("v"),
        Seq(0L -> "a", 10L -> "b"))
      .as[(Long, Option[Long], Option[String], Option[Long])]
      .collect().toSeq
    assert(top === Seq((Long.MaxValue, Some(1L), Some("b"), Some(10L))))
    intercept[IllegalArgumentException] {
      graft.ops.RangeLookupOps.intervalLookup(
        facts, col("v"), Seq(10L -> "a", 10L -> "b"))
    }
  }

  test("q111 set-sim join: boundary tau kept, subsets scored on union, singletons never pair below tau") {
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")),      // jac(1,2) = 1.0
      (3L, Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      //    jac(1,3) = 4/8 = tau exactly → KEPT (>= is closed)
      (4L, Seq("x")),                     // shares nothing
      (5L, Seq("a")))                     // jac(5,1) = 1/4 < tau
      .toDF("doc_id", "sh")
    val got = graft.operators.SetSimJoin.join(docs, "doc_id", "sh", 1, 2)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 4L, 4L, 1.0), (1L, 3L, 4L, 8L, 0.5),
      (2L, 3L, 4L, 8L, 0.5)))
  }


  test("x104 cosine join: boundary tau kept, prefix equals brute force on crafted sets") {
    // cos(1,2) = 1.0; cos(1,3) = 4/sqrt(4*25) = 0.4 < 0.8 -> dropped;
    // cos(4,5) = 4/sqrt(4*5) ~= 0.894 -> kept; cos(1,5) = 4/sqrt(20)
    // ~= 0.894 -> kept; (6,7) share nothing
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, (1 to 21).map(i => s"z$i") ++ Seq("a", "b", "c", "d")),
      (4L, Seq("a", "b", "c", "d")),
      (5L, Seq("a", "b", "c", "d", "e")),
      (6L, Seq("q", "r")),
      (7L, Seq("s", "t")))
      .toDF("doc_id", "sh")
    val got = graft.operators.SetSimJoin
      .cosineJoin(docs, "doc_id", "sh", 4, 5)
      .select("id_a", "id_b", "inter", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // brute force with the same integer test
    val raw = Seq(1L -> Set("a","b","c","d"), 2L -> Set("a","b","c","d"),
      3L -> ((1 to 21).map(i => s"z$i").toSet ++ Set("a","b","c","d")),
      4L -> Set("a","b","c","d"), 5L -> Set("a","b","c","d","e"),
      6L -> Set("q","r"), 7L -> Set("s","t"))
    val brute = (for {
      (ia, sa) <- raw; (ib, sb) <- raw if ia < ib
      ov = (sa & sb).size.toLong
      if ov * ov * 25 >= sa.size.toLong * sb.size * 16
    } yield (ia, ib, ov, sa.size.toLong, sb.size.toLong)).toSet
    assert(got == brute, s"got $got want $brute")
    assert(brute.exists { case (a, b, _, na, nb) => na != nb },
      "fixture must exercise unequal set sizes")
  }

  test("set-sim joins keep non-numeric ids intact — no silent long cast to NULL") {
    // a cast("long") on a string id yields NULL, collapsing every pair
    // onto the null id; both join flavors must carry the id type through
    val docs = Seq(
      ("u-a", Seq("a", "b", "c")),
      ("u-b", Seq("a", "b", "c")),
      ("u-c", Seq("x", "y")))
      .toDF("doc_id", "sh")
    val jac = graft.operators.SetSimJoin.join(docs, "doc_id", "sh", 1, 2)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(jac == Set(("u-a", "u-b")), s"jaccard got $jac")
    val cos = graft.operators.SetSimJoin
      .cosineJoin(docs, "doc_id", "sh", 4, 5)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(cos == Set(("u-a", "u-b")), s"cosine got $cos")
  }
}

object RelationalQueriesSpecHelper {
  import org.apache.spark.sql.SparkSession

  /** The x38 chunking dataflow over in-memory docs → (doc, chunk, n_tokens). */
  def chunks(spark: SparkSession,
             docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("_w"))
      .select(col("doc_id"), col("_w"), size(col("_w")).as("_n"))
      .select(col("doc_id"), col("_w"), col("_n"),
        posexplode(sequence(lit(0), col("_n") - 1, lit(40))))
      .select(col("doc_id"), col("pos").cast("long"),
        least(lit(50), col("_n") - col("col")).cast("long"))
      .orderBy("doc_id", "pos")
      .as[(Long, Long, Long)].collect().toSeq
  }
}
