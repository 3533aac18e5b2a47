package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pointer-doubling hierarchy resolution: randomized equivalence against a
  * node-at-a-time reference walk, plus the loud-failure contracts (dangling
  * parents, cycles). */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def reference(par: Map[Long, Option[Long]]): Map[Long, (Long, Long)] =
    par.keys.map { n =>
      var cur = n; var d = 0L
      while (par(cur).isDefined) { cur = par(cur).get; d += 1 }
      n -> ((cur, d))
    }.toMap

  test("rootAndDepth equals the reference walk on random forests") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      // random forest: each node's parent is a strictly smaller id (or
      // none), so the relation is acyclic by construction; chain-heavy
      // shape (80% pick id-1) forces real depth, not just log-star stubs
      val par: Map[Long, Option[Long]] = (1L to n).map { i =>
        i -> (if (i == 1 || rnd.nextInt(10) == 0) None
              else if (rnd.nextInt(10) < 8) Some(i - 1)
              else Some(1L + rnd.nextInt((i - 1).toInt)))
      }.toMap
      val df = par.toSeq.map { case (k, v) => (k, v) }
        .toDF("node", "parent")
      val got = GraphOps.rootAndDepth(df)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == reference(par), s"trial $trial mismatch")
      val maxDepth = reference(par).values.map(_._2).max
      assert(maxDepth > 8, s"trial $trial fixture too shallow: $maxDepth")
    }
  }

  test("shortestPaths equals a Dijkstra reference on random weighted graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = (1 to 150).map { _ =>
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n), 1L + rnd.nextInt(9))
      }.distinct
      val df = edges.toDF("src", "dst", "w")
      val seeds = Seq(1L).toDF("node")
      val got = GraphOps.shortestPaths(df, seeds, maxIters = 80)
        .as[(Long, Long)].collect().toMap
      // reference: Dijkstra toward node 1 over reversed edges
      val adj = edges.groupBy(_._2).view
        .mapValues(_.map(e => (e._1, e._3))).toMap
      val dist = scala.collection.mutable.Map(1L -> 0L)
      val pq = scala.collection.mutable.PriorityQueue((0L, 1L))(
        Ordering.by(-_._1))
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (d == dist(u))
          adj.getOrElse(u, Nil).foreach { case (v, w) =>
            if (dist.get(v).forall(_ > d + w)) {
              dist(v) = d + w; pq.enqueue((d + w, v))
            }
          }
      }
      assert(got == dist.toMap, s"trial $trial mismatch")
      assert(got.size > 10 && got.values.max > 3,
        s"trial $trial fixture too trivial: ${got.size} reached")
    }
  }

  test("shortestPaths fails loud when rounds are exhausted before the fixpoint") {
    // a 5-hop chain cannot converge in 2 rounds
    val chain = Seq((2L, 1L, 1L), (3L, 2L, 1L), (4L, 3L, 1L),
                    (5L, 4L, 1L), (6L, 5L, 1L)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      GraphOps.shortestPaths(chain, Seq(1L).toDF("node"), maxIters = 2)
        .collect()
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("rootAndDepth fails loud on a dangling parent") {
    val df = Seq((1L, None: Option[Long]), (2L, Some(99L))).toDF("node", "parent")
    val e = intercept[IllegalArgumentException] {
      GraphOps.rootAndDepth(df).collect()
    }
    assert(e.getMessage.contains("dangling"))
  }

  test("rootAndDepth fails loud on a cycle instead of returning wrong roots") {
    val df = Seq((1L, Some(2L)), (2L, Some(1L)), (3L, None: Option[Long]))
      .toDF("node", "parent")
    val e = intercept[IllegalArgumentException] {
      GraphOps.rootAndDepth(df, maxIters = 8).collect()
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("kCore equals reference peeling on random sparse graphs; paths dissolve, cycles survive") {
    def refKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
      var adj = edges.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var changed = true
      while (changed) {
        val drop = adj.collect { case (n, nb) if nb.size < k => n }.toSet
        changed = drop.nonEmpty
        adj = (adj -- drop).view
          .mapValues(_.filterNot(drop)).filter(_._2.nonEmpty).toMap
      }
      adj.view.mapValues(_.size).toMap
    }
    def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
      GraphOps.kCore(edges.toDF("src", "dst"), k)
        .as[(Long, Long)].collect().toMap
    // a pure path has no 2-core; a cycle is its own 2-core
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 2) === Map.empty)
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 2)
      === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val rnd = new scala.util.Random(67)
    for (trial <- 1 to 3; k <- Seq(2, 3)) {
      val n = 40
      val edges = (0 until 70).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val want = refKCore(edges.toSet, k).map { case (x, d) => x -> d.toLong }
      assert(run(edges, k) === want, s"trial $trial k=$k")
    }
  }
}
