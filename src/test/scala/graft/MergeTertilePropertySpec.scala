package graft

import org.apache.spark.sql.functions._
import scala.util.Random
import graft.SparkSpec

/** Property checks for x154/x156 over seeded random inputs: a full
  * straight-line second implementation of the three-way merge decision
  * table, and the grouped-tertile invariants (order, tie closure, rank
  * floors) — evaluated through real Spark plans like PropertySpec. */
class MergeTertilePropertySpec extends SparkSpec {

  private def md5s(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("threeWayMerge equals a straight-line decision-table reference on random branch triples") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val pool = Vector("alpha", "beta", "gamma", "delta")
      val base = (1L to 60L).map(i => i -> pool(rnd.nextInt(pool.size))).toMap
      def branch(): Map[Long, String] = {
        val edited = base.flatMap { case (id, tx) =>
          rnd.nextInt(10) match {
            case 0 | 1 => Some(id -> (tx + ":m" + (rnd.nextInt(2) + 1)))
            case 2     => None // delete
            case _     => Some(id -> tx)
          }
        }
        val adds = (100L to 115L).flatMap { id =>
          if (rnd.nextBoolean()) Some(id -> ("new:" + rnd.nextInt(2)))
          else None
        }.toMap
        edited ++ adds
      }
      val ours = branch(); val theirs = branch()
      // straight-line reference
      def st(side: Map[Long, String], id: Long) =
        (base.get(id), side.get(id)) match {
          case (None, None)       => "absent"
          case (None, Some(_))    => "added"
          case (Some(_), None)    => "removed"
          case (Some(x), Some(y)) => if (x == y) "unchanged" else "changed"
        }
      val rc = Set("removed", "changed")
      val want = (base.keySet ++ ours.keySet ++ theirs.keySet).map { id =>
        val (os, ts) = (st(ours, id), st(theirs, id))
        val (fo, ft) = (ours.get(id), theirs.get(id))
        val merged = (os, ts) match {
          case ("unchanged", "unchanged")                => "base"
          case ("removed", "removed")                    => "deleted"
          case (a, b) if rc(a) && rc(b) && fo != ft      => "conflict"
          case ("changed", "changed")                    => "both"
          case ("removed", _)                            => "deleted"
          case ("changed", _)                            => "ours"
          case (_, "removed")                            => "deleted"
          case (_, "changed")                            => "theirs"
          case ("added", "added") =>
            if (fo == ft) "both" else "conflict"
          case ("added", _)                              => "ours"
          case _                                         => "theirs"
        }
        val fp = merged match {
          case "base"           => base.get(id)
          case "ours" | "both"  => fo
          case "theirs"         => ft
          case _                => None
        }
        id -> ((os, ts, merged, fp.map(md5s)))
      }.toMap
      def df(m: Map[Long, String]) = m.toSeq.toDF("doc_id", "text")
      val got = CorpusQueries.threeWayMerge(df(base), df(ours), df(theirs))
        .collect().map(r => r.getLong(0) -> ((r.getString(1),
          r.getString(2), r.getString(3), Option(r.getString(4))))).toMap
      assert(got == want, s"trial $trial: first diff " +
        (got.toSet diff want.toSet).take(3))
    }
  }

  test("scoreTertiles invariants on random grouped scores: ordered buckets, tie closure, rank floors") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      implicit val scope: graft.ops.CacheScope = graft.ops.CacheScope.session
      val rows = for {
        g <- Seq("a", "b", "c")
        i <- 1 to (1 + rnd.nextInt(30))
      } yield (g, rnd.nextInt(8).toLong, s"$g$i$trial")
      val out = graft.ops.QualityOps
        .scoreTertiles(rows.toDF("g", "score", "id"), "score", "g")
        .select("g", "score", "bucket").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val mine = out.filter(_._1 == g)
        assert(mine.length == grp.length) // partition: every row bucketed
        def scores(b: String) = mine.filter(_._3 == b).map(_._2)
        val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
        // ordered with STRICT gaps (tie closure: equal scores share a
        // bucket, so bucket boundaries never split a score)
        if (h.nonEmpty && m.nonEmpty) assert(h.min > m.max, s"$g: $mine")
        if (m.nonEmpty && t.nonEmpty) assert(m.min > t.max, s"$g: $mine")
        if (h.nonEmpty && t.nonEmpty) assert(h.min > t.max, s"$g: $mine")
        // rank floors: head covers at least max(1, tot/3) rows, and
        // dropping its lowest score run would fall below the floor
        val tot = grp.length.toLong
        val r1 = math.max(1L, tot / 3)
        val r2 = math.max(1L, tot * 2 / 3)
        assert(h.length >= r1, s"$g head floor: $mine")
        assert(h.length - h.count(_ == h.min) < r1, s"$g head minimal")
        assert(h.length + m.length >= r2, s"$g h+m floor")
        val hm = h ++ m
        assert(hm.length - hm.count(_ == hm.min) < r2, s"$g h+m minimal")
      }
    }
  }
}
