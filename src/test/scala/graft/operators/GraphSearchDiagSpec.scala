package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GraphSearch.serveDiagnostic]]'s pinned semantics on hand frames:
  * the DOC-weighted median (what a random vector experiences, not a
  * random cell), the walk order, and the verdict boundary. */
class GraphSearchDiagSpec extends SparkSpec {
  import spark.implicits._

  private def diag(sizes: Seq[(Long, Int)], kg: Int = 4, beam: Int = 4,
                   hops: Int = 3) = {
    val rows = sizes.flatMap { case (cell, n) => Seq.fill(n)(cell) }
    GraphSearch.serveDiagnostic(rows.toDF("cell"), kg, beam, hops)
      .collect().head
  }

  test("doc-weighted median: one huge cell dominates a host of tiny ones") {
    // 10 cells of 2 docs + 1 cell of 100: the per-CELL median is 2, but
    // half the VECTORS live in the size-100 cell — the diagnostic must
    // report the neighborhood a typical vector experiences
    val r = diag((0L until 10L).map(_ -> 2) :+ (99L, 100))
    assert(r.getAs[Long]("n") == 120)
    assert(r.getAs[Long]("n_cells") == 11)
    assert(r.getAs[Long]("med_sz") == 100)
    assert(r.getAs[String]("verdict") == "dont_serve") // 100 > 52
  }

  test("verdict boundary: med == budget serves; med == budget+1 does not") {
    // budget = 4 + 3·4·4 = 52
    val at = diag(Seq((0L, 52), (1L, 52)))
    assert(at.getAs[Long]("med_sz") == 52)
    assert(at.getAs[String]("verdict") == "serve")
    assert(at.getAs[Long]("ratio_pct") == 100)
    val over = diag(Seq((0L, 53), (1L, 53)))
    assert(over.getAs[String]("verdict") == "dont_serve")
    assert(over.getAs[Long]("ratio_pct") == 98) // floor(5200/53)
  }

  test("walk order pinned by (size ASC, cell ASC); budget tracks params") {
    // cum walk over sizes [1, 3, 4]: half of 8 is reached at the size-3
    // cell (cum 4 ≥ 4)
    val r = diag(Seq((7L, 4), (2L, 1), (5L, 3)), kg = 2, beam = 2, hops = 1)
    assert(r.getAs[Long]("med_sz") == 3)
    assert(r.getAs[Long]("budget") == 2 + 1 * 2 * 2)
    assert(r.getAs[Long]("degree") == 2)
  }
}
