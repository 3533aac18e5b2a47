package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite an inequality temporal join
  *
  *   `L JOIN R ON abs(secL - secR) <= gap [AND residual…]`
  *
  * (which Spark can only plan as a broadcast-nested-loop / cartesian scan —
  * O(|L|·|R|) comparisons) into the banded equi-join
  * [[graft.operators.TemporalJoins.rangeSelfJoin]] uses explicitly: the
  * left side explodes to its gap-wide time cell and both neighbors, the
  * right side computes its own cell, and the planner gets a plain shuffled
  * equi-join on the cell (O(|L|+|R|) shuffle). Any pair within `gap` differs
  * by at most one cell, and the three probe values are distinct while the
  * right cell is single-valued, so each qualifying pair matches exactly
  * once — the original predicate is kept as the residual filter, making the
  * rewrite result-identical.
  *
  * Scope (deliberately narrow): INNER joins whose condition has NO
  * cross-side equality — if an equi key exists the planner already has a
  * hash/sort-merge join and we don't second-guess it. The rewritten join
  * gains a cross-side equality (probe = cell), which also makes the rule
  * self-terminating under the optimizer's fixed-point loop.
  *
  * This is tier (c) of the custom-operator preference order (SURVEY §7.4):
  * a `Rule[LogicalPlan]` injected via `GraftExtensions`, used exactly where
  * built-in planning genuinely cannot produce a scalable plan.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val ProbeName = "_graft_range_probe"
  private val CellName = "_graft_range_cell"

  private def gapOf(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case _ => None
  }

  /** (leftSeconds, rightSeconds) when a references one side only and b the
    * other, in either order (abs is symmetric). */
  private def sides(a: Expression, b: Expression,
                    left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression)] =
    if (a.references.nonEmpty && b.references.nonEmpty &&
        a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) Some((a, b))
    else if (a.references.nonEmpty && b.references.nonEmpty &&
             b.references.subsetOf(left.outputSet) &&
             a.references.subsetOf(right.outputSet)) Some((b, a))
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !left.output.exists(_.name == ProbeName) =>
      val preds = splitConjunctivePredicates(cond)
      val hasCrossEqui = preds.exists {
        case EqualTo(a, b) => sides(a, b, left, right).isDefined
        case EqualNullSafe(a, b) => sides(a, b, left, right).isDefined
        case _ => false
      }
      val range = preds.iterator.map {
        case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(g, _)) =>
          gapOf(g).filter(_ > 0).flatMap(gap =>
            sides(a, b, left, right).map { case (l, r) => (l, r, gap) })
        case GreaterThanOrEqual(Literal(g, _), Abs(Subtract(a, b, _), _)) =>
          gapOf(g).filter(_ > 0).flatMap(gap =>
            sides(a, b, left, right).map { case (l, r) => (l, r, gap) })
        case _ => None
      }.collectFirst { case Some(m) => m }

      range match {
        case Some((lSec, rSec, gap)) if !hasCrossEqui =>
          val gapLit = Literal(gap.toDouble)
          def cellOf(e: Expression): Expression =
            Cast(Floor(Divide(Cast(e, DoubleType), gapLit)), LongType)
          val lCell = cellOf(lSec)
          val probe = AttributeReference(ProbeName, LongType)()
          val exploded = Generate(
            Explode(CreateArray(Seq(
              Subtract(lCell, Literal(1L)), lCell, Add(lCell, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(probe), child = left)
          val cellAlias = Alias(cellOf(rSec), CellName)()
          val rightProj = Project(right.output :+ cellAlias, right)
          val newJoin = Join(exploded, rightProj, Inner,
            Some(And(EqualTo(probe, cellAlias.toAttribute), cond)), hint)
          Project(left.output ++ right.output, newJoin)
        case _ => j
      }
  }
}
