package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the canonical "latest/top-k per key" SQL
  * pattern
  *
  * {{{
  *   Filter(row_number_attr <= k)
  *     +- Window [row_number() over (partition by g order by o) AS rn]
  * }}}
  *
  * into [[TopKPerGroupNode]], so the standard DataFrame/SQL
  * formulation gets the bounded-heap physical plan (partial heaps
  * before the shuffle, k-row sorts after) instead of WindowExec's
  * full per-group sort. Users keep writing the idiomatic window
  * query — the engine picks the plan Spark's own
  * `InferWindowGroupLimit` only approximates (it still sorts and
  * runs WindowExec; this replaces both).
  *
  * Soundness constraints (rewrite fires only when ALL hold):
  *  - the window computes exactly one expression, and it is
  *    `row_number()` — rank()/dense_rank() admit >k rows under ties
  *    and keep different numbers, so they are left alone;
  *  - the filter condition is a sole comparison of that attribute
  *    against an integer literal (`rn <= k`, `rn < k`, `rn = 1`,
  *    literal-first forms included) — conjunctions stay on a Filter
  *    above the rewritten node only when the rank bound can be
  *    split out;
  *  - the partition spec is non-empty (a global top-k is already
  *    planned optimally as TakeOrderedAndProject by Spark itself);
  *  - k is positive and at most [[RankLimitRewrite.MaxK]] — the heap
  *    is per (group, task) in memory, so an unbounded k must not
  *    silently buffer the world.
  *
  * The rewritten node reuses the row_number alias's exprId and
  * IntegerType, so downstream references to `rn` (projects, sorts,
  * further filters) resolve unchanged.
  *
  * Spark 4 may have already pushed a `WindowGroupLimit` below the
  * Window by the time user rules run; it is a pure row-reducer with
  * the same semantics, so the rewrite strips it.
  */
object RankLimitRewrite extends Rule[LogicalPlan] {

  /** Above this the per-group heap stops being "bounded" in any
    * useful sense — leave the sort-based plan in place.
    */
  val MaxK = 4096

  /** rn-bound extractor: Some(k) when `cond` constrains `rn` to the
    * first k rows, for the comparison shapes row_number queries use.
    */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rn) => lit(l).filter(_ == 1)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rn) => lit(l).filter(_ == 1)
      case _ => None
    }
  }

  /** WindowGroupLimit (when Spark's InferWindowGroupLimit already
    * ran) only drops rows past the limit — transparent to us.
    */
  private def stripGroupLimit(plan: LogicalPlan): LogicalPlan = plan match {
    case wgl: WindowGroupLimit => wgl.child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case f @ Filter(cond, w: Window) =>
        w.windowExpressions match {
          case Seq(alias @ Alias(WindowExpression(RowNumber(), _), _))
              if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
            rankBound(cond, alias.toAttribute) match {
              case Some(k) if k > 0 && k <= MaxK =>
                TopKPerGroupNode(
                  w.partitionSpec, w.orderSpec, k,
                  alias.toAttribute.asInstanceOf[AttributeReference],
                  stripGroupLimit(w.child))
              case _ => f
            }
          case _ => f
        }
    }
}
