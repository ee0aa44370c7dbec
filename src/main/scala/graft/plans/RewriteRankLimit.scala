package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference,
  EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber,
  WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the classic group-limit pattern
  *
  *   Project(out, Filter(rn <= k, Window([row_number() AS rn], part, ord)))
  *
  * where `out` discards rn, rewrites to the TopKPerKey heap operator —
  * so EVERY "top k per key via row_number" query in the engine gets the
  * sort-free plan automatically, not just callers of the GroupLimits API.
  * (Spark's own InferWindowGroupLimit prunes rows map-side for this
  * pattern but still runs the Sort + Window afterwards; this rewrite
  * removes them entirely. It runs in the user-rule slot of operator
  * optimization, before InferWindowGroupLimit would fire.)
  *
  * Rewrite conditions (all must hold — the rewrite must be invisible):
  *  - the Window computes EXACTLY ONE expression and it is row_number()
  *    (rank/dense_rank admit ties and have different >k semantics);
  *  - the filter is rn <= k, rn < k+1, or rn = 1 over THAT rn attribute
  *    only, with a positive literal k;
  *  - the enclosing Project does not reference rn (otherwise the rank
  *    must be materialized, which the heap operator does not produce);
  *  - the partition spec is non-empty (an empty spec is a global top-k —
  *    TakeOrderedAndProject territory, and ClusteredDistribution(Nil) is
  *    not a thing).
  *
  * Tie caveat, identical to row_number itself: under a non-total order
  * row_number picks an arbitrary tie winner, and so does the heap — any
  * valid row_number assignment is a valid result. Queries that need
  * determinism already use total orders.
  */
object RewriteRankLimit extends Rule[LogicalPlan] {

  /** rn-filter condition -> k. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    // k > MinValue: `rn < Int.MinValue` is constant-false and k-1 would wrap
    // to MaxValue, turning an empty result into an all-rows-per-key rewrite.
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) && k > Int.MinValue => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: AttributeReference) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  /** The single-row_number Window -> (rn attribute, part, order). */
  private def rowNumberWindow(w: Window): Option[Attribute] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some(a.toAttribute)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(out, Filter(cond, w: Window))
        if w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.deterministic) =>
      (for {
        rn <- rowNumberWindow(w)
        k <- limitOf(cond, rn) if k > 0
        if !out.exists(_.references.contains(rn))
      } yield Project(out, TopKPerKey(w.partitionSpec, w.orderSpec, k, w.child)))
        .getOrElse(p)
  }
}
