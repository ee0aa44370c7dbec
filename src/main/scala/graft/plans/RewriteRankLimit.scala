package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference,
  EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper,
  Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the classic group-limit pattern
  *
  *   Project(out, Filter(rn <= k [AND residual...], Window([fn() AS rn], part, ord)))
  *
  * where `out` discards rn, rewrites to the TopKPerKey heap operator —
  * so EVERY "top k per key via row_number/rank" query in the engine gets
  * the sort-free plan automatically, not just callers of the GroupLimits
  * API. (Spark's own InferWindowGroupLimit prunes rows map-side for this
  * pattern but still runs the Sort + Window afterwards; this rewrite
  * removes them entirely. It runs in the user-rule slot of operator
  * optimization, before InferWindowGroupLimit would fire.)
  *
  * Rewrite conditions (all must hold — the rewrite must be invisible):
  *  - the Window computes EXACTLY ONE expression and it is row_number()
  *    (heap keeps k) or rank() (heap keeps k + ties of the k-th — that
  *    row set is key-determined, so the rewrite is sound under any
  *    order; dense_rank stays un-rewritten: "k smallest DISTINCT keys"
  *    is a different operator);
  *  - the filter condition, split at ANDs, contains exactly one rn
  *    conjunct of shape rn <= k, rn < k+1, or rn = 1 with positive
  *    literal k; the remaining conjuncts (kept as a residual Filter
  *    above the operator) must not reference rn;
  *  - the enclosing Project does not reference rn (otherwise the rank
  *    must be materialized, which the heap operator does not produce);
  *  - the partition spec is non-empty (an empty spec is a global top-k —
  *    TakeOrderedAndProject territory, and ClusteredDistribution(Nil) is
  *    not a thing).
  *
  * Tie caveat for row_number, identical to row_number itself: under a
  * non-total order it picks an arbitrary tie winner, and so does the
  * heap — any valid row_number assignment is a valid result. rank() has
  * no such arbitrariness and the withTies heap reproduces its set
  * exactly. Queries that need row determinism already use total orders.
  */
object RewriteRankLimit extends Rule[LogicalPlan] with PredicateHelper {

  /** rn-filter conjunct -> k. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    // k > MinValue: `rn < Int.MinValue` is constant-false and k-1 would wrap
    // to MaxValue, turning an empty result into an all-rows-per-key rewrite.
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.semanticEquals(rn) && k > Int.MinValue => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: AttributeReference) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  /** Split an AND tree: exactly one conjunct must be the rank limit; the
    * rest (which may not mention rn) become the residual filter. */
  private def splitRankFilter(cond: Expression, rn: Attribute): Option[(Int, Seq[Expression])] = {
    val (rnPreds, residual) = splitConjunctivePredicates(cond)
      .partition(_.references.contains(rn))
    rnPreds match {
      case Seq(p) => limitOf(p, rn).map(k => (k, residual))
      case _ => None
    }
  }

  /** The single-window-function Window -> (rn attribute, withTies). */
  private def rankedWindow(w: Window): Option[(Attribute, Boolean)] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some((a.toAttribute, false))
    case Seq(a @ Alias(WindowExpression(Rank(_), _), _)) => Some((a.toAttribute, true))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(out, Filter(cond, w: Window))
        if w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.deterministic) =>
      (for {
        (rn, withTies) <- rankedWindow(w)
        (k, residual) <- splitRankFilter(cond, rn) if k > 0
        if !out.exists(_.references.contains(rn))
      } yield {
        val limited = TopKPerKey(w.partitionSpec, w.orderSpec, k, withTies, w.child)
        val filtered = residual.reduceOption(And)
          .map(Filter(_, limited)).getOrElse(limited: LogicalPlan)
        Project(out, filtered)
      }).getOrElse(p)
  }
}
