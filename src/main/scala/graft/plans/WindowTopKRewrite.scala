package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the `row_number()/rank() OVER (PARTITION BY g
  * ORDER BY s1, s2, …) <= k` + drop-the-rank idiom into the native
  * [[GroupTopKPlan]] bounded-heap operator — the third tier of the
  * engine's Catalyst extension stack (Expressions → planner Strategy →
  * optimizer Rule).
  *
  * Spark's own `InferWindowGroupLimit` inserts a pre-window group limit
  * but still RUNS the window (sort per group); this rule REPLACES the
  * window entirely — O(n log k) heap, no sort — which is only sound when
  * the rank column itself is discarded, so the rewrite fires strictly on:
  *
  *  - exactly ONE window expression, a `row_number()` or `rank()` alias
  *    (`row_number` maps to the exact-k heap; `rank` maps to the heap's
  *    WITH-TIES mode, which keeps the boundary cohort — the two window
  *    functions filter EXACTLY those row sets, so each rewrite is
  *    row-identical for any data, ties included);
  *  - a non-empty partition spec (per-group top-k; global top-k already
  *    plans as TakeOrdered elsewhere);
  *  - one or MORE ordering expressions, each NON-NULLABLE
  *    ([[GroupTopKExec]] excludes null keys, the window ranks them —
  *    nullable keys would change results);
  *  - a simple `rn <= k` / `rn < k` / `rn = 1` filter directly above;
  *  - a Project above that does NOT reference the rank attribute.
  *
  * Tie caveat for `row_number` only (also documented on
  * [[GroupTopKPlan]]): a non-total order makes the original window
  * nondeterministic across runs; the rewrite picks an equally valid
  * survivor set. Callers needing exact-row stability append a tiebreaker
  * sort key — multi-key specs rank natively, no key packing — and with a
  * total order the rewrite is row-identical. `rank()` has no such
  * caveat: its survivor set is tie-closed and therefore deterministic.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) && k == 1 => Some(1)
      case EqualTo(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rank) && k == 1 => Some(1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rank) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rank) => Some(k - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case proj @ Project(projList, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 =>
      (w.windowExpressions.head match {
        case al @ Alias(WindowExpression(fn,
            WindowSpecDefinition(part, order, _)), _)
          if part.nonEmpty && order.nonEmpty &&
            order.forall(o => !o.child.nullable) =>
          val withTies = fn match {
            case RowNumber() => Some(false)
            case _: Rank => Some(true)
            case _ => None
          }
          val rank = al.toAttribute
          val usesRank = projList.exists(_.references.contains(rank))
          (withTies, rankLimit(cond, rank)) match {
            case (Some(wt), Some(k)) if k > 0 && !usesRank =>
              Some(Project(projList,
                GroupTopKPlan(part, order, k, wt, w.child)))
            case _ => None
          }
        case _ => None
      }).getOrElse(proj)
  }

  /** Idempotently attach to an existing session's optimizer. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(WindowTopKRewrite))
      spark.experimental.extraOptimizations = cur :+ WindowTopKRewrite
  }
}
