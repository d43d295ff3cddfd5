package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the `row_number() OVER (PARTITION BY g ORDER
  * BY s) <= k` + drop-the-rank idiom into the native [[GroupTopKPlan]]
  * bounded-heap operator — the third tier of the engine's Catalyst
  * extension stack (Expressions → planner Strategy → optimizer Rule).
  *
  * Spark's own `InferWindowGroupLimit` inserts a pre-window group limit
  * but still RUNS the window (sort per group); this rule REPLACES the
  * window entirely — O(n log k) heap, no sort — which is only sound when
  * the rank column itself is discarded, so the rewrite fires strictly on:
  *
  *  - exactly ONE window expression, a `row_number()` alias;
  *  - a non-empty partition spec (per-group top-k; global top-k already
  *    plans as TakeOrdered elsewhere);
  *  - exactly ONE ordering expression, NON-NULLABLE ([[GroupTopKExec]]
  *    excludes null scores, the window ranks them — nullable scores
  *    would change results);
  *  - a simple `rn <= k` / `rn < k` / `rn = 1` filter directly above;
  *  - a Project above that does NOT reference the rank attribute.
  *
  * Tie caveat (also documented on [[GroupTopKPlan]]): a non-total order
  * makes the original window nondeterministic across runs; the rewrite
  * picks an equally valid survivor set. Callers needing exact-row
  * stability fold a tiebreaker into the sort key — with a total order
  * the rewrite is row-identical.
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
        case al @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, Seq(order), _)), _)
          if part.nonEmpty && !order.child.nullable =>
          val rank = al.toAttribute
          val usesRank = projList.exists(_.references.contains(rank))
          rankLimit(cond, rank) match {
            case Some(k) if k > 0 && !usesRank =>
              Some(Project(projList,
                GroupTopKPlan(part, order.child,
                  order.direction == Descending, k, w.child)))
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
