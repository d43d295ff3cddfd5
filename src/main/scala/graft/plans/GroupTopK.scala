package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftInternal, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import scala.collection.mutable

/** Whole-operator custom plan: per-group top-k by a score expression.
  *
  * Spark's built-in shape for this — `row_number() OVER (PARTITION BY g
  * ORDER BY s) <= k` — plans as a full sort of every group's rows
  * (WindowExec requires sorted input): O(n log n) comparisons per
  * partition plus a sort buffer over ALL rows, of which only k per group
  * survive. At 100 TB top-k-per-key (top docs per domain, nearest vectors
  * per query) this is the dominant cost, so it gets the full custom tier:
  * a logical node, a planner [[Strategy]], and a physical operator that
  * keeps one bounded k-heap per group — O(n log k), memory O(groups × k),
  * no sort.
  *
  * The operator declares `ClusteredDistribution(groupCols)` so Catalyst
  * inserts the usual hash shuffle; AQE still sizes it. Determinism: ties
  * on the score are broken by nothing — callers who need a total order
  * must fold a tiebreaker into the score expression (the registered query
  * does). NULL scores are EXCLUDED from ranking (as if filtered with
  * `score IS NOT NULL`) — this deliberately differs from the window
  * row_number shape, which places nulls last and can emit them when a
  * group has fewer than k non-null rows.
  */
case class GroupTopKPlan(
    groupCols: Seq[Expression],
    score: Expression,
    descending: Boolean,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class GroupTopKExec(
    groupCols: Seq[Expression],
    score: Expression,
    descending: Boolean,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  // Rows are filtered, never re-keyed: the child's hash partitioning on
  // the group columns survives. Without this override a downstream
  // operator clustered on the same keys (a window rank over the k
  // survivors, a group-key join) would re-Exchange the already-clustered
  // output.
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val desc = descending
    val groupExprs = groupCols
    val scoreExpr = score
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val boundScore = BindReferences.bindReference(scoreExpr, childOutput)
      val base = TypeUtils.getInterpretedOrdering(boundScore.dataType)
      // heap head = the entry to evict = the WORST of the current top-k
      val evictFirst: Ordering[(Any, UnsafeRow)] =
        if (desc) Ordering.by[(Any, UnsafeRow), Any](_._1)(base).reverse
        else Ordering.by[(Any, UnsafeRow), Any](_._1)(base)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(Any, UnsafeRow)]]
      iter.foreach { row =>
        val s = boundScore.eval(row)
        if (s != null) {
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue.empty[(Any, UnsafeRow)](evictFirst)
              heaps.put(key.copy(), h) // UnsafeProjection reuses its row
              h
          }
          if (heap.size < kLocal) {
            // copy the score too: for non-primitive score types (string,
            // binary, big decimal, array) eval() returns a VIEW into the
            // child's reused UnsafeRow buffer — storing it uncopied lets
            // later rows silently rewrite heap keys
            heap.enqueue((InternalRow.copyValue(s), row.copy().asInstanceOf[UnsafeRow]))
          } else {
            val worst = heap.head._1
            val better = if (desc) base.gt(s, worst) else base.lt(s, worst)
            if (better) {
              heap.dequeue()
              heap.enqueue((InternalRow.copyValue(s), row.copy().asInstanceOf[UnsafeRow]))
            }
          }
        }
      }
      heaps.valuesIterator.flatMap { h =>
        // emit best-first within each group
        val entries: Seq[(Any, UnsafeRow)] = h.dequeueAll
        entries.reverseIterator.map(e => e._2: InternalRow)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans [[GroupTopKPlan]]; a no-op for every other node. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(g, s, d, k, child) =>
      GroupTopKExec(g, s, d, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object GroupTopK {

  /** Idempotently register the strategy with an existing session. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(GroupTopKStrategy))
      spark.experimental.extraStrategies = cur :+ GroupTopKStrategy
  }

  /** Top `k` rows per `groupCols` by `scoreCol`. Fold a tiebreaker into
    * `scoreCol` when a total order is required.
    */
  def apply(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      k: Int, descending: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    GraftInternal.ofRows(spark,
      GroupTopKPlan(groupCols.map(attr), attr(scoreCol), descending, k, analyzed))
  }
}
