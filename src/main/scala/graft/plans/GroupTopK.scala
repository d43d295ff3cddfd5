package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftInternal, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import scala.collection.mutable

/** Whole-operator custom plan: per-group top-k by a sort-key sequence.
  *
  * Spark's built-in shape for this — `row_number() OVER (PARTITION BY g
  * ORDER BY s1, s2, …) <= k` — plans as a full sort of every group's rows
  * (WindowExec requires sorted input): O(n log n) comparisons per
  * partition plus a sort buffer over ALL rows, of which only k per group
  * survive. At 100 TB top-k-per-key (top docs per domain, nearest vectors
  * per query) this is the dominant cost, so it gets the full custom tier:
  * a logical node, a planner [[Strategy]], and a physical operator that
  * keeps one bounded k-heap per group — O(n log k), memory O(groups × k),
  * no sort.
  *
  * `order` is a full multi-expression sort spec with per-key directions —
  * the `ORDER BY score DESC, id ASC` tie-broken idiom ranks natively,
  * no caller-side key packing required.
  *
  * Two rank semantics, selected by `withTies`:
  *  - `withTies = false` (row_number): EXACTLY k rows per group survive.
  *    Ties at the boundary are broken by nothing — callers needing
  *    exact-row stability make the sort spec a total order (append a
  *    unique tiebreaker key); with a total order the result is
  *    row-identical to the window shape.
  *  - `withTies = true` (rank() <= k / SQL `FETCH FIRST k WITH TIES`):
  *    every row tied with the k-th best ALSO survives — exactly the rows
  *    the window `rank() <= k` filter keeps, for any data, ties or not.
  *    The tie cohort is kept in a side buffer whose size is data-bounded
  *    (all rows equal to the current threshold), the same unboundedness
  *    the semantics themselves carry.
  *
  * The operator declares `ClusteredDistribution(groupCols)` so Catalyst
  * inserts the usual hash shuffle; AQE still sizes it. Rows where ANY
  * sort key is NULL are EXCLUDED from ranking (as if pre-filtered with
  * `key IS NOT NULL`) — this deliberately differs from the window shape,
  * which places nulls first/last and can emit them when a group has
  * fewer than k non-null rows; [[WindowTopKRewrite]] therefore only
  * fires on provably non-nullable sort keys.
  */
case class GroupTopKPlan(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    withTies: Boolean,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(order.nonEmpty, "at least one sort key is required")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class GroupTopKExec(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    withTies: Boolean,
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
    val tiesMode = withTies
    val groupExprs = groupCols
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // project the sort keys into their own UnsafeRow once per input
      // row; the comparator then runs over bound slots of that row, so a
      // multi-key compare never re-evaluates expressions
      val boundKeys = orderLocal.map(so =>
        BindReferences.bindReference(so.child, childOutput))
      val sortProj = UnsafeProjection.create(boundKeys)
      val ord: Ordering[InternalRow] = new InterpretedOrdering(
        orderLocal.zip(boundKeys).zipWithIndex.map { case ((so, bk), i) =>
          SortOrder(BoundReference(i, bk.dataType, bk.nullable),
            so.direction, so.nullOrdering, Seq.empty)
        })
      // heap head = the entry to evict = the WORST of the current top-k
      // (InterpretedOrdering ranks "best" smallest; PriorityQueue
      // dequeues greatest)
      val evictFirst: Ordering[(UnsafeRow, UnsafeRow)] =
        Ordering.by[(UnsafeRow, UnsafeRow), InternalRow](_._1)(ord)
      // per-group state: the bounded k-heap plus (rank() mode only) the
      // side buffer of rows tied with the group's CURRENT k-th-best key.
      // Invariant: every buffered entry compares equal to heap.head's
      // key; when the threshold strictly improves the buffer is cleared
      // wholesale.
      final class GroupState {
        val heap = mutable.PriorityQueue.empty[(UnsafeRow, UnsafeRow)](evictFirst)
        var ties: mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)] = _
        def tieBuf: mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)] = {
          if (ties == null) ties = mutable.ArrayBuffer.empty
          ties
        }
      }
      val groups = mutable.HashMap.empty[UnsafeRow, GroupState]
      iter.foreach { row =>
        val sk = sortProj(row)
        if (!sk.anyNull) {
          val key = keyProj(row)
          val st = groups.get(key) match {
            case Some(g) => g
            case None =>
              val g = new GroupState
              groups.put(key.copy(), g) // UnsafeProjection reuses its row
              g
          }
          val heap = st.heap
          if (heap.size < kLocal) {
            // copy both rows: UnsafeProjection reuses its output buffer
            heap.enqueue((sk.copy(), row.copy().asInstanceOf[UnsafeRow]))
          } else {
            val cmp = ord.compare(sk, heap.head._1)
            if (cmp < 0) {
              val evicted = heap.dequeue()
              heap.enqueue((sk.copy(), row.copy().asInstanceOf[UnsafeRow]))
              if (tiesMode) {
                // threshold after the swap: if unchanged (duplicates of
                // the old worst remain in the heap) the evicted row still
                // ties it and joins the cohort; if strictly improved the
                // whole cohort is out of the top-k
                if (ord.compare(evicted._1, heap.head._1) == 0)
                  st.tieBuf += evicted
                else if (st.ties != null) st.ties.clear()
              }
            } else if (cmp == 0 && tiesMode) {
              st.tieBuf += ((sk.copy(), row.copy().asInstanceOf[UnsafeRow]))
            }
          }
        }
      }
      groups.valuesIterator.flatMap { st =>
        // emit best-first within each group, then the boundary tie cohort
        val entries: Seq[(UnsafeRow, UnsafeRow)] = st.heap.dequeueAll
        val ties =
          if (st.ties == null) Iterator.empty else st.ties.iterator
        entries.reverseIterator.map(e => e._2: InternalRow) ++
          ties.map(e => e._2: InternalRow)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans [[GroupTopKPlan]]; a no-op for every other node. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(g, o, k, t, child) =>
      GroupTopKExec(g, o, k, t, planLater(child)) :: Nil
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

  /** Top `k` rows per `groupCols` by the single key `scoreCol`. Fold a
    * tiebreaker into `scoreCol` — or use the multi-key overload — when a
    * total order is required.
    */
  def apply(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      k: Int, descending: Boolean = true): DataFrame =
    apply(df, groupCols,
      Seq(scoreCol -> descending), k, withTies = false)

  /** Top `k` rows per `groupCols` by a multi-key sort spec
    * (`(column, descending)` pairs, compared left to right). With
    * `withTies = true` the boundary cohort survives too — the
    * `rank() <= k` / `FETCH FIRST k WITH TIES` semantics.
    */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      withTies: Boolean): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    GraftInternal.ofRows(spark,
      GroupTopKPlan(groupCols.map(attr), order, k, withTies, analyzed))
  }
}
