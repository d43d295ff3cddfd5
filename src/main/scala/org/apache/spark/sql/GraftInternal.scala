package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` plan-to-DataFrame constructor, the
  * standard pattern third-party Spark extensions use to return a DataFrame
  * built around a custom logical node (`Dataset.ofRows` has no public
  * equivalent). Only [[graft.plans]] uses this.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The executed plan's RDD[InternalRow] — the zero-copy view of a
    * DataFrame's output (`Dataset.rdd` would deserialize every row to an
    * external `Row`). `QueryExecution.toRdd` is a lazy val, so two jobs
    * over the same handle reuse one lineage (and its shuffle files). */
  def toInternalRdd(
      df: DataFrame): org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** The `private[sql]` InternalRow-to-DataFrame constructor —
    * `createDataFrame(RDD[Row], schema)` would re-validate and re-encode
    * every row. The scan operator projects each row to unsafe itself, so
    * the RDD may yield reused/wrapped rows (iterator discipline). */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** The pinned RDD behind a `df.localCheckpoint(...)` result: checkpoint
    * returns a Dataset wrapping a `LogicalRDD` over the materialized,
    * persisted RDD. Callers that must RELEASE that storage (per-trigger
    * checkpoint hygiene in [[graft.streaming.StreamingDedup]]) unpersist
    * exactly this RDD — a `getPersistentRDDs` snapshot-diff would also
    * catch (and destroy) checkpoints a CONCURRENT caller created, whose
    * truncated lineage cannot be recomputed. None for a non-checkpointed
    * frame, so a misuse degrades to "not released", never to "released
    * someone else's". */
  def checkpointedRdd(
      df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed match {
      case l: execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Drain the async listener bus (`private[spark]` — stage-completed
    * events are delivered asynchronously), so the per-query
    * shuffle/spill deltas Bench samples attribute to the query that
    * produced them instead of leaking into the next row. Sampling only;
    * never inside a timing window. */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}

/** Bridge into `private[sql]` SparkSessionExtensions builders — used only
  * by GraftExtensionsSpec to verify the plugin-path wiring without
  * constructing a whole new session.
  */
object GraftExtensionsProbe {
  def plannerStrategies(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
  def injectedFunctionNames(ext: SparkSessionExtensions): Seq[String] =
    ext.registerFunctions(
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
      .listFunction().map(_.funcName)
  def optimizerRules(ext: SparkSessionExtensions, spark: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark.asInstanceOf[classic.SparkSession])
}
