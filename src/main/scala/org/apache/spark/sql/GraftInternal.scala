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
}
