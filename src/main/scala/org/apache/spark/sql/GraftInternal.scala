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
