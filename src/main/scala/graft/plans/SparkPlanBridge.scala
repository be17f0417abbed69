package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows` (private[sql]): build a DataFrame from
  * a LOGICAL PLAN the caller has transformed. Used by GraftSql's
  * strict-JS-nulls mode, which rewrites the analyzed plan's predicate
  * expressions — there is no public API that turns a LogicalPlan back
  * into a DataFrame, and round-tripping through SQL text would lose
  * the transformation.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
