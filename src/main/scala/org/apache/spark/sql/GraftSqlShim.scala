package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim for `private[sql]` constructors the public API does not
  * expose: building a DataFrame from a hand-constructed LogicalPlan.
  * Standard pattern for Spark extension libraries that add custom logical
  * operators (the plan node itself lives in `graft.plans`).
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
