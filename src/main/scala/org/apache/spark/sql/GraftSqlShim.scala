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

  /** A forked session sharing the SparkContext and a COPY of the
    * parent's session state (confs, temp views, extensions) — conf
    * writes on the fork never touch the parent. The isolation doorway
    * for builders that must plan under temporary conf overrides
    * (runtime-filter gates, broadcast thresholds) without leaking them
    * to queries planned concurrently on the shared session. */
  def forkSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
