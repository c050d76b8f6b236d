package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan-construction API — the standard way
  * for an external library to materialize a DataFrame from a custom
  * LogicalPlan (same technique as public Spark-extension libraries;
  * see SNIPPETS.md [1]/[3] for the pattern in the wild). Kept to the
  * single call the graft plans package needs. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
