package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql] Dataset.ofRows` so the graft library can
  * wrap a custom `LogicalPlan` (graft.plans.AsOfJoinPlan) in a public
  * DataFrame — the standard pattern for Spark extension libraries that
  * add logical operators without forking Spark. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
