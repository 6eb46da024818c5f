package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into `Dataset.ofRows`, which is `private[sql]` — the one hop a
  * third-party logical operator needs to hand its plan back to the
  * public Dataset API. Living under `org.apache.spark.sql` for exactly
  * that access is the established extension-library pattern; nothing
  * else in the engine reaches into Spark internals this way.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
