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

  /** Wrap a Catalyst expression as a public Column — the inverse hop of
    * [[ofRows]], needed by expressions whose constructor carries
    * non-Column metadata (e.g. a learned merge table) and therefore
    * cannot come in through the name-based function registry. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  /** The reverse direction: a public Column's underlying expression,
    * for feeding Column-built inputs into such constructors. */
  def expressionOf(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
