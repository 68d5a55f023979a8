package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` converters, the standard pattern
  * for extension libraries on Spark 4.x (the Column↔Expression helpers
  * moved behind `org.apache.spark.sql.classic` with sql-private access).
  * Nothing else in this repo lives outside the `graft` namespace.
  */
object GraftSqlBridge {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst Expression behind a Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
