package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression converters that
  * Spark 4 moved behind `org.apache.spark.sql.classic`. Extension
  * libraries that build custom Catalyst expressions need exactly these
  * two hops; placing the shim inside the sql package is the standard
  * pattern for SparkSessionExtensions-style code.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a logical plan (classic.Dataset.ofRows is
    * private[sql]); needed to hang a custom FileIndex-backed relation
    * into a session.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def classicSession(spark: SparkSession): classic.SparkSession =
    spark.asInstanceOf[classic.SparkSession]

  /** Catalyst's loss-free implicit-cast test (`Cast.canUpCast`,
    * private[sql] surface area): true when `from` values are always
    * representable in `to` without truncation or null-out.
    */
  def canUpCast(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to)
}
