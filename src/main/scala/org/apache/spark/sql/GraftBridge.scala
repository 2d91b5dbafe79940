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
}
