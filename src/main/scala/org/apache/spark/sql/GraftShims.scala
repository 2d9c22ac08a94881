package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `org.apache.spark.sql` package-private API so graft can
  * expose custom Catalyst Expressions as user-facing Columns (Spark 4's
  * public Column ctor takes ColumnNode, not Expression).
  */
object GraftShims {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
