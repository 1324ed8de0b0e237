package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Expression↔Column conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 wraps
  * Column around ColumnNode; this is the supported classic-mode hook
  * for exposing custom Catalyst expressions as user-facing Columns.
  */
object GraftColumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
