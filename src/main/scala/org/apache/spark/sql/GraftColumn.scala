package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Expression↔Column conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 wraps
  * Column around ColumnNode; this is the supported classic-mode hook
  * for exposing custom Catalyst expressions as user-facing Columns.
  */
object GraftColumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eagerly convert a Column to its catalyst Expression.
    * `ExpressionUtils.expression` returns a LAZY `ColumnNodeExpression`
    * wrapper holding non-serializable column-node internals — fine
    * inside the analyzer, poison inside an exec-node closure — so
    * custom plans must convert through the classic converter. */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a custom LogicalPlan as a DataFrame (classic-mode
    * `Dataset.ofRows`, which is `private[sql]`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
