package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql-package-private Column <-> Expression converters
  * (Spark 4 wraps Column around ColumnNode; `ExpressionUtils` is
  * `private[sql]`). Living under `org.apache.spark.sql` is the standard
  * extension-library technique for exposing custom Catalyst expressions
  * as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
