package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]`, so this one-file shim lives inside the
  * `org.apache.spark.sql` package tree — the standard pattern for Spark
  * extensions that construct custom Catalyst expressions directly.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
