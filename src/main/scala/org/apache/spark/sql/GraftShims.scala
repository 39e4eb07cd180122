package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Access shim for `private[sql]` bridge points (the standard pattern for
  * Spark extension libraries): Spark 4 separates the public Column API
  * from Catalyst expressions behind ColumnNode; these two calls cross
  * that boundary for the classic (non-Connect) backend so graft can use
  * its native expressions from the Column API without requiring
  * `spark.sql.extensions` configuration. */
object GraftShims {
  def columnOf(e: Expression): Column = new Column(ExpressionColumnNode(e))
  def expressionOf(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}
