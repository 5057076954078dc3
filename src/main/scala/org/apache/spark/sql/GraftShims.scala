package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark 4's private[sql] Column <-> Expression converters,
  * needed to expose custom Catalyst expressions (graft.functions.*) through
  * the public Column API. Nothing else from the internal API is touched.
  */
object GraftShims {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
