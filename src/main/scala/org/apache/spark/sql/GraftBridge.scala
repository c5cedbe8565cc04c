package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Lives in the org.apache.spark.sql package to reach the
  * `private[sql]` classic.ExpressionUtils seam — Spark 4 removed the
  * public `new Column(expr)` constructor, and this is the supported
  * conversion between Columns and raw Catalyst expressions for
  * libraries that define custom expressions. */
object GraftBridge {
  def ofExpr(e: Expression): Column = classic.ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
