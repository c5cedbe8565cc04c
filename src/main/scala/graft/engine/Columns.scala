package graft.engine

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and custom Catalyst
  * expressions (Spark 4 removed the public `new Column(expr)`
  * constructor; delegated through [[org.apache.spark.sql.GraftBridge]]
  * to the `private[sql]` classic.ExpressionUtils seam). */
object Columns {
  def ofExpr(e: Expression): Column = GraftBridge.ofExpr(e)
  def exprOf(c: Column): Expression = GraftBridge.exprOf(c)
}
