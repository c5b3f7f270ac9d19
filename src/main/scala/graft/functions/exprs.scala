package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  * Spark 4's unified Column API hides `.expr`; the forwarder in
  * GraftExpressionBridge reaches the classic converter.
  */
object exprs {
  def toExpr(c: Column): Expression = GraftExpressionBridge.toExpr(c)
  def toColumn(e: Expression): Column = GraftExpressionBridge.toColumn(e)
}
