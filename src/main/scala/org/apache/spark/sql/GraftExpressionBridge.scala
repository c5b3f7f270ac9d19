package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Library shim: Column ⇄ Expression for embedding native Catalyst
  * expressions from graft. The converter lives behind `private[sql]`
  * in Spark 4, so the forwarder sits in the sql package — the
  * established pattern for Spark-extension libraries.
  */
object GraftExpressionBridge {
  def toExpr(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
