package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ⇄ Expression converters —
  * the standard pattern for third-party Catalyst expressions on Spark 4
  * (the classic `new Column(expr)` constructor is no longer public). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
