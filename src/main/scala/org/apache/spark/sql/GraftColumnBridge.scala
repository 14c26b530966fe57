package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge for graft's native expressions.
  * `ExpressionUtils` is `private[sql]`, so the (standard) extension
  * pattern is a one-object shim inside the sql package — the only
  * non-`graft` package in this repo, kept to these two forwarders.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
