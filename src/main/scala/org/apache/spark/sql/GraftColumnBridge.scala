package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils) for graft's custom
  * Catalyst expressions — the standard extension-library pattern (the
  * pre-4.0 `new Column(expr)` constructor is gone). */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
