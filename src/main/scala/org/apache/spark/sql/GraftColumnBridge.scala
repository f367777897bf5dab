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

/** Bridge into `private[sql]` Dataset construction for graft's custom
  * [[org.apache.spark.sql.execution.datasources.FileIndex]]-backed
  * relations (the manifest-log snapshot reader) — the same pattern the
  * published lakehouse formats use to plan their scans from their own
  * transaction log instead of directory listings. */
object GraftRelationBridge {
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
