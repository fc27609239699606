package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic API's package-private Column ⇄ Expression
  * converters. Extension libraries that ship custom Catalyst expressions
  * conventionally expose these through a same-package shim; the public
  * alternative (registering every expression as a session function and
  * round-tripping through `expr(...)` strings) loses type safety. */
object GraftSqlBridge {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** A DataFrame over a raw (possibly unresolved) logical plan — the
    * rebuild path for [[graft.api.SqlOpaque]] decompile fallbacks. */
  def ofPlan(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
