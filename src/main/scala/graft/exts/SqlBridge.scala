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

  /** Alias a column under an EXPLICIT metadata map. Needed where Spark's
    * semantics ride on column metadata (the event-time watermark tag,
    * spark.watermarkDelayMs) but the value expression is derived — a
    * plain Alias only propagates metadata from a bare attribute, so e.g.
    * unix_micros(ts) would silently lose its watermark. */
  def aliasWithMetadata(c: Column, name: String,
      metadata: org.apache.spark.sql.types.Metadata): Column =
    column(catalyst.expressions.Alias(expression(c), name)(
      explicitMetadata = Some(metadata)))

  /** A full copy of the session (conf, temp views, UDFs) sharing the
    * SparkContext — for queries that need a plan-shape conf override
    * (e.g. subset-cluster-key co-partitioning for bucketed joins)
    * without leaking it into the shared session. The conf must still be
    * set when the returned DataFrame is EXECUTED (physical planning is
    * lazy), so a set-then-restore inside the builder can't work; an
    * isolated clone can. */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()
}
