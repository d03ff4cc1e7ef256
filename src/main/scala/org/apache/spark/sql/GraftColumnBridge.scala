package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to the package-private Column ⇄ Catalyst Expression
 * conversions (Spark 4 moved Column onto ColumnNode; the classic converters
 * live behind private[sql]). Same technique as public Spark-extension
 * projects use for custom expressions (cf. repo:SNIPPETS.md patterns).
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
