package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Expression↔Column conversions (Spark 4
  * wraps Columns in ColumnNodes; `classic.ExpressionUtils` is the
  * sanctioned converter but package-private). Needed to expose custom
  * Catalyst expressions (graft.functions.FloatVecDot) as user Columns. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
