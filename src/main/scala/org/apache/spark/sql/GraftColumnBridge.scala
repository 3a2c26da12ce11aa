package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Expression <-> Column conversion so the
  * engine can plan its native Catalyst kernels (graft.functions.*) through
  * the public Column API. Classic (non-Connect) sessions only, which is all
  * this engine targets. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
