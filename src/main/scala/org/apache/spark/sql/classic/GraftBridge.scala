package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to Spark's private[sql] Column ⇄ Expression converters
 * (Spark 4 moved Column onto ColumnNode; `ExpressionUtils` is the
 * supported internal seam). Kept to two forwarding methods so the
 * internal surface we touch stays tiny.
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
