package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters (the
  * standard technique for extension libraries shipping native Catalyst
  * expressions: a shim object inside the org.apache.spark.sql namespace).
  * Only these two calls cross the boundary; everything else in the engine
  * uses public API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
