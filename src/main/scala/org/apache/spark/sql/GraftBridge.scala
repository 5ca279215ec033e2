package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal access bridge for graft's native Catalyst expressions:
  * Column <-> Expression conversion lives behind `private[sql]` in Spark 4
  * (org.apache.spark.sql.classic.ExpressionUtils), so third-party extensions
  * conventionally expose it from a file compiled into the sql package. Only
  * these two conversions are bridged — nothing else internal is touched.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
