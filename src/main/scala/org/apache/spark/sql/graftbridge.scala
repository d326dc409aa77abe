package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column<->Expression converters so
  * graft can register custom Catalyst expressions as Columns (the
  * supported spark-internal path, classic.ExpressionUtils, is
  * private[sql] in Spark 4).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
