package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's Column <-> Expression conversions, which are
  * private[sql] in Spark 4 (columns are ColumnNode-based there). Living
  * under org.apache.spark.sql is the standard technique for extension
  * libraries that ship custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
