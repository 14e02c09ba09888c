package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved `Column` to a ColumnNode facade; converting to/from
  * catalyst `Expression` goes through the `private[sql]`
  * `classic.ExpressionUtils`. This bridge (in an `org.apache.spark.sql`
  * subpackage, the standard extension-point technique) is the single
  * place that privilege is used.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
