package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Expression↔Column converters — the
  * supported seam for libraries contributing native Catalyst expressions
  * (Spark 4 moved Column onto ColumnNode; classic plans still convert via
  * ExpressionUtils). Lives under org.apache.spark.sql for access. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
