package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x removed `Column.expr` / `new Column(Expression)` from the public
  * API; the sanctioned internal seam is `classic.ExpressionUtils`, which is
  * `private[sql]`. This one-file bridge lives inside the `org.apache.spark.sql`
  * namespace solely to re-export the two conversions our custom Catalyst
  * expressions need. Nothing else may go in this package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
