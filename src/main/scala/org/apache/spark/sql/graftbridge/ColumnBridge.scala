package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x removed `Column.expr` / `new Column(Expression)` from the public
  * API; the sanctioned internal seam is `classic.ExpressionUtils`, which is
  * `private[sql]`. This bridge lives inside the `org.apache.spark.sql`
  * namespace solely to re-export the conversions our custom Catalyst
  * expressions need. The package holds exactly two seams — this one and
  * [[DataFrameBridge]] (`internalCreateDataFrame`); nothing else may go
  * in it.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** SQL renderings of every equality in `c`'s COLUMN-NODE tree whose two
    * sides are node-identical — the exact shape `Column.===`/`<=>` logs a
    * "Constructing trivially true equals predicate" WARN for. The bridged
    * Catalyst expression is a lazy leaf pre-analysis, so a Catalyst tree
    * walk cannot see these; only the column-node walk can (test seam for
    * the WARN-storm guard in graft.sinks.ImmutableContract).
    */
  def trivialEqualities(c: Column): Seq[String] = c.node.collect {
    case f: org.apache.spark.sql.internal.UnresolvedFunction
      if Seq("<=>", "=", "==").contains(f.functionName) &&
        f.arguments.size == 2 &&
        f.arguments(0).normalized == f.arguments(1).normalized => f.sql
  }
}
