package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge. Spark 4 made these conversions
  * `private[sql]` (columns are backend-agnostic nodes now); third-party
  * native expressions reach them from inside the sql package namespace —
  * the standard extension seam, nothing else from the internals is used.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly lower a Column's node tree to catalyst expressions.
    * [[expression]] wraps the column in a lazy `ColumnNodeExpression`
    * leaf, which is fine inside Dataset analysis but opaque to the
    * analyzer when returned from a FunctionRegistry builder (the
    * SQL-function seam): the analyzer never recurses into it and
    * codegen aborts. This converts node-by-node up front — the result
    * is ordinary (possibly unresolved) catalyst nodes the analyzer
    * handles like any parsed SQL. */
  def loweredExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
