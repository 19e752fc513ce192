package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved `Column` to an expression-free API; converting between
  * `Column` and Catalyst `Expression` (needed to expose custom native
  * expressions as Columns) lives behind `private[sql]` ExpressionUtils.
  * This bridge re-exports the two conversions for graft's custom
  * expressions — the standard extension-point shim for out-of-tree Catalyst
  * expressions on Spark 4.x.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly converts the Column's whole node tree to a Catalyst
    * expression (function registry builders need a real Expression tree
    * — [[expression]]'s lazy ColumnNodeExpression placeholder never gets
    * converted when returned from a registry builder and dies at
    * codegen with INTERNAL_ERROR "Cannot generate code for expression:
    * columnnodeexpression(...)").
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
