package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's classic Column↔Expression converters, which are
  * `private[sql]` — the conventional extension-library technique (a
  * same-package accessor) for exposing custom Catalyst expressions as
  * `Column`s without going through the SQL parser.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a composed Column's node tree to a concrete Expression
    * (ExpressionUtils.expression defers behind a ColumnNodeExpression
    * placeholder, which FunctionRegistry builders can't resolve). */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
