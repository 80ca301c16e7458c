package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression
  * conversion (Spark 4 wraps Column around ColumnNode; classic
  * ExpressionUtils does the lowering). Standard extension-library
  * pattern: a tiny shim inside the org.apache.spark.sql package tree.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager lowering: converts the Column's node tree to a concrete
    * Catalyst expression immediately (function-registry builders must
    * return real expression trees, not the lazy ColumnNodeExpression
    * placeholder, which is Unevaluable).
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
