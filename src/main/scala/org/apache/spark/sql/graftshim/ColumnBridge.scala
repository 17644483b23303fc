package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 removed `Column.expr` / `new Column(expr)` from the public
  * surface (columns now wrap `ColumnNode`s so they can be shared with
  * Spark Connect). Libraries that register native Catalyst expressions
  * still need the conversion; `o.a.s.sql.classic.ExpressionUtils`
  * provides it but is `private[sql]`, hence this one-file shim living
  * in the spark namespace. Used only by `graft.functions`.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
