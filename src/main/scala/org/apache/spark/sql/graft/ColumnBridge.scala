package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression converters
  * (Spark 4 removed the public `new Column(expr)` / `col.expr` surface;
  * `classic.ExpressionUtils` is `private[sql]`). Lives in the
  * `org.apache.spark.sql` namespace solely to re-export those two
  * functions to the graft custom-expression layer. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
