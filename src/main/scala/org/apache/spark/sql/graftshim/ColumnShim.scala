package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 (Column is ColumnNode-backed; the classic
  * converters live in `org.apache.spark.sql.classic.ExpressionUtils`).
  * A custom expression that carries NON-CHILD state — e.g.
  * [[graft.functions.IvfTwoLevelRoute]]'s Broadcast handle — cannot be
  * built through the FunctionRegistry's `Seq[Expression] => Expression`
  * builders (only child expressions pass through SQL), so it needs this
  * direct construction path. The package placement is the access grant —
  * the standard shim shape for Spark extension libraries.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
