package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge (the ListenerDrain shim
  * pattern, applied to `private[sql]` column construction). Needed by
  * the broadcast-backed ANN kernels: an Expression that carries a
  * `Broadcast` handle cannot be built through the FunctionRegistry
  * (builders only receive child Expressions, and a broadcast is not
  * one), so library code must wrap the constructed Expression into a
  * Column directly. Spark 4 moved that constructor behind
  * `private[sql] ExpressionUtils.column`; this accessor lives under
  * `org.apache.spark.sql` to reach it — the standard workaround, same
  * as every Spark-native extension library uses.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
