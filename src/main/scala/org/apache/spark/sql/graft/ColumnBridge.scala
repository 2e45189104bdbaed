package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved the Column API onto ColumnNode, making the
  * Expression-backed constructor `private[sql]`; libraries that ship
  * native Catalyst expressions conventionally bridge it from an
  * `org.apache.spark.sql` subpackage (the same approach used by
  * published Spark extension libraries). This is the only file outside
  * the `graft` namespace, and it contains no logic — just the two
  * visibility-restricted conversions graft's typed Column API needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
