package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface: Column <-> Expression conversion for
  * custom Catalyst expressions (Spark 4 moved Column onto ColumnNode; the
  * classic converter lives behind the sql package boundary). This is the
  * standard extension-library pattern — one tiny file inside the package
  * namespace, everything else stays in `graft.*`.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
