package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for Spark 4 (columns are ColumnNode-based in
  * 4.x and the converter lives behind `private[sql]`). Placed inside the
  * org.apache.spark.sql package solely to re-expose the two conversions the
  * engine's custom Catalyst expressions need — the standard pattern for
  * Spark-extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
