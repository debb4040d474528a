package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the
  * bridging now lives in private[sql] classic.ExpressionUtils. This
  * object re-exports the two conversions for graft's custom expressions
  * (placed under org.apache.spark.sql.* for package-private access —
  * the standard technique for Catalyst extensions).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
