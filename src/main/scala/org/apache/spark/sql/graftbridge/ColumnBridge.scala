package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column a thin wrapper over ColumnNode and gated the
  * Expression conversions behind `private[sql]` ExpressionUtils. This
  * bridge (compiled into the sql package namespace) re-exposes the two
  * conversions so graft's custom Catalyst expressions can offer a Column
  * API — the supported extension seam for library-defined expressions.
  */
object ColumnBridge {
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
