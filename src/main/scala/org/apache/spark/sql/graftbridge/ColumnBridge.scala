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

/** Handle to the persisted RDD backing a `localCheckpoint`ed Dataset, so
  * iterative operators (graft.operators.Graph) can release intermediate
  * checkpoints deterministically instead of waiting for the
  * ContextCleaner to notice the Dataset was garbage collected. Returns
  * None for non-checkpointed plans — callers must then skip the
  * unpersist (never unpersist blindly: a locally-checkpointed RDD has a
  * truncated lineage and cannot be recomputed once its blocks are gone).
  */
object CheckpointBridge {
  import org.apache.spark.rdd.RDD
  import org.apache.spark.sql.classic.Dataset
  import org.apache.spark.sql.execution.LogicalRDD

  def backingRdd(df: org.apache.spark.sql.DataFrame): Option[RDD[_]] =
    df match {
      case ds: Dataset[_] => ds.queryExecution.analyzed match {
        case l: LogicalRDD => Some(l.rdd)
        case _ => None
      }
      case _ => None
    }
}
