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

  /** Scale-adaptive partition count for frames co-partitioned around an
    * already-materialized checkpoint: the checkpoint's REAL persisted
    * bytes divided by the session's advisory partition size (the same
    * target AQE coalesces toward), clamped to [1, session shuffle
    * partitions]. A tiny frame then runs its whole iterative recurrence
    * in single-wave tasks (what AQE's coalescing achieved per exchange,
    * achieved here once for every downstream stage), while a 100 TB
    * frame saturates the configured parallelism — no constant tuned to
    * either scale. */
  def sizedPartitionsFor(checkpointed: org.apache.spark.sql.DataFrame): Int = {
    val conf = checkpointed.sparkSession.sessionState.conf
    val maxP = conf.numShufflePartitions
    val advisory = math.max(1L,
      conf.getConf(org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val bytes = backingRdd(checkpointed) match {
      case Some(rdd) =>
        checkpointed.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == rdd.id).map(i => i.memSize + i.diskSize).getOrElse(0L)
      case None => 0L
    }
    math.max(1, math.min(maxP.toLong, (bytes + advisory - 1) / advisory)).toInt
  }

  /** Eager `localCheckpoint` that KEEPS a usable hash partitioning.
    *
    * `Dataset.localCheckpoint` wraps the materialized RDD in a
    * `LogicalRDD` whose outputPartitioning is `UnknownPartitioning(0)`
    * under AQE (the adaptive plan's runtime partitioning — possibly
    * coalesced — does not translate to a logical one), so EVERY later
    * join/aggregate on the checkpointed frame pays a fresh Exchange even
    * when the data is already laid out on the key. For an iterative
    * operator that re-joins the same checkpointed frame once per round
    * (graph recurrences), that is one avoidable shuffle of the SAME bytes
    * per round — guide §2.4's "two operations keyed the same way can
    * share one exchange", defeated only by the lost metadata.
    *
    * This helper restores the metadata truthfully: it hash-repartitions
    * `df` into EXACTLY `numPartitions` by `cols` (an explicit
    * numPartitions repartition is never AQE-coalesced — asserted below
    * against the materialized RDD), checkpoints eagerly, and rebuilds the
    * `LogicalRDD` declaring `HashPartitioning(cols, numPartitions)` —
    * which is physically exact: the rows ARE placed by
    * pmod(murmur3(cols), numPartitions), the same function
    * EnsureRequirements assumes. Joins and aggregates keyed on `cols`
    * (with matching partition counts) then skip their Exchange.
    *
    * The declared partitioning is load-bearing for correctness: callers
    * must not re-wrap an RDD that was not produced by this helper's own
    * repartition. PartitionedCheckpointSpec pins rows-equality and the
    * no-exchange plan shape against a misdeclaration canary. */
  def localCheckpointHashPartitioned(
      df: org.apache.spark.sql.DataFrame,
      numPartitions: Int,
      cols: String*): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    require(cols.nonEmpty, "localCheckpointHashPartitioned needs at least one column")
    val cp = df.repartition(numPartitions, cols.map(df(_)): _*).localCheckpoint(true)
    cp match {
      case ds: Dataset[_] => ds.queryExecution.analyzed match {
        case l: LogicalRDD =>
          require(l.rdd.getNumPartitions == numPartitions,
            s"checkpointed RDD has ${l.rdd.getNumPartitions} partitions, expected " +
              s"$numPartitions — explicit repartition(n, cols) must never be coalesced")
          val attrs = cols.map { c =>
            l.output.find(_.name == c).getOrElse(throw new IllegalStateException(
              s"column $c missing from checkpointed output ${l.output.map(_.name)}"))
          }
          val declared = LogicalRDD(
            l.output, l.rdd, HashPartitioning(attrs, numPartitions),
            Nil, l.isStreaming)(
            ds.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
          Dataset.ofRows(
            ds.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession], declared)
        case _ => cp // non-LogicalRDD checkpoint: plain (still correct, just unkeyed)
      }
      case _ => cp
    }
  }
}
