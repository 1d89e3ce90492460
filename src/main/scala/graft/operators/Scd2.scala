package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 timestamp-strategy snapshots over parquet — dbt snapshot semantics
  * (reference: snapshots/disaster_declarations_snapshot.sql:2-37,
  * invalidate_hard_deletes=True) without a MERGE-capable table format.
  *
  * History table columns: business columns + `valid_from`, `valid_to`
  * (null = open), `is_current`. The merge is a deterministic full-outer
  * reconciliation of current-open rows vs the incoming batch, suitable for
  * partition-overwrite rewrite; idempotent when re-run with the same batch.
  */
object Scd2 {

  /** Initialize a history table from a first batch. */
  def init(batch: DataFrame, updatedAt: String): DataFrame =
    batch
      .withColumn("valid_from", col(updatedAt))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))

  /** Merge an incoming batch into an existing SCD2 history.
    *
    * - changed rows (same key, newer updatedAt): old open row closes at the
    *   new row's updatedAt; a new open row is appended
    * - new keys: appended open
    * - keys absent from the batch: closed at `deleteTs` when
    *   `invalidateHardDeletes` (dbt's invalidate_hard_deletes=True)
    * - already-closed history rows pass through untouched
    */
  def merge(
      history: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      updatedAt: String,
      invalidateHardDeletes: Boolean = false,
      deleteTs: Option[java.sql.Timestamp] = None
  ): DataFrame = {
    val bizCols = history.columns.filterNot(Seq("valid_from", "valid_to", "is_current").contains)

    // latest record per key within the batch (idempotent re-ingest, S15)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(updatedAt).desc)
    val latest = batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")

    val closed = history.filter(!col("is_current"))
    val open = history.filter(col("is_current"))

    val joined = open
      .as("o")
      .join(latest.as("n"), keys, "full_outer")

    // with a using-columns join the key columns are coalesced; detect side
    // presence via the (never-null) updatedAt column of each side
    val hasOld = col(s"o.$updatedAt").isNotNull
    val changed = col(s"n.$updatedAt").isNotNull && hasOld && col(s"n.$updatedAt") > col(s"o.$updatedAt")

    // open rows that stay open (unchanged, or no newer version)
    val stillOpen = joined
      .filter(hasOld && (col(s"n.$updatedAt").isNull || col(s"n.$updatedAt") <= col(s"o.$updatedAt")))
      .select(keys.map(col) ++ bizCols.filterNot(keys.contains).map(c => col(s"o.$c")) :+
        col("o.valid_from") :+ col("o.valid_to") :+ col("o.is_current"): _*)

    // open rows superseded by the batch -> closed
    val nowClosed = joined
      .filter(changed)
      .select(keys.map(col) ++ bizCols.filterNot(keys.contains).map(c => col(s"o.$c")) :+
        col("o.valid_from") :+ col(s"n.$updatedAt").as("valid_to") :+ lit(false).as("is_current"): _*)

    // hard deletes: open rows whose key vanished from the batch
    val hardClosed =
      if (!invalidateHardDeletes) open.limit(0)
      else {
        val del = open.join(latest.select(keys.map(col): _*), keys, "left_anti")
        del.withColumn("valid_to", lit(deleteTs.orNull).cast("timestamp"))
          .withColumn("is_current", lit(false))
      }
    val openKept = if (invalidateHardDeletes) stillOpen.join(latest.select(keys.map(col): _*), keys, "left_semi") else stillOpen

    // new versions and brand-new keys -> open rows
    val newOpen = joined
      .filter(changed || !hasOld)
      .select(keys.map(col) ++ bizCols.filterNot(keys.contains).map(c => col(s"n.$c")) :+
        col(s"n.$updatedAt").as("valid_from") :+ lit(null).cast("timestamp").as("valid_to") :+ lit(true).as("is_current"): _*)

    closed
      .unionByName(openKept)
      .unionByName(nowClosed)
      .unionByName(hardClosed)
      .unionByName(newOpen)
  }
}
