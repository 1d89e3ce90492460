package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder: turn an
  * append-only change log into versioned validity intervals — the
  * standard warehouse shape for "what was this entity's state at time t"
  * (Kimball SCD2) and, in a training-data pipeline, for point-in-time
  * correct feature joins (pair with [[AsOfJoin]] to look features up
  * against the interval that was current at label time, preventing
  * temporal leakage).
  *
  * Reference analogue: the upsert/audit layer of the EM pipeline keeps
  * only latest-per-key (`resources/mysql.py` ON DUPLICATE KEY); SCD2 is
  * the history-preserving variant of the same change stream.
  *
  * Scale shape: one hash exchange on the entity key; both window passes
  * (change-point detection, then interval assembly over the much smaller
  * change-point frame) share the same partitioning and ordering, so
  * Catalyst reuses a single sort-exchange. No joins, no driver state.
  * Ties are broken by a caller-named unique column so the history is
  * deterministic under any partitioning.
  */
object Scd {

  /** Collapse a change log (one row per observation) into SCD2 intervals:
    * one row per run of equal `attrCol` per `keyCol`, with
    * `valid_from`/`valid_to` half-open interval bounds (`valid_to` null =
    * current), a 1-based `version` sequence, and an `is_current` flag.
    *
    * @param tieCol unique column ordering simultaneous observations
    */
  def history(df: DataFrame, keyCol: String, tsCol: String, attrCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val changes = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .drop("__prev")
    changes
      .select(
        col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w).as("valid_to"),
        row_number().over(w).cast("long").as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
