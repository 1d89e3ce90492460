package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Gold/audit sinks (SURVEY §2.1 S16/S17): date-partitioned parquet with
  * sort-on-write clustering, and append-only JSON-lines audit logs.
  */
object Writers {

  /** Date-partitioned parquet table — the physical layout standing in for
    * StarRocks' PARTITION BY RANGE(date) + DISTRIBUTED BY HASH
    * (database.py:140-174). `sortCols` clusters rows within files so
    * min/max page stats act like the reference's secondary indexes
    * (ops/public_ops.py:171-187 → sortWithinPartitions, SURVEY §4). */
  def partitionedParquet(df: DataFrame, path: String, dateCol: String, sortCols: Seq[String]): Unit = {
    val sorted = if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(col): _*) else df
    sorted.write.mode(SaveMode.Overwrite).partitionBy(dateCol).parquet(path)
  }

  /** Append-only JSON-lines audit log, one directory per day (usage
    * tracking / query logs, public_resources.py:290-300). */
  def auditLogAppend(df: DataFrame, path: String, day: String): Unit =
    df.withColumn("log_day", lit(day))
      .write.mode(SaveMode.Append).json(s"$path/day=$day")

  /** data_lineage_audit insert shape
    * (macros/create_data_lineage_record.sql:1-21): one record per
    * transformation run, clock and identity injected (the macro uses
    * CURRENT_TIMESTAMP/CURRENT_USER — nondeterministic server state this
    * engine passes in explicitly). Append with [[auditRecordAppend]]. */
  def dataLineageRecord(
      spark: org.apache.spark.sql.SparkSession,
      sourceTable: String,
      targetTable: String,
      transformationType: String,
      runId: String,
      runTs: java.sql.Timestamp,
      engineVersion: String,
      userName: String,
      complianceFrameworks: Seq[String]
  ): DataFrame = {
    import spark.implicits._
    Seq((sourceTable, targetTable, transformationType, runId, runTs,
      engineVersion, userName, complianceFrameworks.mkString(",")))
      .toDF("source_table", "target_table", "transformation_type", "run_id",
        "transformation_timestamp", "engine_version", "user_name",
        "compliance_frameworks")
  }

  /** federal_compliance_log insert shape
    * (macros/log_federal_compliance_event.sql:2-22): audit event with
    * optional details, frameworks list, environment tag. */
  def federalComplianceEvent(
      spark: org.apache.spark.sql.SparkSession,
      eventType: String,
      tableName: String,
      details: Option[String],
      complianceFrameworks: Seq[String],
      eventTs: java.sql.Timestamp,
      runId: String,
      userName: String,
      environment: String
  ): DataFrame = {
    import spark.implicits._
    Seq((eventType, tableName, details.orNull, complianceFrameworks.mkString(","),
      eventTs, runId, userName, environment))
      .toDF("event_type", "table_name", "event_details", "compliance_frameworks",
        "event_timestamp", "run_id", "user_name", "environment")
  }

  /** Append an audit record frame to its parquet log table (the INSERT of
    * both macros above). Append-only — audit tables are never rewritten. */
  def auditRecordAppend(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Small-file compaction (macros/optimize_starrocks_table.sql parity):
    * rewrite a table directory at a target partition count. Whole-table
    * variant for unpartitioned tables; for date-partitioned tables use
    * [[compactPartitions]], which touches only fragmented partitions.
    *
    * Crash-safe ordering: the rewrite lands in a sibling temp dir, the
    * OLD dir is renamed aside (not deleted), the new dir renamed in, and
    * only then is the old data removed — a crash at any step leaves the
    * table either at `path` or at `path__old`, never gone (a live
    * signature index flows through here via
    * `Dedup.compactSignatureIndex`, so "rm then rename and hope" is not
    * acceptable). Both renames are `require`d: same-filesystem /tmp and
    * table dirs make them atomic; a cross-filesystem misconfiguration
    * fails loudly with the data intact.
    *
    * Re-entry RECOVERS before it cleans: if a previous attempt died in
    * the rename window (`path` moved aside but the new dir not yet
    * renamed in), the data exists ONLY at `path__old` — the leftover
    * sweep must restore it first, or the documented "run it on a cadence
    * without thinking" contract would delete the sole surviving copy and
    * then fail reading the missing `path`. The original is restored (not
    * the possibly-complete temp rewrite): the rewrite is re-derivable,
    * the original is not. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String, targetFiles: Int): Unit = {
    val tmp = new java.io.File(path + "__compact")
    val old = new java.io.File(path + "__old")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    if (!new java.io.File(path).exists() && old.exists()) {
      // previous attempt crashed between rename-aside and rename-in
      require(old.renameTo(new java.io.File(path)),
        s"compaction recovery: could not restore $path from ${old.getPath}")
    }
    rm(tmp); rm(old) // leftovers of a previous crashed attempt
    spark.read.parquet(path).coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    val dir = new java.io.File(path)
    require(dir.renameTo(old), s"compaction: could not move $path aside")
    if (!tmp.renameTo(dir)) {
      // restore the original before failing — the table must stay readable
      old.renameTo(dir): Unit
      throw new IllegalStateException(s"compaction: rename $tmp -> $path failed; original restored")
    }
    rm(old)
  }

  /** Per-partition small-file census of a `partitionBy(dateCol)` parquet
    * table: (partition value, file count, total bytes). Driver-side
    * directory listing — O(|partitions| + |files|) metadata, no data read. */
  def partitionFileStats(path: String, dateCol: String): Seq[(String, Int, Long)] = {
    val root = new java.io.File(path)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$dateCol="))
      .map { p =>
        val files = Option(p.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        (p.getName.stripPrefix(s"$dateCol="), files.length, files.map(_.length).sum)
      }.toSeq.sortBy(_._1)
  }

  /** Selective compaction for a date-partitioned table: rewrite ONLY the
    * partitions holding more than `maxFiles` parquet files (the daily
    * landing partitions a streaming/micro-batch writer fragments), sized
    * to ceil(bytes / targetBytes) output files each. Untouched partitions
    * are not read, not rewritten, and keep their files byte-identical —
    * at 100 TB the difference between this and the whole-table variant is
    * rewriting a day versus rewriting the table. The rewrite goes through
    * a sibling temp dir + atomic rename per partition, so a crashed
    * compaction leaves every partition either old-complete or
    * new-complete, never half. */
  def compactPartitions(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      dateCol: String,
      maxFiles: Int,
      targetBytes: Long = 128L * 1024 * 1024): Seq[String] = {
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit }
    val fragmented = partitionFileStats(path, dateCol).filter(_._2 > maxFiles)
    fragmented.map { case (value, _, bytes) =>
      val partDir = s"$path/$dateCol=$value"
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      val tmp = partDir + "__compact"
      // the partition column is encoded in the directory name, not the
      // files, so a per-partition read/rewrite round-trips exactly
      spark.read.parquet(partDir).coalesce(nOut)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      val dir = new java.io.File(partDir)
      rm(dir)
      val renamed = new java.io.File(tmp).renameTo(dir)
      require(renamed, s"compaction rename failed for $partDir")
      value
    }
  }
}
