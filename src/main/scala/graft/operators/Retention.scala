package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retention cleanup (SURVEY §2.1 S18): the reference deletes rows older
  * than a per-table policy (90 / 1095 / 2555 days,
  * resources/database.py:211-226, jobs/public_jobs.py:302-357). Over
  * parquet this is filter-and-rewrite; when the table is date-partitioned
  * the filter is a partition predicate, so expired partitions are pruned
  * (dropped) without scanning survivors. Clock is injected for
  * reproducibility.
  */
object Retention {

  final case class Policy(table: String, retentionDays: Int)

  /** Reference policy table (dbt_project.yml:60-65 retention vars). */
  val Policies: Seq[Policy] = Seq(
    Policy("emergency_events", 2555),
    Policy("weather_data", 1095),
    Policy("agricultural_data", 1825),
    Policy("usage_logs", 90)
  )

  def cutoff(asOf: java.sql.Date, retentionDays: Int): Column =
    date_sub(lit(asOf), retentionDays)

  /** Rows surviving the policy; dry-run counterpart of the rewrite. */
  def survivors(df: DataFrame, tsCol: String, asOf: java.sql.Date, retentionDays: Int): DataFrame =
    df.filter(to_date(col(tsCol)) >= cutoff(asOf, retentionDays))

  /** Rows that would be deleted (dry-run report, public_jobs.py:317). */
  def expired(df: DataFrame, tsCol: String, asOf: java.sql.Date, retentionDays: Int): DataFrame =
    df.filter(to_date(col(tsCol)) < cutoff(asOf, retentionDays))
}
