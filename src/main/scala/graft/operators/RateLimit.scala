package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tiered hourly rate limiting over the usage log — the reference's
  * limiter (utils/usage_tracking.py:58-116, tiers public_resources.py:
  * 199-204) as a window computation: each request is ranked within its
  * org's trailing hour; requests past the tier quota are flagged denied.
  * Batch-auditable (who WOULD have been throttled) and usable in
  * foreachBatch for live gating.
  */
object RateLimit {

  /** Reference tier quotas, queries/hour. */
  val TierLimits: Map[String, Int] = Map(
    "government" -> 10000,
    "academic" -> 5000,
    "commercial" -> 2000,
    "public" -> 1000
  )

  def tierLimit(tierCol: Column): Column =
    TierLimits.foldLeft(lit(1000)) { case (acc, (tier, limit)) =>
      when(tierCol === tier, limit).otherwise(acc)
    }

  /** Flag every request with its trailing-hour position and allowed/denied
    * under the org's tier quota. RANGE frame over epoch seconds — same
    * shape as W3, fully distributed. */
  def evaluate(usageLog: DataFrame, orgCol: String, tierCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(orgCol)
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-3599L, 0L)
    usageLog
      .withColumn("requests_last_hour", count(lit(1)).over(w))
      .withColumn("hourly_limit", tierLimit(col(tierCol)))
      .withColumn("allowed", col("requests_last_hour") <= col("hourly_limit"))
  }
}
