package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library re-expressing the reference's dbt macros and
  * pandas row functions as pure `Column => Column` transforms (SURVEY §2.8,
  * §2.10 F1/F2). All codegen-friendly built-ins — no UDFs, no custom
  * Catalyst expressions needed for parity.
  */
object EmFunctions {

  /** Federal fiscal year: Oct–Dec belong to the NEXT fiscal year.
    * Reference: macros/get_federal_fiscal_year.sql:2-7. */
  def federalFiscalYear(d: Column): Column =
    when(month(d) >= 10, year(d) + 1).otherwise(year(d))

  /** Meteorological season bucketing.
    * Reference: models/marts/emergency_events.sql:104-109. */
  def season(d: Column): Column =
    when(month(d).isin(12, 1, 2), "WINTER")
      .when(month(d).isin(3, 4, 5), "SPRING")
      .when(month(d).isin(6, 7, 8), "SUMMER")
      .otherwise("FALL")

  /** Privacy banding: round aggregates to coarser bands as magnitude grows
    * (-3/-4/-5 digits). Reference: models/public/public_agricultural_data.sql
    * rounding block (public_disasters.sql:292-306 in SURVEY numbering). */
  def privacyRound(x: Column): Column =
    when(abs(x) >= 10000000, round(x, -5))
      .when(abs(x) >= 1000000, round(x, -4))
      .otherwise(round(x, -3))

  /** Mask all but the first two characters: AB****.
    * Reference: macros/federal_compliance.sql:15-25. */
  def maskSensitive(c: Column): Column =
    concat(substring(c, 1, 2), repeat(lit("*"), greatest(length(c) - 2, lit(0))))

  /** Deterministic surrogate id over business-key columns.
    * Reference: models/marts/disaster_analytics.sql:81, weather_impacts.sql:94. */
  def surrogateId(cols: Column*): Column = md5(concat_ws("|", cols: _*))

  /** Division guarded against zero denominators (NULLIF idiom).
    * Reference: tests/data_quality_tests.yml:265. */
  def safeRatio(num: Column, den: Column): Column =
    when(den === 0 || den.isNull, lit(null)).otherwise(num / den)

  /** Clip a value into [lo, hi] (pandas clip / z-score clamp).
    * Reference: assets/ml_assets.py:363-376. */
  def clip(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** Emergency-alert priority 1 (highest) .. 4: risk×urgency matrix with
    * population and certainty escalation.
    * Reference: macros/generate_emergency_alert_priority.sql:2-20. */
  def alertPriority(riskLevel: Column, urgency: Column, certainty: Column,
      populationAffected: Column): Column =
    when(riskLevel === "CRITICAL" && urgency === "IMMEDIATE", 1)
      .when(riskLevel === "HIGH" && urgency.isin("IMMEDIATE", "EXPECTED"), 2)
      .when(riskLevel === "CRITICAL" && urgency === "EXPECTED", 2)
      .when(riskLevel === "MEDIUM" && urgency === "IMMEDIATE", 3)
      .when(riskLevel === "HIGH" && urgency === "FUTURE", 3)
      .when(populationAffected.isNotNull && populationAffected > 500000, 1)
      .when(populationAffected.isNotNull && populationAffected > 100000, 2)
      .when(certainty === "OBSERVED",
        least(coalesce(when(riskLevel === "CRITICAL", 1).when(riskLevel === "HIGH", 2).otherwise(3), lit(3)), lit(2)))
      .otherwise(4)

  /** Priority rank for severity-ordered serving views.
    * Reference: ops/public_ops.py:108-115 (CASE severity ... END). */
  def priorityRank(severity: Column, order: Seq[String]): Column =
    order.zipWithIndex.foldLeft(lit(order.length + 1)) { case (acc, (s, i)) =>
      when(severity === s, i + 1).otherwise(acc)
    }

  /** Exact-sum of a double column as a fixed-scale decimal: deterministic
    * (order-independent) across engines, unlike summing IEEE doubles. Used
    * by every oracle-checked aggregate in graft.queries. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)"))

  /** Deterministic average: exact decimal sum cast to double, divided by
    * count — bit-identical in Spark and DuckDB regardless of row order. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale).cast("double") / count(c)
}
