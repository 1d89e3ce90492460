package graft.core

import org.apache.spark.sql.SparkSession

/** Typed engine configuration mirroring the reference's config surface
  * (config/sources.yml cadence/SLA blocks, quality_rules.yml thresholds,
  * dbt_project.yml retention vars — SURVEY §7.1). Loaded from JSON lines
  * via Spark's own reader (no extra deps in the zero-egress environment);
  * defaults carry the reference's published values.
  */
object EngineConfig {

  final case class SourceConfig(
      name: String,
      freshnessSlaHours: Double,
      retentionDays: Int,
      batchSize: Int,
      keyColumns: Seq[String]
  )

  final case class QualityThresholds(
      completeness: Double,
      accuracy: Double,
      timelinessHours: Double,
      privacyMinGroupSize: Int
  )

  /** Reference defaults: SLAs sensors/data_sensors.py:33-40, retention
    * dbt_project.yml:60-65, batches database.py:87, thresholds
    * dbt_project.yml:71-74, privacy tests/data_quality_tests.yml:337-352. */
  val DefaultSources: Seq[SourceConfig] = Seq(
    SourceConfig("noaa_weather_alerts", 0.25, 1095, 1000, Seq("alert_id")),
    SourceConfig("coagmet_weather_data", 2.0, 1095, 1000, Seq("station_id", "observation_datetime")),
    SourceConfig("fema_disaster_declarations", 4.0, 2555, 1000, Seq("disaster_number")),
    SourceConfig("usda_agricultural_data", 24.0, 1825, 1000, Seq("program_year", "state_code", "county_code", "commodity"))
  )

  val DefaultQuality: QualityThresholds = QualityThresholds(0.95, 0.98, 24.0, 5)

  /** Load source configs from a JSON-lines file:
    * {"name":..., "freshnessSlaHours":..., "retentionDays":..., "batchSize":..., "keyColumns":[...]} */
  def loadSources(spark: SparkSession, path: String): Seq[SourceConfig] = {
    import spark.implicits._
    spark.read.json(path)
      .select("name", "freshnessSlaHours", "retentionDays", "batchSize", "keyColumns")
      .as[(String, Double, Long, Long, Seq[String])]
      .collect()
      .toSeq
      .map { case (n, f, r, b, k) => SourceConfig(n, f, r.toInt, b.toInt, k) }
  }
}
