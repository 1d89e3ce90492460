package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.em.{Fixtures, Marts, PublicLayer, SeedData, Staging}
import graft.operators.Validation

/** Full EM pipeline on deterministic fixtures, asserting the reference's
  * dbt schema + singular test invariants (SURVEY §5) over our outputs. */
class EmPipelineSpec extends SparkSpecBase {

  private val runTs = Timestamp.valueOf("2024-07-01 12:00:00")
  private val asOf = Date.valueOf("2024-07-01")
  private val asOfDay = 19905L // ~2024-06-30, aligned with fixture windows

  private lazy val fema = Staging.femaDisasters(Fixtures.fema(spark, 300), runTs)
  private lazy val noaa = Staging.noaaWeather(Fixtures.noaa(spark, 200), runTs)
  private lazy val coag = Staging.coagmetData(Fixtures.coagmet(spark, 8, 30, asOfDay), runTs)
  private lazy val usda = Staging.usdaData(Fixtures.usda(spark, 800), runTs)
  private lazy val events = Marts.emergencyEvents(spark, fema, noaa, runTs)

  test("staging: standardization, null gates, audit columns (dbt schema tests)") {
    assert(fema.count() == 300)
    // not_null + unique disaster_number (schema.yml:8-11)
    assert(Validation.duplicates(fema, Seq("disaster_number")).count() == 0)
    assert(fema.filter(col("incident_type") =!= upper(col("incident_type"))).count() == 0)
    // classification enum across staging tables (data_quality_tests.yml:62-89)
    Seq(fema, noaa, coag, usda).foreach { df =>
      assert(df.filter(!col("data_classification")
        .isin("PUBLIC", "INTERNAL", "RESTRICTED", "CONFIDENTIAL")).count() == 0)
      assert(df.filter(col("retention_date").isNull).count() == 0) // retention presence (:91-118)
    }
    // coagmet ranges → NULL not dropped rows (stg_coagmet_data.sql:36-54)
    assert(coag.filter(col("temperature_celsius") < -50 || col("temperature_celsius") > 60).count() == 0)
    // usda loss_ratio recomputation check (data_quality_tests.yml:248-270)
    val badRatio = usda.filter(col("loss_ratio").isNotNull &&
      abs(col("loss_ratio") - col("indemnity_amount_usd") / col("premium_amount_usd")) > 0.01).count()
    assert(badRatio == 0)
  }

  test("noaa geometry struct: typed (type, coordinates) parse; malformed JSON -> null") {
    import spark.implicits._
    val geo = Staging.noaaWeather(Fixtures.noaa(spark, 50), runTs, parseGeometry = true)
    assert(geo.columns.contains("geometry") && geo.columns.contains("geometry_struct"))
    assert(geo.filter(col("geometry_struct.type") =!= "Polygon").count() == 0)
    // every fixture polygon is one closed 4-point ring of (lon, lat) pairs
    val ring = geo.select(
      size(col("geometry_struct.coordinates")).as("n_rings"),
      size(element_at(col("geometry_struct.coordinates"), 1)).as("n_pts"),
      size(element_at(element_at(col("geometry_struct.coordinates"), 1), 1)).as("n_coords"))
    assert(ring.filter(col("n_rings") =!= 1 || col("n_pts") =!= 4 || col("n_coords") =!= 2).count() == 0)
    // malformed geometry parses to an all-null struct rather than failing
    val bad = Fixtures.noaa(spark, 5).withColumn("geometry", lit("not json {"))
    val badParsed = Staging.noaaWeather(bad, runTs, parseGeometry = true)
    assert(badParsed.filter(col("geometry_struct.type").isNotNull ||
      col("geometry_struct.coordinates").isNotNull).count() == 0)
    // default path unchanged: no geometry columns staged
    assert(!noaa.columns.contains("geometry_struct"))
  }

  test("noaa observations: measurement-struct unwrap + unit normalization") {
    import org.apache.spark.sql.Row
    import graft.em.EmSchemas
    // hand-crafted rows with known unit mixes: exact conversions asserted
    def m(v: Any, u: String) = Row(v, u, "qc:V")
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("KDEN", Timestamp.valueOf("2024-06-30 12:00:00"),
          m(77.0, "wmoUnit:degF"),          // 77F = 25C
          m(10.0, "wmoUnit:degC"),
          m(90.0, "wmoUnit:degree_(angle)"),
          m(10.0, "wmoUnit:m_s-1"),         // 10 m/s = 36 km/h
          null,                             // wind_gust: whole struct null
          m(101325.0, "wmoUnit:Pa"),        // 1013.25 hPa
          m(1013.0, "wmoUnit:hPa"),         // already hPa: unchanged
          m(16000.0, "wmoUnit:m"),          // 16 km
          m(30.0, "wmoUnit:degC"),
          m(15.0, "wmoUnit:degC"),
          Row(null, "wmoUnit:mm", "qc:Z"),  // null value inside struct
          null, null,
          m(150.0, "wmoUnit:percent"),      // out of range -> null
          null, null,
          Timestamp.valueOf("2024-06-30 12:05:00"), "NOAA_NWS")
      )), EmSchemas.NoaaObservations)
    val got = Staging.noaaObservations(raw, runTs).collect().head
    def d(n: String): Any = got.get(got.fieldIndex(n))
    assert(d("temperature_celsius") == 25.0)
    assert(d("dewpoint_celsius") == 10.0)
    assert(d("wind_direction_degrees") == 90.0)
    assert(d("wind_speed_kmh") == 36.0)
    assert(d("wind_gust_kmh") == null)       // null struct -> null, row kept
    assert(d("barometric_pressure_hpa") == 1013.25)
    assert(d("sea_level_pressure_hpa") == 1013.0)
    assert(d("visibility_km") == 16.0)
    assert(d("precip_1h_mm") == null)        // null value -> null
    assert(d("relative_humidity_percent") == null) // range-violating -> null
    assert(d("data_classification") == "PUBLIC")

    // fixture feed: mixed per-station units normalize into one canonical
    // range; nulls never drop rows
    val staged = Staging.noaaObservations(Fixtures.noaaObservations(spark, 6, 48), runTs)
    assert(staged.count() == 6 * 48)
    assert(staged.filter(col("temperature_celsius") < -60 || col("temperature_celsius") > 60).count() == 0)
    assert(staged.filter(col("wind_speed_kmh") < 0 || col("wind_speed_kmh") > 300).count() == 0)
    assert(staged.filter(col("barometric_pressure_hpa") > 1100).count() == 0) // Pa would be ~100000
  }

  test("emergency_events: union alignment, enrichment, flags (marts schema tests)") {
    // event_type enum (models/marts/schema.yml:15-19)
    assert(events.filter(!col("event_type").isin("DISASTER", "WEATHER_ALERT")).count() == 0)
    // no duplicate event_ids (data_quality_tests.yml:40-49)
    assert(Validation.duplicates(events, Seq("event_id")).count() == 0)
    // state seed join is total for fixture states (referential integrity :6-15)
    assert(Validation.brokenReferences(events, "state_code",
      SeedData.stateCodesDf(spark), "state_code").count() == 0)
    assert(events.filter(col("state_name").isNull).count() == 0)
    // weather branch only HIGH/CRITICAL (emergency_events.sql:74)
    assert(events.filter(col("event_type") === "WEATHER_ALERT" &&
      !col("risk_level").isin("HIGH", "CRITICAL")).count() == 0)
    // fiscal year range (marts schema.yml:39-45)
    assert(events.filter(col("federal_fiscal_year") < 2020 || col("federal_fiscal_year") > 2026).count() == 0)
    // season totality
    assert(events.filter(!col("event_season").isin("WINTER", "SPRING", "SUMMER", "FALL")).count() == 0)
  }

  test("weather_impacts: daily grain, impact score range 0-9, CO attribution") {
    val impacts = Marts.weatherImpacts(coag, noaa, asOf, runTs)
    assert(impacts.count() > 0)
    assert(Validation.duplicates(impacts, Seq("impact_id")).count() == 0)
    // impact-score range test (data_quality_tests.yml:51-59)
    assert(impacts.filter(col("total_impact_score") < 0 || col("total_impact_score") > 9).count() == 0)
    // geographic constraint: CoAgMet stations are CO-only (anomaly rule :519-735)
    assert(impacts.filter(!col("state_code").isin("CO", "UNKNOWN")).count() == 0)
    assert(impacts.filter(col("impact_category").isNull).count() == 0)
  }

  test("disaster_analytics: trends, YoY, ratings") {
    val analytics = Marts.disasterAnalytics(events, usda, asOf, runTs)
    assert(analytics.count() > 0)
    assert(Validation.duplicates(analytics, Seq("analytics_id")).count() == 0)
    assert(analytics.filter(!col("disaster_trend_direction")
      .isin("INCREASING", "DECREASING", "STABLE", "INSUFFICIENT_DATA")).count() == 0)
    assert(analytics.filter(col("high_risk_event_percentage") < 0 ||
      col("high_risk_event_percentage") > 100).count() == 0)
    // first year per (state, category) has no previous-year count
    assert(analytics.filter(col("disaster_trend_direction") === "INSUFFICIENT_DATA" &&
      col("prev_year_event_count").isNotNull).count() == 0)
  }

  test("public layer: privacy threshold, banded rounding, public codes") {
    val pub = PublicLayer.publicDisasters(events, asOf, runTs)
    assert(pub.count() > 0)
    assert(Validation.duplicates(pub, Seq("public_disaster_code")).count() == 0)
    assert(pub.filter(!col("status").isin("ACTIVE_MONITORING_REQUIRED", "ONGOING", "RESOLVED")).count() == 0)
    // public/API consistency (data_quality_tests.yml:320-335)
    val joined = pub.select(col("disaster_id"), col("disaster_type")).as("p")
      .join(events.select(col("event_id"), col("event_subtype")).as("e"),
        col("p.disaster_id") === col("e.event_id"))
    assert(joined.filter(col("p.disaster_type") =!= col("e.event_subtype")).count() == 0)

    val ag = PublicLayer.publicAgriculturalData(usda, asOf)
    // privacy threshold ≥5 (data_quality_tests.yml:337-352)
    assert(ag.filter(col("number_of_policies") < 5).count() == 0)
    // banded rounding: every total divisible by its band
    val badBand = ag.filter(
      (abs(col("total_premiums")) >= 1e7 && col("total_premiums") % 100000 =!= 0) ||
        (abs(col("total_premiums")) >= 1e6 && abs(col("total_premiums")) < 1e7 && col("total_premiums") % 10000 =!= 0) ||
        (abs(col("total_premiums")) < 1e6 && col("total_premiums") % 1000 =!= 0)).count()
    assert(badBand == 0)

    val alerts = PublicLayer.publicWeatherAlerts(noaa, asOf, runTs)
    assert(alerts.filter(length(col("alert_description")) > 500).count() == 0)
    assert(alerts.filter(length(col("public_instruction")) > 300).count() == 0)

    val quality = PublicLayer.dataQualityMetrics(Seq(
      ("fema", fema, "disaster_number", "processed_at"),
      ("noaa", noaa, "alert_id", "processed_at"),
      ("coagmet", coag, "station_id", "processed_at"),
      ("usda", usda, "commodity_name", "processed_at")
    ), runTs)
    assert(quality.count() == 4)
    assert(quality.filter(col("completeness_pct") < 0 || col("completeness_pct") > 100).count() == 0)
  }
}
