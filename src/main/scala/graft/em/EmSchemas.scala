package graft.em

import org.apache.spark.sql.types._

/** Declared StructTypes for the four raw feeds — fail-fast schemas matching
  * the reference's source declarations (sources.yml:24-411, DDL at
  * jobs/ingestion_jobs.py:234-284, validation_schemas.py:9-264).
  */
object EmSchemas {

  val Fema: StructType = StructType(Seq(
    StructField("disaster_number", StringType, nullable = false),
    StructField("state", StringType, nullable = false),
    StructField("declaration_type", StringType),
    StructField("declaration_date", DateType, nullable = false),
    StructField("incident_type", StringType),
    StructField("title", StringType),
    StructField("incident_begin_date", DateType),
    StructField("incident_end_date", DateType),
    StructField("designated_area", StringType),
    StructField("fy_declared", IntegerType),
    StructField("ingestion_timestamp", TimestampType, nullable = false),
    StructField("data_source", StringType)
  ))

  val Noaa: StructType = StructType(Seq(
    StructField("alert_id", StringType, nullable = false),
    StructField("event", StringType),
    StructField("severity", StringType),
    StructField("urgency", StringType),
    StructField("certainty", StringType),
    StructField("headline", StringType),
    StructField("description", StringType),
    StructField("instruction", StringType),
    StructField("area_desc", StringType),
    StructField("effective", TimestampType, nullable = false),
    StructField("expires", TimestampType),
    StructField("geometry", StringType), // GeoJSON kept as a JSON string (assets/raw_data.py:148)
    StructField("ingestion_timestamp", TimestampType, nullable = false),
    StructField("data_source", StringType)
  ))

  val Coagmet: StructType = StructType(Seq(
    StructField("station_id", StringType, nullable = false),
    StructField("station_name", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("temperature", DoubleType),
    StructField("humidity", DoubleType),
    StructField("wind_speed", DoubleType),
    StructField("precipitation", DoubleType),
    StructField("ingestion_timestamp", TimestampType, nullable = false),
    StructField("data_source", StringType)
  ))

  val Usda: StructType = StructType(Seq(
    StructField("program_year", IntegerType, nullable = false),
    StructField("state_code", StringType, nullable = false),
    StructField("county_code", StringType, nullable = false),
    StructField("commodity", StringType, nullable = false),
    StructField("practice", StringType),
    StructField("coverage_level", DoubleType),
    StructField("premium_amount", DoubleType),
    StructField("liability_amount", DoubleType),
    StructField("indemnity_amount", DoubleType),
    StructField("ingestion_timestamp", TimestampType, nullable = false),
    StructField("data_source", StringType)
  ))

  /** NOAA API measurement object `{unitCode, value, qualityControl}` —
    * the nested struct every observation field arrives as
    * (scrapers/main.py:294-298 unwraps it value-only; here the struct is
    * kept typed so unit normalization can be explicit). */
  val NoaaMeasurement: StructType = StructType(Seq(
    StructField("value", DoubleType),
    StructField("unitCode", StringType),
    StructField("qualityControl", StringType)
  ))

  /** Per-station observations feed (scrapers/main.py:254-292): every
    * meteorological field is a NoaaMeasurement struct. */
  val NoaaObservations: StructType = StructType(
    Seq(
      StructField("station_id", StringType, nullable = false),
      StructField("timestamp", TimestampType, nullable = false)
    ) ++ Seq(
      "temperature", "dewpoint", "wind_direction", "wind_speed", "wind_gust",
      "barometric_pressure", "sea_level_pressure", "visibility",
      "max_temperature_last_24_hours", "min_temperature_last_24_hours",
      "precipitation_last_hour", "precipitation_last_3_hours",
      "precipitation_last_6_hours", "relative_humidity", "wind_chill", "heat_index"
    ).map(StructField(_, NoaaMeasurement)) ++ Seq(
      StructField("ingestion_timestamp", TimestampType, nullable = false),
      StructField("data_source", StringType)
    ))
}
