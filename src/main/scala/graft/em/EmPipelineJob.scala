package graft.em

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.SparkSession

/** End-to-end EM pipeline runner: fixtures → staging → marts → public →
  * quality metrics, materialized as date-partitioned parquet (the
  * bronze→silver→gold layout SURVEY §1.1 maps StarRocks tables onto).
  *
  * Usage: runMain graft.em.EmPipelineJob <outDir>
  */
object EmPipelineJob {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/em_pipeline")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("em-pipeline")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runTs = Timestamp.valueOf("2024-07-01 12:00:00")
    val asOf = Date.valueOf("2024-07-01")

    val fema = Staging.femaDisasters(Fixtures.fema(spark, 2000), runTs)
    val noaa = Staging.noaaWeather(Fixtures.noaa(spark, 1000), runTs)
    val coag = Staging.coagmetData(Fixtures.coagmet(spark, 20, 60, 19905L), runTs)
    val usda = Staging.usdaData(Fixtures.usda(spark, 5000), runTs)

    val events = Marts.emergencyEvents(spark, fema, noaa, runTs)
    val impacts = Marts.weatherImpacts(coag, noaa, asOf, runTs)
    val analytics = Marts.disasterAnalytics(events, usda, asOf, runTs)
    val pubDisasters = PublicLayer.publicDisasters(events, asOf, runTs)
    val pubAlerts = PublicLayer.publicWeatherAlerts(noaa, asOf, runTs)
    val pubAg = PublicLayer.publicAgriculturalData(usda, asOf)
    val quality = PublicLayer.dataQualityMetrics(Seq(
      ("fema", fema, "disaster_number", "processed_at"),
      ("noaa", noaa, "alert_id", "processed_at"),
      ("coagmet", coag, "station_id", "processed_at"),
      ("usda", usda, "commodity_name", "processed_at")
    ), runTs)

    // gold tables partitioned by their date key — partition pruning is the
    // primary 100 TB access path (SURVEY §4)
    events.write.mode("overwrite").partitionBy("event_date").parquet(s"$outDir/emergency_events")
    impacts.write.mode("overwrite").partitionBy("impact_date").parquet(s"$outDir/weather_impacts")
    analytics.write.mode("overwrite").parquet(s"$outDir/disaster_analytics")
    pubDisasters.write.mode("overwrite").parquet(s"$outDir/public_disasters")
    pubAlerts.write.mode("overwrite").parquet(s"$outDir/public_weather_alerts")
    pubAg.write.mode("overwrite").parquet(s"$outDir/public_agricultural_data")
    quality.write.mode("overwrite").parquet(s"$outDir/data_quality_metrics")

    // SCD2 snapshot (disaster_declarations_snapshot parity): init from the
    // first half of declarations, merge the second half as a later batch
    val snapBase = graft.operators.Scd2.init(
      fema.filter(org.apache.spark.sql.functions.col("disaster_number").cast("int") % 2 === 0), "processed_at")
    val laterTs = Timestamp.valueOf("2024-08-01 12:00:00")
    val batch2 = Staging.femaDisasters(Fixtures.fema(spark, 2000), laterTs)
    val snapshot = graft.operators.Scd2.merge(snapBase, batch2, Seq("disaster_number"), "processed_at")
    snapshot.write.mode("overwrite").parquet(s"$outDir/disaster_declarations_snapshot")

    Seq("emergency_events", "weather_impacts", "disaster_analytics", "public_disasters",
      "public_weather_alerts", "public_agricultural_data", "data_quality_metrics",
      "disaster_declarations_snapshot").foreach { t =>
      println(s"[em-pipeline] $t rows=${spark.read.parquet(s"$outDir/$t").count()}")
    }
    spark.stop()
  }
}
