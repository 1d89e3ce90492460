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
    val spark = graft.core.SparkSessionFactory.local("em-pipeline", defaultCpus = 8)

    val runTs = Timestamp.valueOf("2024-07-01 12:00:00")
    val asOf = Date.valueOf("2024-07-01")

    // the dbt ref-graph as an explicit DAG: staging (not materialized) →
    // marts/public/metrics materialized via the parquet sink, gold tables
    // partitioned by their date key — partition pruning is the primary
    // 100 TB access path (SURVEY §4)
    val partitionKey = Map(
      "emergency_events" -> "event_date",
      "weather_impacts" -> "impact_date")
    def sink(name: String, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val w = df.write.mode("overwrite")
      partitionKey.get(name).fold(w)(w.partitionBy(_)).parquet(s"$outDir/$name")
      spark.read.parquet(s"$outDir/$name")
    }

    import graft.core.Dag
    val nodes = Seq(
      Dag.Node("stg_fema", Nil, _ => Staging.femaDisasters(Fixtures.fema(spark, 2000), runTs), materialize = false),
      Dag.Node("stg_noaa", Nil, _ => Staging.noaaWeather(Fixtures.noaa(spark, 1000), runTs), materialize = false),
      Dag.Node("stg_coagmet", Nil, _ => Staging.coagmetData(Fixtures.coagmet(spark, 20, 60, 19905L), runTs), materialize = false),
      Dag.Node("stg_usda", Nil, _ => Staging.usdaData(Fixtures.usda(spark, 5000), runTs), materialize = false),
      Dag.Node("emergency_events", Seq("stg_fema", "stg_noaa"),
        d => Marts.emergencyEvents(spark, d("stg_fema"), d("stg_noaa"), runTs)),
      Dag.Node("weather_impacts", Seq("stg_coagmet", "stg_noaa"),
        d => Marts.weatherImpacts(d("stg_coagmet"), d("stg_noaa"), asOf, runTs)),
      Dag.Node("disaster_analytics", Seq("emergency_events", "stg_usda"),
        d => Marts.disasterAnalytics(d("emergency_events"), d("stg_usda"), asOf, runTs)),
      Dag.Node("public_disasters", Seq("emergency_events"),
        d => PublicLayer.publicDisasters(d("emergency_events"), asOf, runTs)),
      Dag.Node("public_weather_alerts", Seq("stg_noaa"),
        d => PublicLayer.publicWeatherAlerts(d("stg_noaa"), asOf, runTs)),
      Dag.Node("public_agricultural_data", Seq("stg_usda"),
        d => PublicLayer.publicAgriculturalData(d("stg_usda"), asOf)),
      Dag.Node("public_agricultural_summary", Seq("public_agricultural_data"),
        d => PublicLayer.publicAgriculturalSummary(d("public_agricultural_data"))),
      Dag.Node("data_quality_metrics", Seq("stg_fema", "stg_noaa", "stg_coagmet", "stg_usda"),
        d => PublicLayer.dataQualityMetrics(Seq(
          ("fema", d("stg_fema"), "disaster_number", "processed_at"),
          ("noaa", d("stg_noaa"), "alert_id", "processed_at"),
          ("coagmet", d("stg_coagmet"), "station_id", "processed_at"),
          ("usda", d("stg_usda"), "commodity_name", "processed_at")), runTs)),
      Dag.Node("disaster_declarations_snapshot", Seq("stg_fema"), { d =>
        // SCD2 snapshot parity: init from half the declarations, merge a
        // later batch (snapshots/disaster_declarations_snapshot.sql)
        val snapBase = graft.operators.Scd2.init(
          d("stg_fema").filter(org.apache.spark.sql.functions.col("disaster_number").cast("int") % 2 === 0),
          "processed_at")
        val batch2 = Staging.femaDisasters(Fixtures.fema(spark, 2000), Timestamp.valueOf("2024-08-01 12:00:00"))
        graft.operators.Scd2.merge(snapBase, batch2, Seq("disaster_number"), "processed_at")
      }),
      Dag.Node("weather_alerts_snapshot", Seq("stg_noaa"), { d =>
        // snapshots/weather_alerts_snapshot.sql: unique_key=alert_id,
        // strategy=timestamp on processed_at, invalidate_hard_deletes —
        // batch 2 re-stages the feed a month later; alerts that left the
        // feed close at the batch-2 run time
        import org.apache.spark.sql.functions._
        val k = regexp_extract(col("alert_id"), "([0-9]+)$", 1).cast("int")
        val base = graft.operators.Scd2.init(d("stg_noaa").filter(k % 2 === 0), "processed_at")
        val t2 = Timestamp.valueOf("2024-08-01 12:00:00")
        val batch2 = Staging.noaaWeather(Fixtures.noaa(spark, 1000), t2)
        graft.operators.Scd2.merge(base, batch2, Seq("alert_id"), "processed_at",
          invalidateHardDeletes = true, deleteTs = Some(t2))
      }),
      Dag.Node("agricultural_risk_snapshot", Seq("stg_usda"), { d =>
        // snapshots/agricultural_risk_snapshot.sql: the 4-column composite
        // unique_key program_year||state_code||county_code||commodity_name.
        // The staging feed carries several policies per composite key, so
        // collapse to one row per key (deterministic max) before merging —
        // a timestamp strategy cannot order same-ts duplicates.
        import org.apache.spark.sql.functions._
        val keys = Seq("program_year", "state_code", "county_code", "commodity_name")
        def collapse(src: org.apache.spark.sql.DataFrame) = src
          .groupBy(keys.map(col): _*)
          .agg(max("loss_category").as("loss_category"),
            max("premium_amount_usd").as("premium_amount_usd"),
            max("indemnity_amount_usd").as("indemnity_amount_usd"),
            first("processed_at").as("processed_at"))
        val base = graft.operators.Scd2.init(collapse(d("stg_usda")), "processed_at")
        val t2 = Timestamp.valueOf("2024-08-01 12:00:00")
        val batch2 = collapse(Staging.usdaData(Fixtures.usda(spark, 5000), t2))
        graft.operators.Scd2.merge(base, batch2, keys, "processed_at",
          invalidateHardDeletes = true, deleteTs = Some(t2))
      }),
      Dag.Node("emergency_events_summary_snapshot", Seq("emergency_events"), { d =>
        // snapshots/emergency_events_summary_snapshot.sql: unique_key=
        // event_id, updated_at=last_updated — the one snapshot taken
        // DOWNSTREAM of a model (the emergency_events mart), versioning
        // the published summary rather than a staging feed
        import org.apache.spark.sql.functions._
        val ev = d("emergency_events")
        val base = graft.operators.Scd2.init(
          ev.filter(regexp_extract(col("event_id"), "([0-9]+)$", 1).cast("int") % 2 === 0),
          "last_updated")
        val batch2 = ev.withColumn("last_updated",
          lit(Timestamp.valueOf("2024-08-01 12:00:00")))
        graft.operators.Scd2.merge(base, batch2, Seq("event_id"), "last_updated")
      })
    )
    val result = Dag.run(nodes, sink)
    result.order.filter(n => !n.startsWith("stg_")).foreach { t =>
      println(s"[em-pipeline] $t rows=${spark.read.parquet(s"$outDir/$t").count()}")
    }
    spark.stop()
  }
}
