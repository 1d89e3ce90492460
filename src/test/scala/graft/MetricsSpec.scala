package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.em.{Fixtures, PublicLayer, Staging}
import graft.operators.Validation

/** Usage metrics, agricultural summary view, volume anomaly detection. */
class MetricsSpec extends SparkSpecBase {
  import spark.implicits._

  test("agricultural summary aggregates only published counties") {
    val runTs = Timestamp.valueOf("2024-07-01 12:00:00")
    val usda = Staging.usdaData(Fixtures.usda(spark, 800), runTs)
    val pub = PublicLayer.publicAgriculturalData(usda, Date.valueOf("2024-07-01"))
    val summary = PublicLayer.publicAgriculturalSummary(pub)
    assert(summary.count() > 0)
    // totals must equal the sum of the published rollup (no leakage from suppressed groups)
    val direct = pub.agg(sum("number_of_policies")).head().getLong(0)
    val viaSummary = summary.agg(sum("total_policies")).head().getLong(0)
    assert(direct == viaSummary)
    assert(summary.filter(col("state_loss_ratio") < 0).count() == 0)
  }

  test("usage metrics from an audit log frame") {
    val log = Seq(
      ("2024-01-01 10:00:00", "govA", "/api/disasters"),
      ("2024-01-01 11:00:00", "govA", "/api/alerts"),
      ("2024-01-01 12:00:00", "eduB", "/api/disasters"),
      ("2024-01-02 09:00:00", "eduB", "/health")
    ).toDF("ts", "org", "endpoint").withColumn("ts", col("ts").cast("timestamp"))
    val m = PublicLayer.usageMetrics(log).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(m("2024-01-01") == ((3L, 2L, 3L)))
    assert(m("2024-01-02") == ((1L, 1L, 0L)))
  }

  test("volume anomalies flag a spiked day against trailing baseline") {
    val events = Tables(spark, Sf0001).events
    // triple one day's volume
    val spiked = events.unionByName(
      events.filter(to_date(col("ts")) === "2024-01-20")).unionByName(
      events.filter(to_date(col("ts")) === "2024-01-20"))
    val flags = Validation.volumeAnomalies(spiked, "ts", window = 7, tolerance = 0.8)
    val anomalyDays = flags.filter(col("is_anomaly")).select("day").collect().map(_.get(0).toString)
    assert(anomalyDays.contains("2024-01-20"))
    // normal data: same check on the raw table flags nothing after warm-up
    val normal = Validation.volumeAnomalies(events, "ts", window = 7, tolerance = 0.8)
    assert(normal.filter(col("is_anomaly")).count() == 0)
  }

  test("temporal clustering flags a group packed into minutes, not a spread-out one") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def at(mins: Long) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    val rows =
      (1 to 20).map(i => ("stuck_scraper", at(i / 10))) ++   // 20 rows inside 2 minutes
        (1 to 20).map(i => ("healthy_feed", at(i * 90L)))    // 20 rows across 30 hours
    val df = rows.toDF("src", "ts")
    val got = Validation.temporalClustering(df, "src", "ts", maxSpanHours = 0.1, minRecords = 10)
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(got == Map("stuck_scraper" -> true, "healthy_feed" -> false))
  }

  test("geo constraint: CoAgMet-style source must stay in its allowed region") {
    import spark.implicits._
    val df = Seq(
      ("CoAgMet", "CO"), ("CoAgMet", "CO"), ("CoAgMet", "WY"), ("CoAgMet", null),
      ("FEMA", "TX"), ("FEMA", "CA"), // unconstrained source never appears
      ("NOAA", "CO"), ("NOAA", "UT")
    ).toDF("source", "state")
    val got = Validation.geoConstraintViolations(df, "source", "state",
        Map("CoAgMet" -> Seq("CO"), "NOAA" -> Seq("CO", "UT")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map("CoAgMet" -> ((4L, 2L, true)), "NOAA" -> ((2L, 0L, false))))
  }

  test("single-region concentration and dominant-category anomalies") {
    import spark.implicits._
    val df = (1 to 30).map(i => ("s1", "CO", "Fire")) ++
      (1 to 30).map(i => ("s2", if (i % 2 == 0) "CO" else "TX", if (i <= 27) "Flood" else "Fire"))
    val frame = df.toDF("source", "state", "etype")
    val conc = Validation.singleRegionConcentration(frame, "source", "state", minRecords = 20)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(conc == Map("s1" -> true, "s2" -> false))
    val dom = Validation.dominantCategory(frame, "source", "etype", maxShare = 0.8)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(3)))).toMap
    // s1 has ONE category only -> not flagged (n_cats must exceed 1, as the
    // reference only checks dominance when len(disaster_types) > 1)
    assert(dom("s1") == (("Fire", false)))
    assert(dom("s2") == (("Flood", true))) // 27/30 = 0.9 > 0.8
  }
}
