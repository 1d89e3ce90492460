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
}
