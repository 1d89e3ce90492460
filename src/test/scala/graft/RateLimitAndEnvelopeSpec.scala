package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.RateLimit
import graft.streaming.{KafkaEnvelope, TopicProvisioning}

/** Rate limiting over the usage log + Kafka message envelope round-trip. */
class RateLimitAndEnvelopeSpec extends SparkSpecBase {
  import spark.implicits._

  test("hourly rate limit: requests beyond the tier quota are denied") {
    // public tier = 1000/h; simulate 1005 requests in one hour for orgA,
    // 10 for orgB (government)
    val rows =
      (1 to 1005).map(i => ("orgA", "public", s"2024-01-01 10:${"%02d".format(i % 60)}:${"%02d".format(i % 60)}")) ++
        (1 to 10).map(i => ("orgB", "government", s"2024-01-01 10:00:${"%02d".format(i)}"))
    val log = rows.toDF("org", "tier", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val evaluated = RateLimit.evaluate(log, "org", "tier", "ts")
    val deniedA = evaluated.filter(col("org") === "orgA" && !col("allowed")).count()
    assert(deniedA >= 5) // at least the overflow beyond 1000 in-window
    assert(evaluated.filter(col("org") === "orgB" && !col("allowed")).count() == 0)
    assert(evaluated.filter(col("org") === "orgB").head().getAs[Int]("hourly_limit") == 10000)
  }

  test("kafka envelope round-trips typed rows with compliance fields") {
    val src = Seq((4601L, "CO", "Flood"), (4602L, "TX", "Fire"))
      .toDF("disaster_number", "state", "incident_type")
    val wrapped = KafkaEnvelope.wrap(src, col("disaster_number"), dataSource = "FEMA_OpenFEMA")
    assert(wrapped.columns.toSeq == Seq("key", "value"))
    assert(wrapped.filter(col("key") === "4601").count() == 1)
    assert(wrapped.filter(col("value").contains("\"data_source\":\"FEMA_OpenFEMA\"")).count() == 2)

    val schema = StructType(Seq(
      StructField("disaster_number", LongType), StructField("state", StringType),
      StructField("incident_type", StringType), StructField("data_source", StringType),
      StructField("data_classification", StringType)))
    val typed = KafkaEnvelope.unwrap(wrapped, schema)
    assert(typed.filter(col("__unparsed").isNotNull).count() == 0)
    assert(typed.filter(col("state") === "CO" && col("data_classification") === "PUBLIC").count() == 1)

    // corrupt message keeps its raw payload for quarantine
    val corrupt = wrapped.unionByName(Seq(("bad", "not-json{{")).toDF("key", "value"))
    val parsed = KafkaEnvelope.unwrap(corrupt, schema)
    assert(parsed.filter(col("__unparsed").isNotNull).count() == 1)
  }

  test("topic provisioning declares the six reference topics with layered config") {
    val byName = TopicProvisioning.emergencyTopics.map(t => t.name -> t).toMap
    assert(byName.keySet == Set(
      "fema_disasters", "noaa_weather_alerts", "coagmet_weather",
      "usda_agricultural_data", "data_quality_metrics", "ml_predictions"))

    // partition sizing follows expected volume (noaa highest, metrics lowest)
    assert(byName("noaa_weather_alerts").partitions == 5)
    assert(byName("data_quality_metrics").partitions == 1)

    // per-topic overrides layer over shared defaults
    val metrics = byName("data_quality_metrics").resolvedConfig
    assert(metrics("cleanup.policy") == "compact")
    assert(metrics("retention.ms") == (90L * 24 * 60 * 60 * 1000).toString)
    assert(metrics("compression.type") == "gzip") // inherited default
    assert(metrics("segment.ms") == (24L * 60 * 60 * 1000).toString)

    val fema = byName("fema_disasters").resolvedConfig
    assert(fema("cleanup.policy") == "delete")
    assert(fema("retention.ms") == (30L * 24 * 60 * 60 * 1000).toString)

    // unknown override keys are kept (sorted, after the defaults)
    val custom = TopicProvisioning.TopicSpec("x", 1,
      overrides = Map("max.message.bytes" -> "1048576")).resolvedConfig
    assert(custom.keys.toSeq ==
      Seq("cleanup.policy", "retention.ms", "segment.ms", "compression.type", "max.message.bytes"))
  }

  test("topic provisioning renders idempotent CLI commands") {
    val cmds = TopicProvisioning.cliCommands("broker:9092")
    assert(cmds.size == 6)
    assert(cmds.forall(_.startsWith(
      "kafka-topics.sh --create --if-not-exists --bootstrap-server broker:9092 ")))
    val noaa = cmds.find(_.contains("--topic noaa_weather_alerts")).get
    assert(noaa.contains("--partitions 5"))
    assert(noaa.contains("--replication-factor 1"))
    assert(noaa.contains("--config cleanup.policy=delete"))
    assert(noaa.contains("--config retention.ms=604800000"))
  }
}
