package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.RateLimit
import graft.streaming.KafkaEnvelope

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
}
