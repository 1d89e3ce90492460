package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.sources.Writers
import graft.streaming.{KafkaEnvelope, KafkaTransport}

/** S10/S11 transport assembly + lineage/compliance audit-record shapes. */
class TransportAndAuditSpec extends SparkSpecBase {
  import spark.implicits._

  test("file-twin envelope stream round-trips wrapped rows through unwrap") {
    val dir = Files.createTempDirectory("ktwin").toString
    val ckpt = Files.createTempDirectory("ktwin_ckpt").toString
    val rows = Seq((1L, "flood", 3.5), (2L, "fire", 1.25)).toDF("id", "kind", "sev")
    KafkaEnvelope.wrap(rows, col("id"), dataSource = "fema")
      .write.parquet(s"$dir/batch0")

    val typed = KafkaTransport.typedStream(
      spark,
      KafkaTransport.FileTwin(s"$dir/batch0"),
      rows.schema)
    val q = typed.writeStream.outputMode("append").format("memory")
      .queryName("ktwin_out").option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("ktwin_out")
      .select("id", "kind", "sev").as[(Long, String, Double)].collect().sorted
    assert(out.toSeq == Seq((1L, "flood", 3.5), (2L, "fire", 1.25)))
    // quarantine column exists and is empty for clean input
    assert(spark.table("ktwin_out").filter(col("__unparsed").isNotNull).count() == 0)
  }

  test("kafka branch assembles the production reader (fails only on the absent connector)") {
    // No broker or connector jar ships in this environment; the branch is
    // still exercised up to source resolution — the error must be the
    // missing kafka DATA SOURCE, proving the reader was assembled, not a
    // config/logic error in our code.
    val e = intercept[Exception] {
      KafkaTransport.envelopeStream(
        spark, KafkaTransport.KafkaTopic("broker:9092", "events"))
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }

  test("lineage and compliance audit records append with the macro column sets") {
    val ts = Timestamp.valueOf("2024-09-24 12:00:00")
    val lineagePath = Files.createTempDirectory("lineage").toString + "/log"
    val lineage = Writers.dataLineageRecord(spark, "stg_fema", "emergency_events",
      "dbt_model", "run-42", ts, "0.1.0", "pipeline_svc", Seq("FISMA", "FedRAMP"))
    assert(lineage.columns.toSeq == Seq("source_table", "target_table",
      "transformation_type", "run_id", "transformation_timestamp",
      "engine_version", "user_name", "compliance_frameworks"))
    Writers.auditRecordAppend(lineage, lineagePath)
    Writers.auditRecordAppend(lineage, lineagePath) // append-only: 2 rows
    val back = spark.read.parquet(lineagePath)
    assert(back.count() == 2)
    assert(back.select("compliance_frameworks").distinct.as[String].collect()
      .toSeq == Seq("FISMA,FedRAMP"))

    val compliance = Writers.federalComplianceEvent(spark, "MODEL_RUN",
      "public_disasters", None, Seq("FISMA"), ts, "run-42", "pipeline_svc", "prod")
    assert(compliance.columns.toSeq == Seq("event_type", "table_name",
      "event_details", "compliance_frameworks", "event_timestamp", "run_id",
      "user_name", "environment"))
    assert(compliance.filter(col("event_details").isNull).count() == 1)
  }
}
