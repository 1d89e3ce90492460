package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.EngineConfig
import graft.em.{Fixtures, Staging}
import graft.streaming.StreamingJobs

/** Config loading + the freshness monitor job. */
class ConfigSpec extends SparkSpecBase {

  test("source configs round-trip through the JSON loader") {
    val dir = Files.createTempDirectory("cfg").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/sources.json"),
      """{"name":"noaa","freshnessSlaHours":0.25,"retentionDays":1095,"batchSize":500,"keyColumns":["alert_id"]}
        |{"name":"fema","freshnessSlaHours":4.0,"retentionDays":2555,"batchSize":1000,"keyColumns":["disaster_number"]}
        |""".stripMargin)
    val cfgs = EngineConfig.loadSources(spark, s"$dir/sources.json")
    assert(cfgs.toSet == Set(
      EngineConfig.SourceConfig("noaa", 0.25, 1095, 500, Seq("alert_id")),
      EngineConfig.SourceConfig("fema", 4.0, 2555, 1000, Seq("disaster_number"))))
    assert(EngineConfig.DefaultSources.map(_.name).length == 4)
  }

  test("freshness monitor flags stale sources against their SLAs") {
    val runTs = Timestamp.valueOf("2024-07-01 12:00:00")
    val fema = Staging.femaDisasters(Fixtures.fema(spark, 50), runTs)
    val fresh = StreamingJobs.freshnessMonitor(
      Seq((EngineConfig.DefaultSources.find(_.name.startsWith("fema")).get, fema, "processed_at")),
      Timestamp.valueOf("2024-07-01 13:00:00"))
    val row = fresh.head()
    assert(row.getAs[Boolean]("fresh")) // 1h old vs 4h SLA
    val stale = StreamingJobs.freshnessMonitor(
      Seq((EngineConfig.DefaultSources.find(_.name.startsWith("fema")).get, fema, "processed_at")),
      Timestamp.valueOf("2024-07-02 12:00:00"))
    assert(!stale.head().getAs[Boolean]("fresh")) // 24h old vs 4h SLA
  }
}
