package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.operators.{MlFeatures, Multimodal}
import graft.sources.{Readers, Writers}

/** Readers/writers, multimodal plumbing, and spark.ml feature pipeline. */
class SourcesAndMlSpec extends SparkSpecBase {

  test("permissive json reader quarantines corrupt records") {
    val dir = Files.createTempDirectory("json").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"id": 1, "name": "ok"}
        |{"id": "not-a-number", "name": "bad"}
        |{"id": 3, "name": "fine"}
        |not even json
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Readers.jsonPermissive(spark, s"$dir/data.json", schema)
    assert(Readers.valid(df).count() == 2)
    assert(Readers.rejects(df).count() == 2)
  }

  test("csv reader with declared schema loads seed-style dims") {
    val dir = Files.createTempDirectory("csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/dim.csv"),
      "state_code,state_name,fips_code\nCO,Colorado,08\nTX,Texas,48\n")
    val schema = StructType(Seq(
      StructField("state_code", StringType), StructField("state_name", StringType),
      StructField("fips_code", StringType)))
    val df = Readers.csv(spark, s"$dir/dim.csv", schema)
    assert(df.count() == 2)
    assert(df.filter(col("fips_code") === "08").count() == 1)
  }

  test("partitioned writer + audit log + compaction") {
    val dir = Files.createTempDirectory("sink").toString
    val events = Tables(spark, Sf0001).events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Writers.partitionedParquet(events, s"$dir/t", "day", Seq("user_id"))
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == events.count())
    // partition pruning works against the layout
    val pruned = back.filter(col("day") === "2024-01-05")
    assert(pruned.count() > 0 && pruned.count() < back.count())

    Writers.auditLogAppend(events.limit(5).select("event_id", "user_id"), s"$dir/audit", "2024-01-01")
    Writers.auditLogAppend(events.limit(3).select("event_id", "user_id"), s"$dir/audit", "2024-01-01")
    assert(spark.read.json(s"$dir/audit/day=2024-01-01").count() == 8)

    Writers.compact(spark, s"$dir/t", 1)
    assert(spark.read.parquet(s"$dir/t").count() == events.count())
  }

  test("multimodal: binary payload features are deterministic and schema-stable") {
    val docs = Tables(spark, Sf0001).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .limit(50)
    val f1 = Multimodal.extractFeatures(docs, "doc_id", "payload", featureDim = 8)
    val f2 = Multimodal.extractFeatures(docs, "doc_id", "payload", featureDim = 8)
    assert(f1.schema == Multimodal.FeatureSchema)
    assert(f1.count() == 50)
    assert(f1.exceptAll(f2).isEmpty) // purely content-derived => reproducible
    assert(f1.filter(size(col("features")) =!= 8).count() == 0)

    val frames = Multimodal.sampleFrames(docs, "doc_id", "payload", everyNth = 2)
    assert(frames.groupBy("doc_id").count().count() == 50)
  }

  test("spark.ml: window features + random forest trains and scores") {
    val feats = MlFeatures.eventFeatures(Tables(spark, Sf0001).events)
    assert(feats.count() > 0)
    assert(feats.filter(col("value_z") < -3 || col("value_z") > 3).count() == 0)
    val result = MlFeatures.trainNextEventModel(feats)
    assert(result.accuracy >= 0.0 && result.accuracy <= 1.0)
    assert(result.featureImportances.length == 5)
  }
}
