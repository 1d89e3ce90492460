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

  test("compact recovers a rename-window crash instead of deleting the sole copy") {
    val dir = Files.createTempDirectory("compactcrash").toString
    val events = Tables(spark, Sf0001).events.limit(100)
    events.repartition(4).write.parquet(s"$dir/t")
    val total = spark.read.parquet(s"$dir/t").count()
    // simulate a crash BETWEEN rename-aside and rename-in: the table
    // exists only at __old (plus a possibly-complete temp rewrite) — the
    // exact window the pre-fix leftover sweep turned into total loss
    assert(new java.io.File(s"$dir/t").renameTo(new java.io.File(s"$dir/t__old")))
    events.limit(10).write.parquet(s"$dir/t__compact")
    Writers.compact(spark, s"$dir/t", 1)
    // the ORIGINAL data was restored (not the 10-row temp rewrite), then
    // compacted normally; no leftover dirs survive
    assert(spark.read.parquet(s"$dir/t").count() == total)
    assert(!new java.io.File(s"$dir/t__old").exists())
    assert(!new java.io.File(s"$dir/t__compact").exists())
  }

  test("selective compaction rewrites only fragmented partitions, byte-identical elsewhere") {
    val dir = Files.createTempDirectory("compact").toString
    val events = Tables(spark, Sf0001).events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val days = events.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0)).take(3)
    // one healthy partition, two fragmented ones (a micro-batch writer's
    // output shape: many small files inside a single day directory)
    events.filter(col("day") === days(0)).repartition(1)
      .write.partitionBy("day").mode("append").parquet(s"$dir/t")
    Seq(days(1), days(2)).foreach { d =>
      events.filter(col("day") === d).repartition(8)
        .write.partitionBy("day").mode("append").parquet(s"$dir/t")
    }
    val before = spark.read.parquet(s"$dir/t")
    val total = before.count()
    // content digest captured BEFORE compaction (the pre-rewrite DataFrame's
    // file listing dies with the rewrite, so compare via materialized sums)
    val cols = before.columns.sorted.toIndexedSeq
    def digest(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.select(xxhash64(cols.map(c => col(c).cast("string")): _*).cast("decimal(38,0)").as("h"))
        .agg(sum("h")).collect()(0).getDecimal(0)
    val beforeDigest = digest(before)
    val stats = Writers.partitionFileStats(s"$dir/t", "day")
    assert(stats.map(_._1) == days.toSeq.sorted)
    assert(stats.forall { case (_, n, bytes) => n > 0 && bytes > 0 })
    val healthyFiles = new java.io.File(s"$dir/t/day=${days(0)}")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSet

    val rewritten = Writers.compactPartitions(spark, s"$dir/t", "day", maxFiles = 4)
    assert(rewritten.toSet == Set(days(1), days(2)), s"rewrote $rewritten")
    // fragmented partitions collapsed to the byte-target file count (tiny data -> 1)
    Seq(days(1), days(2)).foreach { d =>
      val n = new java.io.File(s"$dir/t/day=$d").listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"day=$d still has $n files")
    }
    // healthy partition untouched: same file names and mtimes
    val healthyAfter = new java.io.File(s"$dir/t/day=${days(0)}")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSet
    assert(healthyAfter == healthyFiles)
    // data round-trips exactly (partition column re-encoded in dir names)
    val after = spark.read.parquet(s"$dir/t")
    assert(after.count() == total)
    assert(digest(after) == beforeDigest)
    // a second pass is a no-op
    assert(Writers.compactPartitions(spark, s"$dir/t", "day", maxFiles = 4).isEmpty)
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

  test("multimodal: ImageIO decode recovers true dimensions and channel means from a generated PNG") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // 20x12 solid orange PNG generated in-process: decode must recover the
    // exact dimensions and RGB means, via the real-codec path
    val img = new BufferedImage(20, 12, BufferedImage.TYPE_INT_RGB)
    (0 until 12).foreach(y => (0 until 20).foreach(x => img.setRGB(x, y, 0xFF8040)))
    val png = { val o = new ByteArrayOutputStream(); ImageIO.write(img, "png", o); o.toByteArray }
    val bmp = { val o = new ByteArrayOutputStream(); ImageIO.write(img, "bmp", o); o.toByteArray }
    val payloads = Seq((1L, png), (2L, bmp), (3L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = Multimodal.extractFeatures(payloads, "doc_id", "payload", featureDim = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, fmt) <- Seq(1L -> "png", 2L -> "bmp")) {
      val r = got(id)
      assert(r.getString(2) == fmt && r.getInt(3) == 20 && r.getInt(4) == 12 && r.getBoolean(5),
        s"payload $id: $r")
      val f = r.getSeq[Float](6)
      assert(math.round(f(0) * 255) == 0xFF && math.round(f(1) * 255) == 0x80 &&
        math.round(f(2) * 255) == 0x40, s"channel means: $f")
    }
    assert(!got(3L).getBoolean(5), "non-image bytes must take the stub fallback")

    // the oracle-checked m2 pattern: synthetic PNGs round-trip to their
    // id-derived ground truth
    val ids = Seq(0L, 5L, 123L, 255L, 300L).toDF("doc_id")
    val dec = Multimodal.extractFeatures(Multimodal.syntheticPngs(ids, "doc_id"), "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 5L, 123L, 255L, 300L)) {
      val r = dec(id)
      assert(r.getInt(3) == 8 + id % 32 && r.getInt(4) == 8 + id % 16 && r.getBoolean(5))
      val f = r.getSeq[Float](6)
      assert(math.round(f(0) * 255) == id % 256 && math.round(f(1) * 255) == (7 * id) % 256 &&
        math.round(f(2) * 255) == (13 * id) % 256, s"id $id means: $f")
    }
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
