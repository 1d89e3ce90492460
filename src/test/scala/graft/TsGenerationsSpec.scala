package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.StreamingJobs

/** The round-4 breakage class, pinned forever: driver testdata generations
  * have shipped the events `ts` column in THREE on-disk parquet forms —
  * epoch-nanos int64 (TIMESTAMP(NANOS), read as LongType under
  * `legacy.parquet.nanosAsLong`), TIMESTAMP_NTZ micros
  * (isAdjustedToUTC=false), and UTC-instant micros — and TIMESTAMP_NTZ is
  * rejected by `withWatermark`, so a generation flip silently broke four
  * streaming entries in round 4. This spec stages the SAME events in each
  * generation and drives every event-time streaming entry point over all
  * three, asserting identical results: whatever the driver regenerates
  * next, the engine's one logical schema holds.
  */
class TsGenerationsSpec extends SparkSpecBase {

  private val base = java.nio.file.Files.createTempDirectory("graft_tsgen").toString

  /** Stage sf0.001 events (normalized once) into the three generations,
    * each as <base>/<form>/events.parquet — the dir layout every streaming
    * entry point expects. */
  private lazy val dirs: Map[String, String] = {
    val ev = graft.core.Tables(spark, Sf0001).events
    val utc = ev // TimestampType, UTC instant micros
    val ntz = ev.withColumn("ts", col("ts").cast("timestamp_ntz"))
    val nanos = ev.withColumn("ts", expr("unix_micros(ts)") * lit(1000L))
    Map("utc" -> utc, "ntz" -> ntz, "nanos" -> nanos).map { case (form, df) =>
      // stage as a single FILE named events.parquet (the driver testdata
      // layout: the streaming entries' pathGlobFilter matches that name,
      // not part-files inside a directory)
      val stage = s"$base/_stage_$form"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dir = java.nio.file.Paths.get(base, form)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.move(part.toPath, dir.resolve("events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      form -> s"$base/$form"
    }
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def assertSameAcrossForms(name: String, run: String => DataFrame): Unit = {
    val results = dirs.map { case (form, dir) => form -> rows(run(dir)) }
    val utc = results("utc")
    assert(utc.nonEmpty, s"$name produced no rows on the utc form")
    results.foreach { case (form, got) =>
      assert(got == utc,
        s"$name: $form generation diverged from utc " +
          s"(only-in-$form=${(got -- utc).take(3)}, missing=${(utc -- got).take(3)})")
    }
  }

  test("tumbling window counts agree across all three ts generations") {
    assertSameAcrossForms("tumblingEventCounts",
      dir => StreamingJobs.tumblingEventCounts(spark, dir))
  }

  test("sliding window counts agree across all three ts generations") {
    assertSameAcrossForms("slidingEventCounts",
      dir => StreamingJobs.slidingEventCounts(spark, dir))
  }

  test("streaming latency quantiles agree across all three ts generations") {
    assertSameAcrossForms("streamingLatencyQuantiles",
      dir => StreamingJobs.streamingLatencyQuantiles(spark, dir))
  }

  test("stateful sessionize agrees across all three ts generations") {
    assertSameAcrossForms("sessionize",
      dir => StreamingJobs.sessionize(spark, dir, gapSeconds = 1800L))
  }

  test("sentinel-flushed streamingSessionize agrees across all three ts generations") {
    assertSameAcrossForms("streamingSessionize",
      dir => StreamingJobs.streamingSessionize(spark, dir))
  }

  test("drift PSI agrees across all three ts generations") {
    assertSameAcrossForms("streamingDriftPsi",
      dir => StreamingJobs.streamingDriftPsi(spark, dir))
  }

  test("streaming funnel agrees across all three ts generations") {
    assertSameAcrossForms("streamingFunnel",
      dir => StreamingJobs.streamingFunnel(spark, dir))
  }

  test("streaming attribution agrees across all three ts generations") {
    assertSameAcrossForms("streamingAttribution",
      dir => StreamingJobs.streamingAttribution(spark, dir))
  }
}
