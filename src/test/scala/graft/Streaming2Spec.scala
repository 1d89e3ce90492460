package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.plans.VectorExpressions
import graft.streaming.StreamingJobs

/** ST8 streaming dedup, stateful sessionization, rolling fingerprint. */
class Streaming2Spec extends SparkSpecBase {
  import spark.implicits._

  test("streaming dropDuplicates suppresses re-delivered keys (ST8)") {
    val tmp = Files.createTempDirectory("sdedup").toString
    val ev = Tables(spark, Sf0001).events.select("event_id", "user_id", "event_type", "value", "ts")
    ev.write.parquet(s"$tmp/landing")
    // re-deliver the same batch (new files, same keys)
    ev.write.mode("append").parquet(s"$tmp/landing")
    val got = StreamingJobs.streamingDedup(spark, s"$tmp/landing", Seq("event_id"))
    assert(got.count() == ev.count())
  }

  test("stateful sessionization closes sessions on gaps") {
    val tmp = Files.createTempDirectory("sess").toString
    // user 1: two bursts separated by a day; user 2: one burst
    Seq(
      (1L, 1000L), (1L, 1060L), (1L, 1120L),
      (1L, 90000L), (1L, 90060L),
      (2L, 5000L)
    ).map { case (u, t) => (u, t * 1000000000L) } // ns epochs
      .toDF("user_id", "ts")
      .write.parquet(s"$tmp/landing")
    val sessions = StreamingJobs.sessionize(spark, s"$tmp/landing", gapSeconds = 600)
    // only CLOSED sessions emit (open state held): user1's first burst closes
    val rows = sessions.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.contains((1L, 1000L, 1120L, 3)))
    assert(rows.length == 1)
  }

  test("watermark drops events later than the horizon (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .count()
    val q = agg.writeStream.outputMode("append").format("memory").queryName("wmtest").start()
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    // batch 1: events at 10:00 and 10:30 -> watermark advances to 10:20
    input.addData((t(0), "a"), (t(30), "a"))
    q.processAllAvailable()
    // batch 2: a late event at 10:01 — behind the 10:20 watermark, its
    // window [10:00,10:05) is already finalized, so it must be dropped
    input.addData((t(1), "a"))
    q.processAllAvailable()
    // batch 3: push watermark far forward so all open windows finalize
    input.addData((Timestamp.valueOf("2026-01-01 12:00:00"), "a"))
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("wmtest")
      .select(col("window.start").cast("string"), col("count")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("2026-01-01 10:00:00") == 1L, "late 10:01 event must not be counted")
    assert(counts("2026-01-01 10:30:00") == 1L)
  }

  test("rolling fingerprint: deterministic, shift-invariant on shared content") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with no overlap whatsoever here")
    ).toDF("id", "text")
    val fps = df.select(col("id"), VectorExpressions.rolling_fingerprint(col("text"), 16).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
    // short doc (< window) still fingerprints
    val short = Seq((9L, "tiny")).toDF("id", "text")
      .select(VectorExpressions.rolling_fingerprint(col("text"), 16)).head().getLong(0)
    assert(short != 0L)
  }
}
