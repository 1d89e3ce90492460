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
