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

  test("sentinel-flushed streaming sessionize equals the batch session set (st13)") {
    import org.apache.spark.sql.expressions.Window
    val got = StreamingJobs.streamingSessionize(spark, Sf0001, gapSeconds = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch twin: same gap rule via lag + running sum over epoch seconds
    val w = Window.partitionBy("user_id").orderBy("ts_s")
    val expected = Tables(spark, Sf0001).events
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"))
      .withColumn("prev", lag(col("ts_s"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_s") - col("prev") > 1800L, 1L).otherwise(0L))
      .withColumn("seq", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg(min("ts_s").as("s"), max("ts_s").as("e"), count(lit(1)).as("n"))
      .select("user_id", "s", "e", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
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

  test("append-mode windowed counts: finalized windows emit once, state rows are evicted, late rows dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = StreamingJobs.windowedCountsAppend(
      input.toDF().toDF("ts", "k"), "ts", watermark = "10 minutes", size = "5 minutes")
    val q = agg.writeStream.outputMode("append").format("memory").queryName("appendwin").start()
    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    input.addData((t(0), "a"), (t(2), "b"), (t(30), "a")) // wm -> 10:20; [10:00,10:05) finalizes
    q.processAllAvailable()
    input.addData((t(1), "a")) // behind the watermark: dropped, not re-counted
    q.processAllAvailable()
    input.addData((Timestamp.valueOf("2026-01-01 11:00:00"), "a")) // wm -> 10:50; [10:30) finalizes
    q.processAllAvailable()
    val dropped = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    val finalStateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).last
    q.stop()
    val counts = spark.table("appendwin")
      .select(col("window.start").cast("string"), col("event_cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // each finalized window emitted exactly once, late 10:01 row not counted
    assert(counts == Map("2026-01-01 10:00:00" -> 2L, "2026-01-01 10:30:00" -> 1L))
    assert(dropped >= 1, s"late row must be dropped by the watermark (dropped=$dropped)")
    // 3 windows seen over the stream's life; only the open 11:00 window may
    // still hold state — finalized windows' rows were evicted
    assert(finalStateRows <= 1, s"state must not grow with stream history (rows=$finalStateRows)")
  }

  test("append-mode sliding windows: overlapping windows finalize and evict the same way") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = StreamingJobs.windowedCountsAppend(
      input.toDF().toDF("ts", "k"), "ts", watermark = "5 minutes",
      size = "10 minutes", slide = Some("5 minutes"))
    val q = agg.writeStream.outputMode("append").format("memory").queryName("slidewin").start()
    input.addData((Timestamp.valueOf("2026-01-01 10:02:00"), "a"))
    q.processAllAvailable()
    input.addData((Timestamp.valueOf("2026-01-01 11:00:00"), "a")) // finalize both overlapping windows
    q.processAllAvailable()
    val finalStateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).last
    q.stop()
    val starts = spark.table("slidewin").select(col("window.start").cast("string")).collect().map(_.getString(0)).toSet
    // the 10:02 event belongs to two overlapping windows; both emitted on finalization
    assert(starts == Set("2026-01-01 09:55:00", "2026-01-01 10:00:00"))
    assert(finalStateRows <= 2, s"only the open 11:00-event windows may hold state (rows=$finalStateRows)")
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

  test("streaming CDC apply converges to the batch table under out-of-order delivery (st16)") {
    val tmp = Files.createTempDirectory("cdc").toString
    // the file carrying NEWER versions streams in the first microbatch;
    // the stale batch arrives after and must not overwrite newer state
    val newer = Seq(
      (1L, 11L, "upsert", 2.0), // key 1 final value
      (2L, 21L, "error", 0.0),  // key 2 tombstoned by its newest change
      (3L, 31L, "upsert", 9.0)  // key 3 re-inserted after older tombstone
    ).toDF("user_id", "event_id", "event_type", "value")
    val older = Seq(
      (1L, 10L, "upsert", 1.0),
      (2L, 20L, "upsert", 3.0),
      (3L, 30L, "error", 0.0),
      (4L, 40L, "upsert", 7.0)  // key 4 exists only in the stale batch
    ).toDF("user_id", "event_id", "event_type", "value")
    // single flat files (the file source does not recurse into subdirs)
    def writeOne(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val stage = Files.createTempDirectory("cdcstage").toString
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(dest)): Unit
    }
    writeOne(newer, s"$tmp/a.parquet")
    Thread.sleep(1100) // separate file mod-times so the source orders batches
    writeOne(older, s"$tmp/b.parquet")

    val got = StreamingJobs
      .streamingCdcApply(spark, tmp, glob = "*.parquet", maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(_._1)
    val batch = graft.operators.Upsert
      .cdcApply(newer.unionByName(older), Seq("user_id"), "event_id", "event_id",
        isDelete = col("event_type") === "error")
      .select("user_id", "event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq == batch.toSeq)
    assert(got.toSeq == Seq(
      (1L, 11L, "upsert", 2.0),
      (3L, 31L, "upsert", 9.0),
      (4L, 40L, "upsert", 7.0)))
  }

  test("streaming latency quantiles are rank-correct vs the exact batch twin (st17 vs a22)") {
    // window keys compared as engine-rendered UTC strings, never via
    // java.sql.Timestamp.toLocalDateTime (JVM-default-zone dependent —
    // the NTZ keys carry UTC wall-clock regardless of host TZ)
    def fmtKey(c: org.apache.spark.sql.Column) =
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    val stream = StreamingJobs.streamingLatencyQuantiles(spark, Sf0001)
      .select(fmtKey(col("hr_start")).as("k"), col("p50"), col("p95"), col("p99"), col("n_req"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val exactKeys = graft.queries.ExtraQueries.queries("a22_latency_quantiles")(spark, Sf0001)
      .select(fmtKey(col("hr_start")).as("k"), col("n_req"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stream.keySet == exactKeys.keySet)
    assert(stream.nonEmpty)
    // approx_percentile is NEAREST-RANK (returns a real data value; the
    // exact twin interpolates), and at accuracy=10000 with these window
    // sizes the sketch holds every value — so each reported quantile must
    // BE a window value whose rank is within 1 of the target rank
    val windows = graft.core.Tables(spark, Sf0001).events
      .select(fmtKey(date_trunc("hour", col("ts"))).as("hr"), col("value"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    stream.foreach { case (hr, (s50, s95, s99, sn)) =>
      val vals = windows(hr)
      assert(sn == vals.length && sn == exactKeys(hr), s"window $hr row count")
      Seq(0.5 -> s50, 0.95 -> s95, 0.99 -> s99).foreach { case (p, got) =>
        val target = p * (vals.length - 1)
        val candidates = vals.zipWithIndex
          .collect { case (v, i) if math.abs(i - target) <= 1.0 => v }
        assert(candidates.contains(got),
          s"$hr p$p: $got not within rank ±1 of target (candidates ${candidates.mkString(",")})")
      }
    }
  }
}
