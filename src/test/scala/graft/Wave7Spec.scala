package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, FuzzyJoin, Graph}
import graft.queries.EventGraphQueries

/** Wave 7: event analytics (funnel, cohort, rolling actives, MAD),
  * boilerplate removal, blocked fuzzy join, integer PageRank. */
class Wave7Spec extends SparkSpecBase {
  import spark.implicits._

  // ---- a23 funnel ---------------------------------------------------------

  test("a23 funnel: stage counts are monotone non-increasing and view conv is 1.0") {
    val out = EventGraphQueries.queries("a23_funnel")(spark, Sf0001)
      .orderBy("stage").collect()
    assert(out.length == 3)
    val users = out.map(_.getAs[Long]("users"))
    assert(users(0) >= users(1) && users(1) >= users(2))
    assert(out(0).getAs[Double]("conv_vs_first") == 1.0)
    assert(out.map(_.getAs[String]("stage_name")).toSeq == Seq("view", "click", "purchase"))
  }

  test("funnel ordering is strict: a click before the first view does not advance") {
    val e = Seq(
      (1L, "click", "2024-01-01 00:00:00"), // before the view — must not count
      (1L, "view", "2024-01-01 01:00:00"),
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-01 02:00:00"),
      (2L, "purchase", "2024-01-01 03:00:00")
    ).toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"), col("ts_s").cast("timestamp").as("ts"))
    val v = e.filter(col("event_type") === "view").groupBy("user_id").agg(min("ts").as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    assert(v.count() == 2)
    assert(c.count() == 1) // only user 2 clicked after viewing
    assert(c.select("user_id").as[Long].head() == 2L)
  }

  // ---- a24 cohort retention ----------------------------------------------

  test("a24 cohort: offset-0 actives sum to the distinct user count; offsets non-negative") {
    val out = EventGraphQueries.queries("a24_cohort_retention")(spark, Sf0001).collect()
    assert(out.forall(_.getAs[Long]("day_offset") >= 0L))
    val day0 = out.filter(_.getAs[Long]("day_offset") == 0L).map(_.getAs[Long]("active_users")).sum
    val users = graft.core.Tables(spark, Sf0001).events
      .select(countDistinct("user_id")).as[Long].head()
    // every user is active on their own cohort day by construction
    assert(day0 == users)
  }

  // ---- a25 rolling active users ------------------------------------------

  test("a25 rolling 7d actives: bounded below by daily actives, above by total users") {
    val e = graft.core.Tables(spark, Sf0001).events
    val daily = e.groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(countDistinct("user_id").as("dau"))
    val out = EventGraphQueries.queries("a25_rolling_active_users")(spark, Sf0001)
    val joined = out.join(daily, Seq("day")).collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getAs[Long]("au_7d") >= r.getAs[Long]("dau")))
    val total = e.select(countDistinct("user_id")).as[Long].head()
    assert(joined.forall(_.getAs[Long]("au_7d") <= total))
    // one row per day present in the data, no phantom trailing days
    assert(out.count() == daily.count())
  }

  test("a25b HLL rolling actives tracks the exact twin within sketch error") {
    val exact = EventGraphQueries.queries("a25_rolling_active_users")(spark, Sf0001)
    val approx = EventGraphQueries.queries("a25b_rolling_actives_hll")(spark, Sf0001)
    val joined = exact.join(approx, Seq("day")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val ex = r.getAs[Long]("au_7d").toDouble
      val est = r.getAs[Long]("au_7d_est").toDouble
      assert(math.abs(est - ex) / ex <= 0.05,
        s"day ${r.getAs[String]("day")}: est $est vs exact $ex") // lgK=12 ~1.6% typical
    }
    assert(exact.count() == approx.count())
  }

  // ---- a26 MAD outliers ---------------------------------------------------

  test("a26 MAD: hand-computed medians on a fixture; robust to one wild value") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 1000.0)
    ).toDF("event_type", "value")
    val med = graft.operators.Percentiles
      .exactByRange(df, "event_type", "value", Seq("med" -> 0.5))
      .select("med").as[Double].head()
    assert(med == 3.0) // median ignores the wild value
    val dev = df.withColumn("dev", abs(col("value") - lit(med)))
    val mad = graft.operators.Percentiles
      .exactByRange(dev, "event_type", "dev", Seq("mad" -> 0.5))
      .select("mad").as[Double].head()
    assert(mad == 1.0) // |devs| = 2,1,0,1,997 -> median 1
    // 1000 is the only point beyond 3 * 1.4826 * MAD of the median
    val flagged = dev.filter(col("dev") > lit(3.0) * lit(1.4826) * lit(mad)).count()
    assert(flagged == 1L)
  }

  test("a26 board entry emits one row per event_type with rate in [0,1]") {
    val out = EventGraphQueries.queries("a26_mad_outliers")(spark, Sf0001).collect()
    assert(out.length == 5)
    assert(out.forall { r =>
      val rate = r.getAs[Double]("outlier_rate"); rate >= 0.0 && rate <= 1.0
    })
    assert(out.forall(_.getAs[Long]("outliers") <= out.map(_.getAs[Long]("n")).max))
  }

  // ---- a27 last-touch attribution ----------------------------------------

  test("a27 attribution: inclusive as-of, latest click wins, unattributed stay null") {
    val e = Seq(
      (1L, "click", 10L, 100L), // user 1: click at t=1.0s
      (1L, "click", 11L, 2000000L), // later click at t=2.0s
      (1L, "purchase", 12L, 2000000L), // purchase at SAME instant — inclusive
      (2L, "purchase", 20L, 500L) // user 2: no click at all
    ).toDF("user_id", "event_type", "event_id", "ts_us")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id").as("purchase_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"),
        col("event_id").as("click_id"), col("ts_us").as("click_ts_us"))
    val out = graft.operators.AsOfJoin.asOfLeft(purchases, clicks, "user_id", "ts_us",
        Seq("click_id", "click_ts_us"), prefix = "")
      .orderBy("purchase_id").collect()
    assert(out(0).getAs[Long]("click_id") == 11L) // the equal-instant click, not the earlier one
    assert(out(1).isNullAt(out(1).fieldIndex("click_id"))) // user 2 unattributed
  }

  test("a27 board entry: latency non-negative, every purchase appears exactly once") {
    val out = EventGraphQueries.queries("a27_attribution")(spark, Sf0001)
    val rows = out.collect()
    val purchases = graft.core.Tables(spark, Sf0001).events
      .filter(col("event_type") === "purchase").count()
    assert(rows.length.toLong == purchases)
    assert(rows.filter(!_.isNullAt(5)).forall(_.getAs[Long]("latency_us") >= 0L))
  }

  // ---- x15 purged temporal split -----------------------------------------

  test("x15 purged split: train strictly precedes the embargo, test strictly follows it") {
    val out = graft.queries.AdvancedQueries.queries("x15_purged_time_split")(spark, Sf0001)
      .collect().map(r => r.getAs[String]("split") -> r).toMap
    assert(out.contains("train") && out.contains("test"))
    assert(out("train").getAs[String]("last_day") < "2024-01-20")
    assert(out("test").getAs[String]("first_day") >= "2024-01-22")
    out.get("embargo").foreach { r =>
      assert(r.getAs[String]("first_day") >= "2024-01-20")
      assert(r.getAs[String]("last_day") < "2024-01-22")
    }
    val total = out.values.map(_.getAs[Long]("n_events")).sum
    assert(total == graft.core.Tables(spark, Sf0001).events.count())
  }

  // ---- d16 boilerplate ----------------------------------------------------

  test("d16 boilerplate removes shared chunks EVERYWHERE, unlike d15 keep-first") {
    val shared = (1 to 16).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared), (2L, shared), (3L, shared), // df=3 -> boilerplate
      (4L, (1 to 16).map(i => s"u$i").mkString(" ")) // unique chunk
    ).toDF("doc_id", "text")
    val bp = Dedup.boilerplateChunkStats(docs, "doc_id", "text", 16, 4, 3)
      .orderBy("doc_id").collect()
    // ALL THREE sharers lose the chunk — including doc 1, which d15 keeps
    assert(bp.take(3).forall(_.getAs[Long]("boilerplate_chunks") == 1L))
    assert(bp(3).getAs[Long]("boilerplate_chunks") == 0L)
    val dd = Dedup.paragraphDedupStats(docs, "doc_id", "text", 16, 4)
      .orderBy("doc_id").collect()
    assert(dd(0).getAs[Long]("dropped_chunks") == 0L) // keep-first keeps doc 1
    assert(dd(1).getAs[Long]("dropped_chunks") == 1L)
  }

  test("d16 respects the min-token floor and the df threshold") {
    val tiny = "a b" // 2 tokens < minChunkTokens floor
    val docs = Seq((1L, tiny), (2L, tiny), (3L, tiny), (4L, tiny)).toDF("doc_id", "text")
    val out = Dedup.boilerplateChunkStats(docs, "doc_id", "text", 16, 4, 3).collect()
    assert(out.forall(_.getAs[Long]("boilerplate_chunks") == 0L)) // floor protects
    val pair = Seq((1L, (1 to 16).map("x" + _).mkString(" ")),
      (2L, (1 to 16).map("x" + _).mkString(" "))).toDF("doc_id", "text")
    val out2 = Dedup.boilerplateChunkStats(pair, "doc_id", "text", 16, 4, 3).collect()
    assert(out2.forall(_.getAs[Long]("boilerplate_chunks") == 0L)) // df=2 < threshold 3
  }

  test("d16 token conservation: kept + removed == total tokens per doc") {
    val out = EventGraphQueries.queries("d16_boilerplate")(spark, Sf0001)
    val docs = graft.core.Tables(spark, Sf0001).documents
      .select(col("doc_id"), size(split(col("text"), " ", -1)).cast("long").as("n_tok"))
    val bad = out.join(docs, Seq("doc_id"))
      .filter(col("kept_tokens") + col("removed_tokens") =!= col("n_tok"))
      .count()
    assert(bad == 0L)
  }

  // ---- d17 fuzzy join -----------------------------------------------------

  test("d17 blocked levenshtein: exact distances, ordered pairs, block cap honored") {
    val df = Seq(
      (1L, "red widget", "widget", 5),
      (2L, "ted widget", "widget", 5), // dist 1 from red widget
      (3L, "rad widget", "widget", 5), // dist 1 from red widget, 2 from ted
      (4L, "red widget", "widget", 9), // different block (size)
      (5L, "red gear", "gear", 5) // different block (noun)
    ).toDF("id", "name", "noun", "sz")
    val out = FuzzyJoin.blockedLevenshtein(df, "id", "name",
      Seq("noun", "sz"), maxDist = 3, maxBlock = Some(1000))
      .orderBy("id_a", "id_b").collect()
    val pairs = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("dist")))
    assert(pairs.toSeq == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
    // cap: shrink maxBlock below the block size -> block dropped whole
    val capped = FuzzyJoin.blockedLevenshtein(df, "id", "name",
      Seq("noun", "sz"), maxDist = 3, maxBlock = Some(2))
    assert(capped.count() == 0L)
  }

  test("d17 board entry: symmetric-free (a<b), within-threshold, nonzero at sf0.001") {
    val out = EventGraphQueries.queries("d17_fuzzy_join")(spark, Sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(rows.forall(_.getAs[Long]("dist") <= 3L))
  }

  // ---- a28 seasonal-naive backtest ---------------------------------------

  test("a28 backtest: perfect weekly seasonality scores zero error; scale check") {
    // synthetic: counts repeat with period 7 -> seasonal naive is exact
    val days = (0 until 21).flatMap { d =>
      val day = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d))
      Seq.fill(1 + (d % 7))(("a", day))
    }
    val daily = days.toDF("event_type", "day")
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val pred = daily.select(col("event_type"), date_add(col("day"), 7).as("day"), col("c").as("pred"))
    val joined = daily.join(pred, Seq("event_type", "day"))
    assert(joined.count() == 14) // days 8..21 have a 7-day ancestor
    assert(joined.filter(col("c") =!= col("pred")).count() == 0) // exact repeat -> 0 error
    val board = EventGraphQueries.queries("a28_forecast_backtest")(spark, Sf0001).collect()
    assert(board.length == 5)
    board.foreach { r =>
      assert(r.getAs[Double]("wmape") >= 0.0 && r.getAs[Double]("mae") >= 0.0)
      assert(r.getAs[Long]("n_eval_days") > 0L)
    }
  }

  // ---- x16 seeded-DP noisy counts ----------------------------------------

  test("x16 DP release: deterministic across runs, noise bounded by the u16 grid") {
    val a = EventGraphQueries.queries("x16_dp_noisy_counts")(spark, Sf0001)
      .orderBy("event_type", "day").collect().map(_.toSeq).toSeq
    val b = EventGraphQueries.queries("x16_dp_noisy_counts")(spark, Sf0001)
      .orderBy("event_type", "day").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty) // seeded noise: a re-run cannot re-randomize
    // |Laplace via inverse CDF on the 16-bit grid| <= ln(65536) ~ 11.1 at eps=1
    val truth = graft.core.Tables(spark, Sf0001).events
      .groupBy(col("event_type"), date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("c"))
    val joined = EventGraphQueries.queries("x16_dp_noisy_counts")(spark, Sf0001)
      .join(truth, Seq("event_type", "day")).collect()
    assert(joined.forall(r =>
      math.abs(r.getAs[Double]("noisy_count") - r.getAs[Long]("c")) <= 12.0))
    // and the noise is actually nonzero somewhere (it IS a DP release)
    assert(joined.exists(r =>
      math.abs(r.getAs[Double]("noisy_count") - r.getAs[Long]("c")) > 1e-6))
  }

  // ---- a29 CUSUM changepoint ---------------------------------------------

  test("a29 CUSUM: drawdown identity flags a level shift and stays quiet on a flat series") {
    def series(name: String, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, i) => Seq.fill(c)((name, f"2024-01-${i + 1}%02d"))
    }
    val e = (series("flat", Seq.fill(14)(10)) ++
      series("shift", Seq.fill(7)(10) ++ Seq.fill(7)(30)))
      .toDF("event_type", "day_s")
      .select(col("event_type"), col("day_s").cast("date").as("d"))
      .select(col("event_type"), lit(1L).as("user_id"),
        (col("d").cast("timestamp")).as("ts"))
    val daily = e.groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("c"))
    val byType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val ordered = byType.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val mean = sum(col("c").cast("decimal(28,6)")).over(byType).cast("double") /
      count(lit(1)).over(byType)
    val out = daily.withColumn("dev", col("c") - mean)
      .withColumn("srun", sum(col("dev")).over(ordered))
      .withColumn("cusum_pos",
        col("srun") - least(lit(0.0), min(col("srun")).over(ordered)))
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Double]("cusum_pos"))).toSeq
    assert(out.filter(_._1 == "flat").forall(_._3 == 0.0)) // dev==0 everywhere
    val shiftTail = out.filter(t => t._1 == "shift" && t._2 >= "2024-01-12")
    assert(shiftTail.forall(_._3 > 20.0)) // post-shift cusum accumulates
    val board = EventGraphQueries.queries("a29_cusum_changepoint")(spark, Sf0001).collect()
    assert(board.nonEmpty && board.forall(_.getAs[Double]("cusum_pos") >= -1e-9))
  }

  // ---- j11 interval-overlap join -----------------------------------------

  test("overlapByDay: exact closed-interval semantics, multi-day pairs dedup") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val sessions = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // overlaps A
      (2L, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")), // spans midnight, overlaps B twice-bucketed
      (3L, ts("2024-01-03 10:00:00"), ts("2024-01-03 10:30:00")), // overlaps nothing
      (4L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00")) // touches A's end exactly (closed)
    ).toDF("sid", "s_start", "s_end")
    val incidents = Seq(
      (100L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")), // A
      (200L, ts("2024-01-01 23:30:00"), ts("2024-01-02 00:30:00")) // B
    ).toDF("incident_id", "i_start", "i_end")
    val pairs = graft.operators.IntervalJoin.overlapByDay(
        sessions, "s_start", "s_end", incidents, "i_start", "i_end")
      .select("sid", "incident_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // session 2 × incident B share TWO day buckets -> must appear ONCE
    assert(pairs == Seq((1L, 100L), (2L, 200L), (4L, 100L)))
    // differential: equals the naive theta join on the same data
    val naive = sessions.crossJoin(incidents)
      .filter(col("s_start") <= col("i_end") && col("i_start") <= col("s_end"))
      .select("sid", "incident_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs == naive)
  }

  test("RangeRank.countRef: exact searchsorted semantics, strict and non-strict, ties and nulls") {
    val ref = Seq(10L, 20L, 20L, 30L).toDF("v")
    val probes = Seq((1L, java.lang.Long.valueOf(5L)), (2L, java.lang.Long.valueOf(20L)),
      (3L, java.lang.Long.valueOf(35L)), (4L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "x")
    val leq = graft.operators.RangeRank.countRef(ref, "v", probes, "x", "n", strict = false)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(leq == Map(1L -> 0L, 2L -> 3L, 3L -> 4L, 4L -> -1L)) // 20 counts BOTH 20s
    val less = graft.operators.RangeRank.countRef(ref, "v", probes, "x", "n", strict = true)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(less == Map(1L -> 0L, 2L -> 1L, 3L -> 4L, 4L -> -1L)) // strict excludes the 20s
  }

  test("j11 rank-lookup counts equal the pair-enumeration counts (differential)") {
    val e = graft.core.Tables(spark, Sf0001).events
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sessions = e
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val incidents = e.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"),
        (col("ts") - expr("INTERVAL 30 MINUTES")).as("i_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("i_end"))
    val pairCounts = graft.operators.IntervalJoin.overlapByDay(
        sessions, "s_start", "s_end", incidents, "i_start", "i_end")
      .groupBy("user_id", "session_seq")
      .agg(countDistinct(col("incident_id")).as("n"))
    val viaPairs = sessions.join(pairCounts, Seq("user_id", "session_seq"), "left")
      .select(col("user_id"), col("session_seq"), coalesce(col("n"), lit(0L)).as("n_incidents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaRanks = EventGraphQueries.queries("j11_overlap_join")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaRanks == viaPairs && viaRanks.nonEmpty)
  }

  test("j11 board entry: every session appears once; incident counts non-negative") {
    val out = EventGraphQueries.queries("j11_overlap_join")(spark, Sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.length.toLong == out.select("user_id", "session_seq").distinct().count())
    assert(rows.forall(_.getAs[Long]("n_incidents") >= 0L))
    assert(rows.exists(_.getAs[Long]("n_incidents") > 0L)) // incidents do land in sessions
  }

  // ---- st21 streaming DP release -----------------------------------------

  test("st21 releases deterministic noisy counts and hides the raw series") {
    val a = graft.queries.StreamingQueries.queries("st21_stream_dp_release")(spark, Sf0001)
      .orderBy("event_type", "hr_start").collect().map(_.toSeq).toSeq
    val b = graft.queries.StreamingQueries.queries("st21_stream_dp_release")(spark, Sf0001)
      .orderBy("event_type", "hr_start").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty) // seeded: replays exactly
    val schema = graft.queries.StreamingQueries.queries("st21_stream_dp_release")(spark, Sf0001).schema
    assert(!schema.fieldNames.contains("event_cnt")) // raw counts not published
  }

  // ---- u11 incremental rollup maintenance --------------------------------

  test("u11 merge of partial states equals the full recompute, at any split") {
    import graft.operators.IncrementalRollup
    val e = graft.core.Tables(spark, Sf0001).events
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"), col("event_id"))
    val keys = Seq("event_type", "day")
    val specs: IncrementalRollup.Spec =
      Seq(("value", "count"), ("value", "sum"), ("value", "min"), ("value", "max"))
    val full = IncrementalRollup.partial(e, keys, specs)
      .orderBy("event_type", "day").collect().map(_.toSeq).toSeq
    // 2-way split on an arbitrary non-temporal predicate
    val two = IncrementalRollup.merge(Seq(
        IncrementalRollup.partial(e.filter(col("event_id") % 2 === 0), keys, specs),
        IncrementalRollup.partial(e.filter(col("event_id") % 2 =!= 0), keys, specs)),
      keys, specs).orderBy("event_type", "day").collect().map(_.toSeq).toSeq
    // hierarchical: merge of merges (3-way, then fold)
    val parts = (0 to 2).map(i =>
      IncrementalRollup.partial(e.filter(col("event_id") % 3 === i), keys, specs))
    val folded = IncrementalRollup.merge(
      Seq(IncrementalRollup.merge(parts.take(2), keys, specs), parts(2)), keys, specs)
      .orderBy("event_type", "day").collect().map(_.toSeq).toSeq
    // decimal sums make these EXACT equalities, not approximate ones
    def noDec(rows: Seq[Seq[Any]]) = rows.map(_.map {
      case d: java.math.BigDecimal => d.stripTrailingZeros
      case x => x
    })
    assert(noDec(two) == noDec(full))
    assert(noDec(folded) == noDec(full))
  }

  test("u11 rejects non-algebraic aggregate kinds") {
    import graft.operators.IncrementalRollup
    val e = graft.core.Tables(spark, Sf0001).events
    intercept[IllegalArgumentException] {
      IncrementalRollup.partial(e, Seq("event_type"), Seq(("value", "median")))
    }
  }

  // ---- dirt tolerance (null user / type / ts in the event family) --------

  test("event operators tolerate null user_id/event_type/ts rows without crashing") {
    val clean = Seq(
      (java.lang.Long.valueOf(1L), "view", "2024-01-01 01:00:00"),
      (java.lang.Long.valueOf(1L), "click", "2024-01-01 02:00:00"),
      (java.lang.Long.valueOf(1L), "purchase", "2024-01-01 03:00:00"))
    val dirty = Seq(
      (null.asInstanceOf[java.lang.Long], "view", "2024-01-01 01:00:00"), // null user
      (java.lang.Long.valueOf(2L), null, "2024-01-01 01:00:00"), // null type
      (java.lang.Long.valueOf(3L), "view", null)) // null ts
    val e = (clean ++ dirty).toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"), col("ts_s").cast("timestamp").as("ts"))
    // funnel shape: null-type rows never match a stage filter; null-ts
    // views are skipped by min(ts); nothing throws
    val v = e.filter(col("event_type") === "view").groupBy("user_id").agg(min("ts").as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    assert(c.count() == 1) // only the clean user converts
    // cohort shape: null ts yields a null cohort date, null user its own group
    val cohorts = e.groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_date"))
    assert(cohorts.count() == 4) // users 1,2,3 and the null group
    // sessionize via the board x2 window shape: no NPE on null ts ordering
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts")
    assert(e.withColumn("prev", lag("ts", 1).over(w)).count() == 6)
  }

  // ---- s11 MIPS and the augmentation reduction ---------------------------

  test("s11 MIPS reduces to cosine search via the Shrivastava-Li augmentation") {
    import graft.operators.Similarity
    val e = graft.core.Tables(spark, Sf0001).embeddings
    val q = e.filter(col("vec_id") < 10)
    val direct = Similarity.mipsTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._3)).toSeq
    // augment: corpus gets sqrt(M^2 - |x|^2) appended, queries get 0 —
    // cosine order of the augmented vectors == dot order of the originals
    val dotSelf = graft.plans.VectorExpressions
      .vector_dot(col("embedding"), col("embedding"))
    val m2 = e.agg(max(dotSelf).as("m2"))
    val corpusAug = e.crossJoin(broadcast(m2)).select(col("vec_id"),
      concat(col("embedding"), array(sqrt(col("m2") - dotSelf).cast("float"))).as("embedding"))
    val qAug = q.select(col("vec_id"),
      concat(col("embedding"), array(lit(0.0f))).as("embedding"))
    val viaCosine = Similarity.bruteForceTopK(corpusAug, qAug, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._3)).toSeq
    assert(direct.nonEmpty && direct == viaCosine)
  }

  // ---- st19 streaming funnel ---------------------------------------------

  test("st19 streaming funnel card equals the a23 batch card (stream == batch)") {
    val batch = EventGraphQueries.queries("a23_funnel")(spark, Sf0001)
      .orderBy("stage").collect().map(_.toSeq).toSeq
    val stream = graft.queries.StreamingQueries.queries("st19_stream_funnel")(spark, Sf0001)
      .orderBy("stage").collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("st20 streaming attribution equals the a27 batch card (stream == batch)") {
    val batch = EventGraphQueries.queries("a27_attribution")(spark, Sf0001)
      .orderBy("purchase_id").collect().map(_.toSeq).toSeq
    val stream = graft.queries.StreamingQueries.queries("st20_stream_attribution")(spark, Sf0001)
      .orderBy("purchase_id").collect().map(_.toSeq).toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  // ---- g1 PageRank --------------------------------------------------------

  test("labelPropagation: two cliques joined by one bridge resolve to two communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10; symmetric edges
    val cl = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val edges = cl.toDF("a", "b")
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
    val out = Graph.labelPropagation(sym, "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 6)
    assert(out(1L) == out(2L) && out(2L) == out(3L)) // clique 1 agrees
    assert(out(10L) == out(11L) && out(11L) == out(12L)) // clique 2 agrees
    assert(out(1L) != out(10L)) // the bridge does not merge them
  }

  test("labelPropagation is deterministic across partitionings") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("a", "b")
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
    val x = Graph.labelPropagation(sym, "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val y = Graph.labelPropagation(sym.repartition(13), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(x == y && x.nonEmpty)
  }

  test("pageRankInt fixed point: a symmetric 2-cycle keeps rank exactly at scale") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = Graph.pageRankInt(edges, "src", "dst", iterations = 5).collect()
    assert(out.length == 2)
    // r' = 0.15 + 0.85 * r with outdeg 1 -> fixed point 1.0 (integer-exact)
    assert(out.forall(_.getAs[Long]("rank") == 1000000000L))
  }

  test("pageRankInt: star hub outranks leaves; ranks bounded below by the base") {
    // leaves 2..5 all point at hub 1; hub points back at leaf 2
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L)).toDF("src", "dst")
    val ranks = Graph.pageRankInt(edges, "src", "dst", iterations = 5)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank")).toMap
    assert(ranks(1L) > ranks(3L) && ranks(1L) > ranks(4L))
    assert(ranks(2L) > ranks(3L)) // leaf 2 receives the hub's mass
    assert(ranks.values.forall(_ >= 150000000L))
  }

  test("pageRankInt is deterministic across runs and partitionings") {
    val t = graft.core.Tables(spark, Sf0001)
    val pairs = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(t.lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(pairs.select(col("p").as("src"), col("c").as("dst")))
    val a = Graph.pageRankInt(edges, "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.pageRankInt(edges.repartition(17), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
