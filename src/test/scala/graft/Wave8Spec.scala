package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, IntervalJoin, RangeRank}
import graft.plans.BoundsRank

/** Round-7 hardening wave: CUSUM canonical-recursion equivalence, the
  * overlapByDay degenerate-bucket guard, countRef reserved-name guard,
  * BoundsRank binary-search differential, and canonical label
  * propagation on non-symmetric graphs.
  */
class Wave8Spec extends SparkSpecBase {

  import spark.implicits._

  // ---- a29 CUSUM: drawdown identity == max(0, prev + dev) recursion ------

  test("CUSUM drawdown identity matches the canonical recursion when all prefix sums stay positive") {
    // Rising series: dev > 0 from day one, so the running sum NEVER dips
    // below 0 — the exact case where the pre-fix variant (min without the
    // S(0)=0 anchor) understated the statistic by S(1).
    val counts = Seq(30, 31, 29, 35, 40, 45, 50)
    val daily = counts.zipWithIndex
      .map { case (c, i) => ("t", f"2024-02-${i + 1}%02d", c.toLong) }
      .toDF("event_type", "day", "c")
    val byType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val ordered = byType.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val mean = sum(col("c").cast("decimal(28,6)")).over(byType).cast("double") /
      count(lit(1)).over(byType)
    val engine = daily
      .withColumn("dev", col("c") - mean)
      .withColumn("srun", sum(col("dev")).over(ordered))
      .withColumn("cusum_pos",
        col("srun") - least(lit(0.0), min(col("srun")).over(ordered)))
      .orderBy("day")
      .collect().map(_.getAs[Double]("cusum_pos")).toSeq

    // driver-side canonical recursion: cusum(0)=0; cusum(d)=max(0, cusum(d-1)+dev(d))
    val m = counts.sum.toDouble / counts.length
    val expected = counts.map(_ - m).scanLeft(0.0)((acc, dev) => math.max(0.0, acc + dev)).tail
    engine.zip(expected).foreach { case (e, x) => assert(math.abs(e - x) < 1e-9, s"$e vs $x") }
    // the understated variant would differ here (first dev is negative of
    // mean-shift but the tail accumulates): sanity that the series is the
    // interesting one — at least one cusum value strictly positive on day 1
    assert(expected.head != 0.0 || expected.exists(_ > 0.0))
  }

  // ---- overlapByDay degenerate-bucket guard -------------------------------

  test("overlapByDay drops a day bucket whose pair product exceeds the cap, keeps the rest") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // hot day: 30 x 30 = 900 candidate pairs on 2024-01-01; quiet day: 1 x 1
    val hotL = (1 to 30).map(i => (i.toLong, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
    val l = (hotL :+ (99L, ts("2024-01-05 10:00:00"), ts("2024-01-05 11:00:00")))
      .toDF("lid", "l_start", "l_end")
    val hotR = (1 to 30).map(i => (100L + i, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")))
    val r = (hotR :+ (999L, ts("2024-01-05 10:30:00"), ts("2024-01-05 12:00:00")))
      .toDF("rid", "r_start", "r_end")

    val guarded = IntervalJoin.overlapByDay(l, "l_start", "l_end", r, "r_start", "r_end",
      maxPairsPerBucket = 100L, dropOverflowBuckets = true)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    // with the explicit lossy opt-in the 900-pair day is dropped; the
    // quiet day survives
    assert(guarded == Seq((99L, 999L)))

    // default = fail loudly: an over-cap bucket raises with the day and
    // its pair product instead of silently truncating the pair list
    val err = intercept[Exception] {
      IntervalJoin.overlapByDay(l, "l_start", "l_end", r, "r_start", "r_end",
        maxPairsPerBucket = 100L).count()
    }
    val msg = Option(err.getMessage).getOrElse("") +
      Option(err.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxPairsPerBucket") && msg.contains("2024-01-01"))

    val unguarded = IntervalJoin.overlapByDay(l, "l_start", "l_end", r, "r_start", "r_end",
      maxPairsPerBucket = Long.MaxValue)
    assert(unguarded.count() == 901L)
    // default cap (10M) leaves small workloads untouched
    val default = IntervalJoin.overlapByDay(l, "l_start", "l_end", r, "r_start", "r_end")
    assert(default.count() == 901L)
  }

  // ---- countRef reserved-name guard ---------------------------------------

  test("countRef rejects probe frames whose columns collide with its internal names") {
    val ref = Seq(1L, 2L).toDF("v")
    val probes = Seq((1L, 2L)).toDF("id", "_cnt")
    val e = intercept[IllegalArgumentException] {
      RangeRank.countRef(ref, "v", probes, "id", "out", strict = false)
    }
    assert(e.getMessage.contains("_cnt"))
  }

  // ---- BoundsRank binary search == linear array-filter probe --------------

  test("bounds_rank matches the linear filter probe on edges, ties, gaps, NaN, null") {
    val bounds = Array(-3.5, 0.0, 2.0, 7.25, 100.0)
    val vals: Seq[java.lang.Double] = Seq(
      -10.0, -3.5, -3.4999, 0.0, 1.0, 2.0, 5.0, 7.25, 99.0, 100.0, 1e9,
      Double.NaN, null)
    val df = vals.toDF("v")
    val out = df.select(
      col("v"),
      BoundsRank.bounds_rank(col("v"), bounds).as("fast"),
      size(filter(array(bounds.map(lit(_)): _*), b => b <= col("v"))).as("slow"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1)) // null in -> null out
      else {
        // Spark comparison order: NaN > everything, so the array filter
        // returns B for NaN — the binary search's total order agrees
        assert(r.getInt(1) == r.getInt(2), s"v=${r.get(0)}: fast=${r.get(1)} slow=${r.get(2)}")
      }
    }
    // scalar sanity across every insertion point
    for (v <- Seq(-4.0, -3.5, -1.0, 0.0, 0.5, 2.0, 3.0, 7.25, 50.0, 100.0, 101.0)) {
      assert(BoundsRank.compute(v, bounds) == bounds.count(_ <= v))
    }
    assert(BoundsRank.compute(Double.NaN, bounds) == bounds.length)
    // signed zeros: the primitive <= probe this replaces equates -0.0 and
    // 0.0; binarySearch's total order does not — the probe key is
    // canonicalized so a -0.0 probe still counts a +0.0 boundary (and a
    // -0.0 boundary is counted by a +0.0 probe natively)
    assert(BoundsRank.compute(-0.0, Array(0.0)) == 1)
    assert(BoundsRank.compute(0.0, Array(-0.0)) == 1)
    assert(BoundsRank.compute(-0.0, Array(-0.0)) == 1)
    assert(BoundsRank.compute(-1.0, Array(-0.0, 1.0)) == 0)
  }

  // ---- incremental LSH dedup vs batch equivalence --------------------------

  test("incrementalNearDup over a parquet round-tripped index == the cross-batch slice of batch LSH") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120).cache()
    val mid = docs.agg(max("doc_id")).collect()(0).getLong(0) / 2
    val oldDocs = docs.filter(col("doc_id") <= mid)
    val newDocs = docs.filter(col("doc_id") > mid)

    // yesterday's job: build + persist the signature index; today: re-read
    val dir = "/tmp/graft_wave8_lsh_index"
    Dedup.portableSignatures(oldDocs, "doc_id", "text", n = 3, k = 32)
      .write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)

    val (matches, admitted) = Dedup.incrementalNearDup(index, newDocs, "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.5)
    val inc = matches.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // batch LSH over the UNION, restricted to cross-batch pairs, must agree
    val batch = Dedup.minHashLshPairsPortable(docs, "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.5)
      .filter((col("id_a") <= mid && col("id_b") > mid) ||
        (col("id_b") <= mid && col("id_a") > mid))
      .collect()
      .map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (a > mid) (a, b, r.getDouble(2)) else (b, a, r.getDouble(2))
      }.toSet
    assert(inc == batch, s"incremental=${inc.size} batch=${batch.size}")

    // admitted = exactly the unmatched new docs (the keep-first index delta)
    val matchedNew = inc.map(_._1)
    val admittedIds = admitted.select("doc_id").collect().map(_.getLong(0)).toSet
    val newIds = newDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admittedIds == newIds -- matchedNew)
    // and admitted rows carry the full signature schema, appendable as-is
    assert(admitted.columns.toSet == index.columns.toSet)
    docs.unpersist()
  }

  test("fast (xxhash64) incremental near-dup == the cross-batch slice of fast batch LSH") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120).cache()
    val mid = docs.agg(max("doc_id")).collect()(0).getLong(0) / 2
    val oldSigs = Dedup.minHashSignatures(docs.filter(col("doc_id") <= mid), "doc_id", "text", 3, 32)
    val newSigs = Dedup.minHashSignatures(docs.filter(col("doc_id") > mid), "doc_id", "text", 3, 32)
    val inc = Dedup.incrementalNearDupFromSigs(oldSigs, newSigs, 32, 8, 0.5, portable = false)
      ._1.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.5)
      .filter((col("id_a") <= mid && col("id_b") > mid) ||
        (col("id_b") <= mid && col("id_a") > mid))
      .collect()
      .map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (a > mid) (a, b, r.getDouble(2)) else (b, a, r.getDouble(2))
      }.toSet
    assert(inc == batch, s"incremental=${inc.size} batch=${batch.size}")
    assert(inc.nonEmpty)
    docs.unpersist()
  }

  // ---- heavy hitters: CMS candidates + exact recount == naive ------------

  test("frequentKeys == naive groupBy-count at every sketch size, including degenerate width=1") {
    import graft.operators.HeavyHitters
    val grams = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .repartition(7) // answer must not depend on partitioning
      .cache()
    val naive = grams.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 300)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    // width=1: EVERY key collides into one counter, est = total tokens —
    // zero pruning, but the exact recount must still give the true set
    for ((dep, w) <- Seq((3, 4096), (1, 64), (2, 1))) {
      val got = HeavyHitters.frequentKeys(grams, "tok", minCount = 300L, depth = dep, width = w)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == naive, s"depth=$dep width=$w: got ${got.size} vs ${naive.size}")
    }
    grams.unpersist()
  }

  test("frequentKeys above the max count is empty, and guards reject bad params") {
    import graft.operators.HeavyHitters
    val keys = Seq("a", "a", "b").toDF("k")
    assert(HeavyHitters.frequentKeys(keys, "k", minCount = 3L).isEmpty)
    assert(HeavyHitters.frequentKeys(keys, "k", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet == Set(("a", 2L)))
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentKeys(keys, "k", minCount = 0L)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentKeys(keys, "k", minCount = 1L, depth = 0)
    }
  }

  // ---- w8 gap-fill + forward-fill properties ------------------------------

  test("gapfill emits each user's full day span, preserves observed values, fills gaps with the prior value") {
    val out = graft.SparkEntry.queries("w8_gapfill_ffill")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    val byUser = out.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // contiguous calendar span: n rows == days between first and last + 1
      val lo = java.time.LocalDate.parse(sorted.head._2)
      val hi = java.time.LocalDate.parse(sorted.last._2)
      assert(sorted.length == java.time.temporal.ChronoUnit.DAYS.between(lo, hi) + 1)
      // first day of a span is an observation by construction
      assert(sorted.head._4 == 1)
      // forward-fill: every gap day carries the previous day's value
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur._4 == 0 => assert(cur._3 == prev._3)
        case _ =>
      }
    }
    // the fixture actually HAS gaps, or the fill assertions are vacuous
    assert(out.exists(_._4 == 0))
  }

  // ---- st22: the streamed index grows by ADMITTED docs only ---------------

  test("streaming incremental near-dup: matched docs never enter the index, admitted ones do") {
    // batches by doc_id mod 3 — A(0)∈b0; B(1),D(4)∈b1; C(2),E(5)∈b2.
    // B==A  -> matched vs A, NOT admitted.
    // C==A  -> must match against A ONLY: a (C,B) pair would prove the
    //          matched B leaked into the index (keep-first violated).
    // D unique -> admitted; E==D -> must match D: admitted batch-1 docs
    //          ARE probed by batch 2.
    val dir = "/tmp/graft_wave8_st22_fixture"
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (4L, "one two three four five six seven"),
      (5L, "one two three four five six seven")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.streaming.StreamingJobs.streamingIncrementalNearDup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 0L, 1.0), (2L, 0L, 1.0), (5L, 4L, 1.0)))

    // nBatches=4 leaves residue class 3 empty (no id ≡ 3 mod 4): the
    // missing batch must be a no-op, not a staging crash. New batching:
    // b0={A,D} admitted, b1={B==A, E==D} both matched, b2={C==A} matched.
    val got4 = graft.streaming.StreamingJobs.streamingIncrementalNearDup(spark, dir, nBatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got4 == Set((1L, 0L, 1.0), (2L, 0L, 1.0), (5L, 4L, 1.0)))
  }

  test("streaming near-dup compaction cadence fires in-flight, probe results identical") {
    // 12 distinct docs over K=6 batches, every one admitted (no matches):
    // the index accumulates the initial file plus per-batch deltas named
    // delta_<batchId>_*. With cadence N=4 the one in-flight firing is at
    // batchId 3 — afterwards the pre-batch-4 fragments are FOLDED (their
    // delta_0..3 names replaced by compacted part-* files) while batches
    // 4 and 5 land as fresh deltas the post-drain threshold leaves alone.
    // Name-based assertions separate the in-flight firing from the
    // post-drain pass, which a bare file count cannot. Match results must
    // be identical to the cadence-off run (compaction is probe-neutral:
    // signature rows are key-unique and order-free).
    val dir = "/tmp/graft_wave8_st22_cadence"
    val words = Seq("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen",
      "ibis", "jay", "kite", "lark", "mole", "newt", "owl", "pug")
    Seq.tabulate(12) { i =>
      (i.toLong, (0 until 8).map(j => words((i * 3 + j * 5) % words.length) + i).mkString(" "))
    }.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // explicit staging dirs (stagingBase param): the run's index listing
    // is read from a path THIS test owns, not guessed by mtime over
    // shared /tmp where a concurrent bench/test JVM's dir could win
    def indexNames(base: String): Seq[String] =
      Option(new java.io.File(base, "index").listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(n => n.endsWith(".parquet") && !n.startsWith("_")).toSeq

    val k = 6
    // control: cadence off, post-drain threshold too high to fire — the
    // raw fragmentation shape (initial file + every delta still present)
    val baseOff = s"$dir/staging_off"
    val off = graft.streaming.StreamingJobs
      .streamingIncrementalNearDup(spark, dir, nBatches = k,
        compactEveryNBatches = 0, compactMaxFiles = 100,
        stagingBase = Some(baseOff))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val namesOff = indexNames(baseOff)
    assert((0 until k).forall(b => namesOff.exists(_.startsWith(s"delta_${b}_"))),
      s"control run should keep every delta: $namesOff")

    // derive the threshold from the control run's observed fragmentation
    // (delta multiplicity = non-empty shuffle partitions per admit write,
    // identical across runs — same data, same plans): the in-flight point
    // (entry of batch 4 since round 15 — crash-safe placement, same file
    // set the old exit-of-batch-3 point saw) sees initial + delta_0..3
    // files and must exceed the threshold; the post-drain pass sees the
    // compacted file + delta_4..5 and must not
    val perDelta = (0 until k).map(b => namesOff.count(_.startsWith(s"delta_${b}_")))
    val fireCount = (namesOff.size - perDelta.sum) + perDelta.take(4).sum
    val baseOn = s"$dir/staging_on"
    val on = graft.streaming.StreamingJobs
      .streamingIncrementalNearDup(spark, dir, nBatches = k,
        compactEveryNBatches = 4, compactMaxFiles = fireCount - 1,
        stagingBase = Some(baseOn))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val namesOn = indexNames(baseOn)
    assert(on == off, s"cadence changed match results: $on vs $off")
    assert((0 until 4).forall(b => !namesOn.exists(_.startsWith(s"delta_${b}_"))),
      s"in-flight cadence at batch 3 should have folded delta_0..3: $namesOn")
    assert(Seq(4, 5).forall(b => namesOn.exists(_.startsWith(s"delta_${b}_"))),
      s"tail deltas past the last cadence point should survive post-drain: $namesOn")
    assert(namesOn.size < namesOff.size,
      s"cadence should shrink the index listing: $namesOn vs $namesOff")
  }

  // ---- em_snapshots: every SCD2 merge path is exercised -------------------

  test("em_snapshots replay hits all four merge paths in each of the three snapshots") {
    val rows = graft.queries.EmModelQueries.queries("em_snapshots")(spark, Sf0001)
      .collect().map { r =>
        (r.getAs[String]("snapshot_name"), r.getAs[String]("payload_attr"),
          r.getAs[String]("valid_from"), Option(r.getAs[String]("valid_to")),
          r.getAs[Boolean]("is_current"))
      }.toSeq
    val names = Seq("weather_alerts_snapshot", "agricultural_risk_snapshot",
      "emergency_events_summary_snapshot")
    assert(rows.map(_._1).toSet == names.toSet)
    for (n <- names) {
      val s = rows.filter(_._1 == n)
      // still-open: untouched batch-1 row
      assert(s.exists(r => r._5 && r._3 == "2024-09-24 12:00:00"), s"$n: no still-open row")
      // close+reopen: closed at run-2 ts AND an open '+r2' version exists
      assert(s.exists(r => !r._5 && r._4.contains("2024-09-25 12:00:00")), s"$n: no superseded row")
      assert(s.exists(r => r._5 && r._3 == "2024-09-25 12:00:00" && r._2.endsWith("+r2")),
        s"$n: no reopened +r2 row")
      // hard delete: closed at the delete ts
      assert(s.exists(r => !r._5 && r._4.contains("2024-09-26 00:00:00")), s"$n: no hard-deleted row")
    }
  }

  // ---- canonical label propagation on non-symmetric graphs ----------------

  test("labelPropagation: a source-only node keeps its label and keeps voting every round") {
    // 0 -> 1 -> 2 -> 3 chain (directed, NOT symmetrized). Node 0 has no
    // in-edges: canonical synchronous LP keeps label(0)=0 forever and its
    // vote propagates one hop per round; after 3 rounds everything is 0.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
    // every node of src ∪ dst appears — no silently shrunken node set
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
  }

  test("labelPropagation: isolated nodes union back as singleton communities") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 7L, 8L).toDF("node")
    val out = Graph.labelPropagation(edges, "src", "dst", iterations = 2,
      isolated = Some(nodes))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(7L) == 7L && out(8L) == 8L)
    // a 2-cycle oscillates under synchronous LP: after an even round
    // count each node is back to its own label (documented determinism)
    assert(out(1L) == 1L && out(2L) == 2L)
  }

  test("labelPropagation on a symmetric graph is unchanged by the carry-forward (two cliques)") {
    // same shape as the Wave7 clique test: symmetric edges — the left join
    // carry-forward must be a no-op on the result
    val cliqueA = for (a <- 0L to 3L; b <- 0L to 3L if a != b) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- 10L to 13L if a != b) yield (a, b)
    val edges = (cliqueA ++ cliqueB :+ (3L, 10L) :+ (10L, 3L)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(n => out(n) == 0L))
    assert((10L to 13L).forall(n => out(n) == 10L))
  }
}
