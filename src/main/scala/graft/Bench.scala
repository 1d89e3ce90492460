package graft
import org.apache.spark.sql.SparkSession
object Bench {
  // NEGATIVE CONTROLS for the scale gate (tools/scale_leg.sh), opt-in via
  // SPARK_GRAFT_BENCH_EXTRA — never part of SparkEntry.queries, never
  // verified, never in the official board total. toy_quadratic is the
  // shape every operator on the board exists to avoid: an uncapped
  // within-group self-join whose pair product grows as the SQUARE of the
  // corpus, so the x10 documents fixture must blow past the gate's ratio
  // ceiling — proving the gate catches a planted regression (the d4 x76 /
  // j11 x16.9 class) rather than vacuously passing.
  private val extraQueries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "toy_quadratic" -> { (s, dir) =>
        import org.apache.spark.sql.functions._
        val d = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val b = d.select(col("doc_id").as("bid"), col("lang"), col("n_chars").as("bn"))
        d.join(b, Seq("lang"))
          .where(col("doc_id") < col("bid") && abs(col("n_chars") - col("bn")) <= lit(5))
          .groupBy("lang").agg(count(lit(1)).as("pairs"))
      }
    )
  // Force EVERY output column of the final plan: Dataset.count() lets
  // Catalyst prune the measured computation for pure projections (count
  // needs no columns, so a quality-score pass over 10x data timed flat),
  // which under-measures exactly the map-heavy queries whose scaling the
  // bench exists to watch. toRdd executes the plan as optimized for full
  // output; the RDD count forces all partitions without a driver collect.
  private def force(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** Portable-oracle twins excluded from the timed pass by default (see
    * the comment at the use site). Exposed so BenchRefSpec can assert the
    * committed retry-ceiling reference covers exactly the timed board.
    * st22 joined in round 14 (verdict item 2): ~3.5 s of its wall is md5
    * signature math that exists only so DuckDB can replay the index —
    * st22b (xxhash64, the production path) holds the timed slot; st22
    * stays fully hash-graded in Verify/CORRECTNESS like the other twins.
    * d17 joined in round 15: FuzzyProfile attributed its scale growth to
    * the id-level pair OUTPUT itself (64 distinct p_names → identical
    * names collide under any blocking key; matched pairs ×103 on a ×10
    * corpus) — an output-size floor no plan can beat. d17b (canonical
    * distinct-name match carrying multiplicities, linear) holds the
    * timed slot.
    * d18 joined in round 15 (same argument as st22): its 2.95 s sf0.1
    * wall vs d18b's 1.32 s is the md5-hex signature math (32 digests per
    * shingle, lexicographic mins) that exists only so DuckDB can replay
    * the persisted index; d18b (xxhash64 signatures, the production
    * path, Wave8Spec-pinned == the cross-batch slice) holds the timed
    * slot and d18 stays fully hash-graded in Verify/CORRECTNESS.
    * d3b joined in round 16 (verdict item 7 — the same argument as
    * d2b/t5b/d18): its md5-derived 60-bit SimHash exists only so DuckDB
    * can replay the votes→bits→blocks pipeline; d3 (the production
    * xxhash64 SimHash) holds the timed slot, and d3b stays fully
    * hash-graded in Verify/CORRECTNESS. */
  val TwinEntries: Set[String] =
    Set("t5b_rolling_fingerprint_portable", "d2b_minhash_portable", "d13_corpus_overlap",
      "st22_stream_incremental_neardup", "d17_fuzzy_join", "d18_incremental_neardup",
      "d3b_simhash_portable")

  /** (steal, total) jiffy counters from /proc/stat's aggregate cpu line —
    * field 8 is time stolen by the hypervisor. Sampled at run start and
    * end so the artifact self-labels hot runs (round-13 verdict item 4:
    * the driver sweep read +43% purely from steal and only commit-message
    * prose said so). None off-Linux / on parse failure — the metric must
    * never fail a bench run. */
  private def stealSample(): Option[(Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        src.getLines().find(_.startsWith("cpu ")).flatMap { l =>
          val f = l.trim.split("\\s+").drop(1).flatMap(_.toLongOption)
          // total = fields 0-7 (user..steal) ONLY: the kernel already
          // folds guest/guest_nice (fields 8-9) into user/nice, so
          // summing them would double-count guest time and understate
          // steal_pct on nested-VM hosts
          if (f.length >= 8) Some((f(7), f.take(8).sum)) else None
        }
      } finally src.close()
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val stealStart = stealSample()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_BENCH_COLD=1 skips every warmup so the timed pass absorbs
    // one-time JIT/codegen/footer-cache costs — the cold single-pass number
    // recorded in BASELINE.md alongside the steady-state default, so driver
    // single-pass runs are comparable round over round.
    val cold = sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1")
    // optional comma-separated allowlist — lets scale/skew experiments time
    // a query subset on fixture dirs that only carry the tables they need
    val only = sys.env.get("SPARK_GRAFT_BENCH_QUERIES").map(_.split(",").map(_.trim).toSet)
    // Portable-oracle TWINS are correctness artifacts, not performance
    // paths: md5-based DuckDB-expressible stand-ins whose production
    // counterparts (xxhash64 / native exprs) run 10x+ faster and are timed
    // on the board already. Excluded from the timed pass by default
    // (SPARK_GRAFT_BENCH_TWINS=1 re-includes); the artifact records the
    // exclusion so the official number documents exactly what ran. They
    // stay fully graded in Verify/CORRECTNESS regardless.
    val twinEntries = TwinEntries
    val twins = sys.env.get("SPARK_GRAFT_BENCH_TWINS").contains("1")
    val extra = sys.env.get("SPARK_GRAFT_BENCH_EXTRA")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val pool = SparkEntry.queries ++ extraQueries.view.filterKeys(extra.contains).toMap
    val ordered = pool.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .filter { case (name, _) => twins || only.nonEmpty || !twinEntries.contains(name) }
    // Recycle the SparkSession every ~40 queries: one long-lived session
    // running 150+ queries x 2 passes outgrows the JVM code cache, and the
    // sweeper evicts hot codegen methods from ROTATING victims — a map-only
    // query intermittently times 10-50x its isolated cost (j10 11.5 s
    // official vs 0.2 s isolated, round 5), so a real regression could hide
    // in the noise. Dropping the session releases the generated-class
    // loaders, letting the sweeper reclaim whole nmethod regions instead of
    // evicting live ones. Session startup is untimed.
    val blockSize = sys.env.get("SPARK_GRAFT_BENCH_BLOCK").flatMap(_.toIntOption).getOrElse(40)
    // cold mode keeps the historical single timed pass (its point is the
    // one-shot cost); steady-state defaults to min-of-two (see below)
    val passes = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_PASSES").flatMap(_.toIntOption)
      .getOrElse(if (cold) 1 else 2))
    // Steal-retry sanity ceiling: this host's hypervisor-steal bursts can
    // hit BOTH timed passes of one query (round 6: j10 recorded 11.2 s
    // official vs 0.47 s isolated), so min-of-two alone can still print a
    // wild outlier next to a sub-second query — and a genuine regression in
    // a fast query could then hide behind the "it's just steal" precedent.
    // Any query whose best time exceeds the ceiling is re-run (once, by
    // default) and the retry count is recorded in the artifact, so the
    // official number either recovers the true cost or documents that the
    // query is REALLY that slow even on a third pass. The ceiling is
    // absolute (legit slow legs like g1 pay one extra ~4 s pass — cheap
    // insurance on a 135 s board); 0 disables.
    val retryCeiling = sys.env.get("SPARK_GRAFT_BENCH_RETRY_SEC").flatMap(_.toDoubleOption)
      .getOrElse(if (cold) 0.0 else 2.0)
    val maxRetries = sys.env.get("SPARK_GRAFT_BENCH_RETRIES").flatMap(_.toIntOption).getOrElse(1)
    // Per-class ceilings: a flat 2 s ceiling re-runs the same ~10
    // known-heavy legs (g1/g2/st22/em_snapshots/...) every official run —
    // ~30 s of wasted third passes that can't change the outcome. The
    // committed ref file (tools/gen_bench_ref.sh: one Bench run at
    // sf0.01) records each query's small-scale cost; a query's ceiling is
    // max(base, 4x its sf0.01 time), so map-only queries keep the 1-2 s
    // expectation while a leg that costs 2 s at sf0.01 only retries above
    // 8 s — a genuine outlier, not its own steady state. Queries missing
    // from the ref (new this round) fall back to the flat base ceiling.
    val ceilingRefPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_CEILING_REF", "tools/bench_ref_sf0.01.json")
    val refTimes: Map[String, Double] = {
      val f = new java.io.File(ceilingRefPath)
      if (retryCeiling <= 0 || !f.isFile) Map.empty
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        // flat {"name":sec,...} map written by gen_bench_ref.sh
        """"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r
          .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
    def ceilingFor(name: String): Double =
      refTimes.get(name).map(t => math.max(retryCeiling, 4.0 * t)).getOrElse(retryCeiling)
    val results = ordered.grouped(blockSize).toSeq.flatMap { block =>
      val spark = graft.core.SparkSessionFactory.local("graft-bench")
      if (!cold) {
        // Warm the fresh JVM session: parquet footers + one pass through the
        // shuffle, join, window and codegen machinery so the first timed
        // query doesn't absorb one-time JIT/session costs.
        Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings").foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count(): Unit
        }
        locally {
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions._
          val o = spark.read.parquet(s"$sfDir/orders.parquet").limit(5000)
          val c = spark.read.parquet(s"$sfDir/customer.parquet").limit(5000)
          o.join(c, col("o_custkey") === col("c_custkey"))
            .groupBy("o_orderstatus").agg(sum("o_totalprice"), countDistinct("o_custkey"))
            .count(): Unit
          o.select(row_number().over(
            Window.partitionBy("o_orderstatus").orderBy("o_orderkey")).as("rn")).count(): Unit
        }
        // Untimed warmup pass over THIS block: JIT-compiles each query's
        // generated code and fills the footer/OS page caches, so the timed
        // pass measures steady-state throughput (what a long-running
        // cluster job sees), not one-time JVM warmup.
        block.foreach { case (_, fn) =>
          try { force(fn(spark, sfDir)): Unit } catch { case _: Throwable => () }
        }
      }
      // Two timed passes, per-query MIN: this host shows bursty hypervisor
      // steal that inflates a rotating victim 5-20x per pass (BASELINE.md
      // wave-7 note: three same-day full runs spanned 155-208 s with
      // different victims each time). A single pass makes the artifact
      // hostage to whichever queries the burst lands on; min-of-two is the
      // standard noisy-host estimator of the query's true steady-state
      // cost and is recorded as such ("passes":2) in the artifact.
      // SPARK_GRAFT_BENCH_PASSES overrides (1 restores the old behavior).
      val timed = block.map { case (name, fn) =>
        def onePass(): (Double, Boolean) = {
          val t0 = System.nanoTime()
          val ok = try { force(fn(spark, sfDir)); true } catch { case _: Throwable => false }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        // min over SUCCESSFUL passes only: a pass that throws typically
        // fails fast, and letting its short elapsed time win the min would
        // mask a regression behind a fast failure. All-passes-failed
        // records the -1 failure marker (never a time).
        val first = (1 to passes).map(_ => onePass())
        var best = first.collect { case (t, true) => t } match {
          case ok if ok.nonEmpty => ok.min
          case _ => -1.0
        }
        var retries = 0
        val ceiling = ceilingFor(name)
        while (retryCeiling > 0 && best > ceiling && retries < maxRetries) {
          retries += 1
          val (t, ok) = onePass()
          if (ok && t < best) best = t
        }
        (name, best, retries)
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      timed
    }
    def fmt(v: Double, places: Int): String =
      java.lang.String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))
    // Charge FrameMemo recompute builds to the timed board (round-16
    // verdict item 2): min-of-two passes report only WARM consumer times —
    // the first consumer's warmup pass builds each shared frame, so the
    // build cost appeared in no reported number. Every memo that recomputed
    // this run now rides the board as a `build:<memo>` entry whose value is
    // the ACCUMULATED wall seconds of its recompute builds (eager
    // localCheckpoint included), measured inside FrameMemo — so the charge
    // reconciles with the recompute counters by construction, the oracle
    // surface is untouched, and the pre-existing per-query entries keep
    // their round-15 meaning (warm consumer time) for cross-round
    // comparison. graph_memo (trade_pairs) is a FrameMemo and is covered.
    val memoBuilds: Seq[(String, Double, Int)] =
      graft.core.FrameMemo.allStatsWithBuild
        .collect { case (n, _, r, b) if r > 0 => (s"build:$n", b, 0) }
    val charged = results ++ memoBuilds
    val qs = charged.map { case (k, v, _) => s"\"" + k + "\":" + fmt(v, 4) }
      .mkString("{", ",", "}")
    val total = charged.map { case (_, v, _) => math.max(v, 0.0) }.sum
    val nFailed = results.count(_._2 < 0)
    // environment fingerprint: a contended machine (stray JVMs, parallel
    // builds) inflates CPU-bound queries 10-100x — recording cores + the
    // 1-min load average alongside the numbers makes contamination
    // self-evident in the artifact instead of requiring a manual re-run
    val cores = Runtime.getRuntime.availableProcessors
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    // tree-identity stamp: which code this artifact measured ("+dirty" =
    // uncommitted tree — the number pins nothing), so cross-round "code
    // is identical" claims are checkable mechanically
    val commit = {
      def run(cmd: String*): Option[String] =
        try {
          val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
          val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
          if (p.waitFor() == 0 && out.nonEmpty) Some(out) else None
        } catch { case _: Throwable => None }
      // sibling generated artifacts don't dirty the stamp: they are
      // measurement outputs, not measured code (tools/git_commit.py is
      // the python twin of this rule)
      val artifact =
        "(?i)^(SCALE|SKEW|EM100|BENCH|CORRECTNESS)_[a-z0-9_]+\\.json$|^SCALE_selftest\\.json$|^LEAKCHECK\\.json$".r
      run("git", "rev-parse", "HEAD").map { h =>
        // run() trims the captured output, which can eat the first
        // porcelain line's leading status char — strip the 1-2-char XY
        // status prefix with a regex (BEFORE the rename split, so a renamed
        // path whose first token is short isn't truncated) instead of
        // whitespace-splitting, which reduced a path containing a space to
        // its last token and could mis-exclude real code dirt
        val dirty = run("git", "status", "--porcelain", "--untracked-files=no")
          .map(_.linesIterator.filter(_.nonEmpty)
            .map(_.replaceFirst("^\\s*\\S{1,2}\\s+", "").split(" -> ").last)
            .filterNot(p => artifact.pattern.matcher(p).matches()).toSeq)
        h + (if (dirty.exists(_.nonEmpty)) "+dirty" else "")
      }.getOrElse("unknown")
    }
    val excluded =
      if (twins) "[]"
      else twinEntries.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // graph-memo traffic (trade-pairs join+distinct): hits vs recomputes
    // across the whole run. Expected shape: one recompute per (session
    // block, dir) the graph legs touch; more means the memo thrashed
    // (cap eviction or dead-session purges) and the graph legs paid the
    // join+distinct again — the attribution the round-12 verdict asked
    // the artifact to carry for g1b/g3 band-reading.
    val (memoHits, memoRecomputes) = graft.queries.EventGraphQueries.tradePairsMemoStats
    // every registered FrameMemo (graph trade-pairs + the round-14 EM mart
    // and BM25-score memos): hits vs recomputes per memo — the observable
    // that separates "leg drifted because its shared frame recomputed"
    // from host noise, generalized from graph_memo
    val frameMemo = graft.core.FrameMemo.allStatsWithBuild
      .map { case (n, h, r, b) =>
        s""""$n":{"hits":$h,"recomputes":$r,"build_sec":${fmt(b, 3)}}""" }
      .mkString("{", ",", "}")
    // hypervisor-steal delta across the whole run: jiffies stolen / total
    // jiffies elapsed — cross-round tooling can discount hot runs
    // mechanically instead of band-reading load_avg
    val stealJson = (stealStart, stealSample()) match {
      case (Some((s0, t0)), Some((s1, t1))) if t1 > t0 =>
        val pct = (s1 - s0).toDouble / (t1 - t0) * 100.0
        s"""{"ticks":${s1 - s0},"pct":${fmt(pct, 2)}}"""
      case _ => "null"
    }
    // the builder's official idle closing run (committed JSON written by
    // tools/record_closing_board.sh at round close) rides the artifact so
    // round-over-round comparisons use like-for-like idle numbers instead
    // of whatever load the driver's single run happened to see. The known
    // numeric fields are EXTRACTED and re-emitted in a fixed bounded
    // shape (never the raw file): this block rides the compact FINAL
    // line, whose whole contract is fitting the driver's bounded stdout
    // tail — an unbounded embed (the retries map grows per retried
    // query) could truncate the official artifact mid-JSON, the round-3
    // failure the final line exists to prevent. Absent/malformed file ->
    // null, never a crash (the driver's run must not depend on builder
    // bookkeeping).
    val closingBoard = {
      val f = new java.io.File(
        sys.env.getOrElse("SPARK_GRAFT_CLOSING_BOARD", "tools/closing_board.json"))
      val txt =
        if (!f.isFile) None
        else try Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
        catch { case _: Throwable => None }
      def num(field: String): Option[String] = txt.flatMap { t =>
        s""""$field"\\s*:\\s*(-?[0-9][0-9.]*)""".r.findFirstMatchIn(t).map(_.group(1))
      }
      val commitField = txt.flatMap { t =>
        """"commit"\s*:\s*"([0-9a-f]{7,40}(?:\+dirty)?)"""".r.findFirstMatchIn(t).map(_.group(1))
      }
      val nRetried = txt.flatMap { t =>
        """"retries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(t)
          .map(_.group(1).count(_ == ':'))
      }
      (num("round"), num("value_sec"), num("n_queries"), num("per_query_sec"),
        num("load_avg_1m"), commitField) match {
        case (Some(r), Some(v), Some(n), Some(pq), load, Some(c)) =>
          s"""{"round":$r,"value_sec":$v,"n_queries":$n,"per_query_sec":$pq,""" +
            s""""load_avg_1m":${load.getOrElse("null")},""" +
            s""""steal_pct":${num("steal_pct").getOrElse("null")},""" +
            s""""n_retried":${nRetried.getOrElse(0)},""" +
            s""""commit":"$c"}"""
        case _ => "null"
      }
    }
    val retried = results.collect { case (k, _, r) if r > 0 => s"\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    // per-class ceilings actually raised above the flat base — the sf0.01
    // reference costs behind them live in the committed ref file
    val raised = results.map(_._1).filter(n => ceilingFor(n) > retryCeiling).sorted
      .map(n => s"\"" + n + "\":" + fmt(ceilingFor(n), 2)).mkString("{", ",", "}")
    val refTag = if (refTimes.isEmpty) "null" else s""""$ceilingRefPath""""
    val env = s""""sf":"$sfDir","commit":"$commit","cores":$cores,"load_avg_1m":$load,"cold":$cold,""" +
      s""""recycle_every":$blockSize,"passes":$passes,"retry_ceiling_sec":$retryCeiling,""" +
      s""""ceiling_ref":$refTag,""" +
      s""""graph_memo":{"hits":$memoHits,"recomputes":$memoRecomputes},""" +
      s""""frame_memo":$frameMemo,"steal":$stealJson,""" +
      s""""closing_board":$closingBoard,""" +
      s""""retries":$retried,"n_failed":$nFailed,"twins_excluded":$excluded"""
    // the raised-ceiling map rides the FULL line only — the compact final
    // line must stay inside the driver's bounded stdout tail
    val envFull = s""""ceilings_raised":$raised,""" + env
    // full per-query record first (for the build log / BASELINE.md), then a
    // compact summary as the LAST line: the driver's artifact keeps a
    // bounded tail of stdout, and the ~4 KB full line overflows it (round-3
    // artifacts truncated mid-line and failed to parse). The final line is
    // sized to always fit the tail window whole, so the official artifact
    // is self-contained: total + count + the slowest legs, parseable.
    println(s"""{"metric":"total_full","value":$total,"unit":"sec","queries":$qs,$envFull}""")
    val slowest = charged.sortBy(-_._2).take(10)
      .map { case (k, v, _) => s"\"" + k + "\":" + fmt(v, 3) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","n_queries":${results.length},"slowest":$slowest,$env}""")
  }
}
