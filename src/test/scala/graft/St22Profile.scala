package graft

/** Wall-time attribution for st22_stream_incremental_neardup — the
  * slowest board leg every round. Runs the entry under the official
  * bench session (SparkSessionFactory.local("graft-bench"), default
  * sf0.1), once untimed to absorb JIT/footer warmup exactly like
  * Bench's warmup pass, then once with the phaseNanos collector, and
  * prints the breakdown the round's BASELINE.md records:
  *
  *   stage   batch staging write + file moves + empty index init
  *   sigs    per-batch MinHash signature compute (persist + count)
  *   probe   match-side plan execution + matches append (the LSH
  *           band-join probe against the persisted index)
  *   append  admit-side plan + delta write + file-move (+ cadence check)
  *   harness drain − (sigs + probe + append): micro-batch scheduling,
  *           checkpoint commits, file-source listing
  *
  * Run:  sbt "Test/runMain graft.St22Profile [sfDir] [passes] [fast]"
  * (`fast` profiles the st22b xxhash64 production variant instead of the
  * md5 oracle twin — same pipeline, portable=false.)
  */
object St22Profile {
  def main(args: Array[String]): Unit = {
    // the "fast" flag is positional-blind: filter it out before taking
    // sfDir, so `runMain graft.St22Profile fast` profiles the default
    // dir instead of treating "fast" as a data directory (ADVICE r15)
    val pos = args.filterNot(_ == "fast")
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val portable = !args.contains("fast")
    val spark = graft.core.SparkSessionFactory.local("graft-bench")
    // warmup, mirroring Bench: one full untimed run
    graft.streaming.StreamingJobs.streamingIncrementalNearDup(spark, sfDir,
        portable = portable)
      .queryExecution.toRdd.count(): Unit
    val passes = math.max(1, args.lift(1).flatMap(_.toIntOption).getOrElse(2))
    val rows = (1 to passes).map { p =>
      val acc = scala.collection.concurrent.TrieMap.empty[String, Long]
      val t0 = System.nanoTime()
      graft.streaming.StreamingJobs.streamingIncrementalNearDup(spark, sfDir,
          phaseNanos = Some(acc), portable = portable)
        .queryExecution.toRdd.count(): Unit
      val wall = (System.nanoTime() - t0) / 1e9
      def g(k: String) = acc.getOrElse(k, 0L) / 1e9
      val harness = g("drain") - g("sigs") - g("probe") - g("append")
      (p, wall, g("stage"), g("sigs"), g("probe"), g("append"), harness)
    }
    println(f"${"pass"}%-6s${"wall_s"}%8s${"stage"}%8s${"sigs"}%8s${"probe"}%8s${"append"}%8s${"harness"}%9s")
    rows.foreach { case (p, w, st, si, pr, ap, ha) =>
      println(f"$p%-6d$w%8.2f$st%8.2f$si%8.2f$pr%8.2f$ap%8.2f$ha%9.2f")
    }
    spark.stop()
  }
}
