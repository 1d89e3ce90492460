package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.StreamingJobs

/** Wall-time attribution for st10_stream_semantic_dedup — the leg whose
  * gated ×10 ratio sits closest to the scale ceiling. Splits the drain
  * wall into the stages the scale argument needs separated:
  *
  *   assign   the row-local stage run as its OWN stream (exact production
  *            plan via StreamingJobs.semanticAssignStream + memory sink):
  *            source scan + codegen'd nearest-centroid + normalize +
  *            micro-batch harness for a stateless query
  *   fn       per-cell state stage, summed across executor threads
  *            (accumulator inside the production operator): lazy state
  *            decode + sorted dup scan + state write-back
  *   residual drain − assign − fn: the groupByKey exchange, state-store
  *            framework (HDFSBackedStateStore load/commit per cell) and
  *            sink append — the part that is micro-batch machinery, not
  *            operator compute. Approximate by construction (assign
  *            overlaps the shuffle write inside the full run), recorded
  *            as the machinery bound, not an exact stage.
  *
  * Run:  sbt "Test/runMain graft.St10Profile [sfDir] [passes]"
  *   (sfDir defaults to sf0.1; pass the x10 fixture dir for the scale
  *   attribution — both tables belong in BASELINE.md next to st22's.)
  */
object St10Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = math.max(1, args.lift(1).flatMap(_.toIntOption).getOrElse(2))
    val spark = graft.core.SparkSessionFactory.local("graft-bench")

    def drainAssignOnly(): Double = {
      val t0 = System.nanoTime()
      // foreachBatch + toRdd.count forces EVERY output column per batch
      // (a memory-sink aggregate would let Catalyst prune the normalized
      // vector — Bench's force() trap) while retaining nothing
      val q = StreamingJobs.semanticAssignStream(spark, sfDir)
        .toDF("vec_id", "cell", "nv")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.queryExecution.toRdd.count(): Unit
        }
        .option("checkpointLocation",
          s"/tmp/graft_st10prof_${ProcessHandle.current().pid()}_${System.nanoTime()}")
        .start()
      try q.processAllAvailable()
      finally q.stop()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup, mirroring Bench: one full untimed run of each shape
    drainAssignOnly(): Unit
    StreamingJobs.streamingSemanticDedup(spark, sfDir)
      .queryExecution.toRdd.count(): Unit

    val rows = (1 to passes).map { p =>
      val assign = drainAssignOnly()
      val acc = scala.collection.concurrent.TrieMap.empty[String, Long]
      val t0 = System.nanoTime()
      StreamingJobs.streamingSemanticDedup(spark, sfDir, phaseNanos = Some(acc))
        .queryExecution.toRdd.count(): Unit
      val wall = (System.nanoTime() - t0) / 1e9
      def g(k: String) = acc.getOrElse(k, 0L) / 1e9
      val residual = g("drain") - assign - g("fn")
      (p, wall, g("drain"), assign, g("fn"), residual)
    }
    println(f"${"pass"}%-6s${"wall_s"}%8s${"drain"}%8s${"assign"}%8s${"fn"}%8s${"residual"}%10s")
    rows.foreach { case (p, w, d, a, f, r) =>
      println(f"$p%-6d$w%8.2f$d%8.2f$a%8.2f$f%8.2f$r%10.2f")
    }
    spark.stop()
  }
}
