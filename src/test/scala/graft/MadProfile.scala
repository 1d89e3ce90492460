package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Percentiles

/** Component attribution for a26_mad_outliers (round 15) — the EmProfile
  * methodology: min-of-N forced component runs, so the floor pin in
  * OPTIMIZATION_r15.md is a measured split, not an estimate.
  *
  *   med_pass   exactByRange over raw events — one full selection-
  *              machinery invocation (compaction + spine + boundary +
  *              count + rank jobs)
  *   mad_pass   med_pass + the second invocation over events ⋈ med
  *   full       the board entry (adds the final outlier card aggregate)
  *   cells_only the counterfactual: ONE compaction scan of events to
  *              (event_type, value) → count cells — what a
  *              share-the-compaction rewrite would make the only
  *              full-table work
  *
  * cells_only being a small fraction of med_pass says the wall is the
  * machinery's FIXED JOB COUNT (two guard counts, two approxQuantile
  * jobs, two B×G collects, two rank-pass collects), not the table scans
  * — which is why the round-15 cell-sharing rewrite measured SLOWER at
  * bench SF (its extra tiny stages cost more than the four saved scans)
  * and was reverted; the numbers live in OPTIMIZATION_r15.md.
  *
  *   sbt "Test/runMain graft.MadProfile [sfDir] [passes]"
  */
object MadProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = math.max(1, args.lift(1).flatMap(_.toIntOption).getOrElse(3))
    val spark = graft.core.SparkSessionFactory.local("graft-bench")

    def force(df: DataFrame): Unit = { df.queryExecution.toRdd.count(): Unit }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Unit): Double = (1 to passes).map(_ => time(f)).min

    val e = Tables(spark, sfDir).events
    val nRows = e.count()

    def medPass(): DataFrame =
      Percentiles.exactByRange(e, "event_type", "value", Seq("med" -> 0.5))

    val stages: Seq[(String, () => Unit)] = Seq(
      "med_pass" -> (() => { medPass(): Unit }),
      "mad_pass" -> (() => {
        val med = medPass()
        val withDev = e.join(broadcast(med), Seq("event_type"))
          .withColumn("dev", abs(col("value") - col("med")))
        Percentiles.exactByRange(withDev, "event_type", "dev",
          Seq("mad" -> 0.5)): Unit
      }),
      "full" -> (() => force(SparkEntry.queries("a26_mad_outliers")(spark, sfDir))),
      "cells_only" -> (() => force(
        e.groupBy(col("event_type").cast("string").as("g"),
            col("value").cast("double").as("v"))
          .agg(count(lit(1)).as("c"))))
    )

    stages.foreach { case (_, run) => run() } // codegen + footer warmup

    println(s"rows=$nRows sf=$sfDir passes=$passes")
    println("| stage | sec |")
    println("|---|---|")
    stages.foreach { case (name, run) =>
      val t = best(run())
      println(f"| $name | $t%.2f |")
    }
    spark.stop()
  }
}
