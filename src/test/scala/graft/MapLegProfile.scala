package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Multimodal

/** Component attribution for the two highest raw-growth MAP-ONLY scale
  * legs (round-15 verdict item 6): t22_pii_scrub (raw ×10.5) and
  * m5_image_resize (raw ×9.5). Both are zero-exchange per-row compute —
  * the question is not plan shape (there is none) but which per-row
  * component carries the wall, and whether the growth is the honest
  * linear floor (ratio ≈ rows ratio at every component) or a re-scan
  * somewhere.
  *
  *   t22: plant   planted-text construction + full-scan force (the
  *                corpus read both real components ride on)
  *        counts  plant + the three per-class regexp_extract_all counts
  *        scrub   plant + the three chained regexp_replace redactions
  *        full    the board entry (counts + scrub in one projection)
  *   m5:  pngs    syntheticGradientPngs — per-row ImageIO PNG ENCODE
  *        full    the board entry (encode + decode + nearest-neighbor
  *                resample to 8×8 + channel sums)
  *
  * `full ≈ plant + (counts−plant) + (scrub−plant)` closing within noise
  * says the regex automata run back to back with no re-scan waste; the
  * per-SF MB/s and rows/s are the BASELINE.md floor pins. Run at two
  * SFs for the ratio:
  *
  *   sbt "Test/runMain graft.MapLegProfile [sfDir] [passes]"
  */
object MapLegProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = math.max(1, args.lift(1).flatMap(_.toIntOption).getOrElse(3))
    val spark = graft.core.SparkSessionFactory.local("graft-bench")

    def force(df: DataFrame): Unit = { df.queryExecution.toRdd.count(): Unit }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Unit): Double = (1 to passes).map(_ => time(f)).min

    val docs = Tables(spark, sfDir).documents
    val id = col("doc_id")
    // the t22 planted text, verbatim from TextQueries
    val planted = concat(col("text"),
      lit(" contact user"), id.cast("string"),
      lit("@mail.example.org or 303-555-"),
      lpad((id % 10000).cast("string"), 4, "0"),
      lit(" from 10.0."), (id % 256).cast("string"), lit("."),
      (id % 100).cast("string"))
    val base = docs.select(id, planted.as("t"))
    val nRows = docs.count()
    val mb = base.select(sum(length(col("t")))).head.getLong(0) / 1e6

    val t22Stages: Seq[(String, () => Unit)] = Seq(
      "t22_plant" -> (() => force(base.select(col("doc_id"), length(col("t")).as("n")))),
      "t22_counts" -> (() => force(base.select(col("doc_id"),
        TextFunctions.piiCount(col("t"), "email").as("n_email"),
        TextFunctions.piiCount(col("t"), "phone").as("n_phone"),
        TextFunctions.piiCount(col("t"), "ip").as("n_ip")))),
      "t22_scrub" -> (() => force(base.select(col("doc_id"),
        TextFunctions.scrubPii(col("t")).as("scrubbed")))),
      "t22_full" -> (() => force(SparkEntry.queries("t22_pii_scrub")(spark, sfDir))),
      "m5_pngs" -> (() => force(
        Multimodal.syntheticGradientPngs(docs.select("doc_id"), "doc_id")
          .select(col("doc_id"), length(col("payload")).as("n")))),
      "m5_full" -> (() => force(SparkEntry.queries("m5_image_resize")(spark, sfDir)))
    )

    t22Stages.foreach { case (_, run) => run() } // codegen + footer warmup

    println(f"%nrows=$nRows planted_mb=$mb%.1f sf=$sfDir")
    println("| stage | sec | rows/s | MB/s |")
    println("|---|---|---|---|")
    t22Stages.foreach { case (name, run) =>
      val t = best(run())
      println(f"| $name | $t%.2f | ${nRows / t}%.0f | ${mb / t}%.1f |")
    }
    spark.stop()
  }
}
