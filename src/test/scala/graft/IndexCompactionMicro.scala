package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Micro-bench for the signature-index small-files ailment and the
  * compaction pass that cures it:
  *   sbt "Test/runMain graft.IndexCompactionMicro [nDeltas]"
  *
  * A long-running st22/d18 ingest file-moves ONE parquet delta per
  * admitted micro-batch into the index dir, so after N batches every
  * probe pays N footer opens + N tiny scans before any real work. This
  * harness builds an index fragmented into `nDeltas` files (default 256)
  * from the sf0.1 documents signatures, times the d18 band-probe against
  * it, compacts via `Dedup.compactSignatureIndex`, re-times, and
  * verifies the match results are identical. The delta: pure file-count
  * overhead — same rows, same probe plan — which is why the compaction
  * cadence matters at ingest scale (the round-8 BASELINE.md table).
  */
object IndexCompactionMicro {
  def main(args: Array[String]): Unit = {
    val nDeltas = args.headOption.flatMap(_.toIntOption).getOrElse(256)
    val spark = graft.core.SparkSessionFactory.local("graft-idx-compaction-micro")
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_micro").toFile
    val idxDir = s"${dir.getAbsolutePath}/index"

    val docs = graft.core.Tables(spark, "/root/testdata/sf0.1").documents
      .select(col("doc_id"), col("text"))
    val sigs = Dedup.portableSignatures(docs, "doc_id", "text", n = 3, k = 32)
      .persist()
    val nDocs = sigs.count()

    // fragment the index into nDeltas files the way ingest does: one
    // residue class per delta, one file each (repartition(1) per slice is
    // the fixture seam, not a production pattern)
    sigs.withColumn("slice", pmod(col("doc_id"), lit(nDeltas)))
      .repartition(nDeltas, col("slice"))
      .write.partitionBy("slice").mode("overwrite").parquet(s"$dir/staged")
    new java.io.File(idxDir).mkdirs()
    (0 until nDeltas).foreach { i =>
      Option(new java.io.File(s"$dir/staged/slice=$i").listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .zipWithIndex.foreach { case (f, j) =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(s"$idxDir/delta_${i}_$j.parquet").toPath): Unit
        }
    }
    def fileCount() = new java.io.File(idxDir).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))

    val probe = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    def probeOnce(): (Long, Double) = {
      val t0 = System.nanoTime()
      val (matches, _) = Dedup.incrementalNearDup(
        spark.read.parquet(idxDir), probe, "doc_id", "text", n = 3, k = 32, bands = 8)
      val n = matches.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    probeOnce() // warm footers/codegen so both timed probes are steady-state
    val (rowsBefore, tFrag) = probeOnce()
    val filesBefore = fileCount()
    require(Dedup.compactSignatureIndex(spark, idxDir, maxFiles = 16), "compaction should fire")
    probeOnce() // warm the rewritten files
    val (rowsAfter, tComp) = probeOnce()
    require(rowsBefore == rowsAfter, s"probe changed: $rowsBefore != $rowsAfter")
    println(f"index=$nDocs%d sigs in $filesBefore%d files -> ${fileCount()}%d after compaction")
    println(f"probe fragmented=$tFrag%6.3f s  compacted=$tComp%6.3f s  " +
      f"(x${tFrag / tComp}%.1f, $rowsBefore matches both)")
    sigs.unpersist()
    spark.stop()
  }
}
