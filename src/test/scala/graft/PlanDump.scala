package graft

/** Dumps `.explain("formatted")` for named board queries to text files —
  * the plans/r{N}/<query>_{before,after}.txt evidence an optimization
  * round commits next to its OPTIMIZATION notes, so plan-shape claims
  * ("2 Exchange → 1", "SortMergeJoin → BroadcastHashJoin") are checkable
  * without running Spark.
  *
  *   sbt "Test/runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,..."
  *
  * Uses the bench's own session factory (same configs, AQE on) so the
  * dumped plan is the shape the board actually runs; iterative queries
  * with eager internal checkpoints execute those stages during planning,
  * exactly as the bench does.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir): Unit
    val spark = graft.core.SparkSessionFactory.local("graft-plandump")
    names.foreach { n =>
      val txt =
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"PLAN FAILED: ${e}" }
      java.nio.file.Files.write(
        outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8")): Unit
      println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
