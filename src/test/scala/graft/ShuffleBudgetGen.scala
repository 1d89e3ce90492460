package graft

/** Regenerates the PlanAuditSpec shuffle-budget table: prints one
  * `"name" -> n,` line per board query with its current physical-plan
  * ShuffleExchange count (AQE off, sf0.001 — the same conditions the
  * spec audits under).
  *
  * Run after an intentional plan change:
  *   sbt "Test/runMain graft.ShuffleBudgetGen"
  * and paste the output block into PlanAuditSpec.shuffleBudget.
  */
object ShuffleBudgetGen {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SparkSessionFactory.applyEngineDefaults(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[8]")
        .appName("graft-budget-gen")
        .config("spark.sql.shuffle.partitions", "8")
    ).getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val n =
        try PlanAudit.shuffleCount(fn(spark, "/root/testdata/sf0.001"))
        catch { case e: Throwable => println(s"// $name FAILED: ${e.getMessage}"); -1 }
      s"""    "$name" -> $n,"""
    }
    println("  private val shuffleBudget: Map[String, Int] = Map(")
    rows.foreach(println)
    println("  )")
    spark.stop()
  }
}
