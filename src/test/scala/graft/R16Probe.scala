package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Round-16 scratch probe: runtime job/stage/shuffle counts for one query
  * execution — the observable the .explain dumps can't show under AQE
  * (stage reuse and elided exchanges only exist at runtime). Run:
  *   sbt "Test/runMain graft.R16Probe <queryName> [sfDir] [passes]"
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("g1_pagerank")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = math.max(1, args.lift(2).flatMap(_.toIntOption).getOrElse(3))
    val spark = graft.core.SparkSessionFactory.local("graft-probe")
    // build:* names probe the un-memoized shared-frame builders — the
    // cost the bench now charges to the board (FrameMemo build charging)
    val fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      name match {
        case "build:shingle_pair_stats" => (s, dir) => queries.DedupQueries.buildPairStats(s, dir)
        case "build:neardup_clusters" => (s, dir) => queries.DedupQueries.buildNeardupClusters(s, dir)
        case other => SparkEntry.queries(other)
      }

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    }
    // warmup
    fn(spark, sfDir).queryExecution.toRdd.count(): Unit
    val times = (1 to passes).map { _ =>
      jobs = 0; stages = 0; tasks = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count(): Unit
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(600) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"PROBE $name%s pass: ${dt}%.3f s jobs=$jobs stages=$stages tasks=$tasks")
      dt
    }
    println(f"PROBE $name%s best=${times.min}%.3f s")
    spark.stop()
  }
}
