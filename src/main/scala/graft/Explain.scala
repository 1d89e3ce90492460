package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for selected queries so
  * shuffle/broadcast/pushdown decisions can be reviewed and pinned.
  * Usage: runMain graft.Explain [queryName ...] (default: audit set)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SparkSessionFactory.local("graft-explain", defaultCpus = 8, shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p4_time_window_prune", "j1_dim_enrich_agg", "j3_interval_join",
        "a3_privacy_rollup", "w2_row_number", "d1_ngram_jaccard", "s1_knn_bruteforce",
        "j9_asof_join", "x2_sessionize_batch", "t8_tfidf_topterms")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
