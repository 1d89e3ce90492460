package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Graph, Similarity}

/** Adversarial-skew evidence harness (VERDICT round-3 item 5): runs the
  * similarity/dedup operators over a boilerplate-heavy corpus
  * (tools/gen_scale.py skew: 20% of docs share one 40-word template
  * paragraph and one hot source key; 20% of embeddings collapse to ~0.95
  * cosine of one direction) with the skew guards OFF and ON, and prints
  * the key-distribution evidence (hot-key df/bucket/cell sizes and the
  * implied candidate-pair counts — the shuffle that the guards bound).
  *
  * Run against the clean sf0.1 dir and the skew dir; the before/after
  * table goes to BASELINE.md.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_skew")
    val spark = graft.core.SparkSessionFactory.local("graft-skewbench")
    val t = Tables(spark, dir)
    val docs = t.documents
    val emb = t.embeddings

    def leg(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"leg":"$name","sec":$sec%.2f,"rows":$rows}""")
    }

    // --- key-distribution evidence ------------------------------------
    // shingle document frequency (per source, as the d1 join is
    // source-scoped): candidate pairs = sum df*(df-1)/2 — the exact row
    // count of the inverted-index self-join's output before thresholding
    val df3 = Dedup.shingles(docs, "doc_id", "text", n = 3, extraCols = Seq("source"))
      .groupBy("sh", "source").agg(count(lit(1)).as("df"))
    val shStats = df3.agg(
      max("df").as("max_df"),
      sum(col("df") * (col("df") - 1) / 2).as("candidate_pairs"),
      sum(when(col("df") > 100, col("df") * (col("df") - 1) / 2).otherwise(0L)).as("pairs_from_hot"),
      count(when(col("df") > 100, 1)).as("shingles_over_100"),
      // the volume the maxDf=100 guard actually admits — what the d1
      // shuffle carries with the guard ON; deterministic, so the skew
      // gate (tools/check_skew.py) reads THIS, not steal-prone wall-clock
      sum(when(col("df") <= 100, col("df") * (col("df") - 1) / 2).otherwise(0L)).as("pairs_capped")).head()
    println(s"""{"evidence":"shingle_df","max_df":${shStats.get(0)},"candidate_pairs":${shStats.get(1)},"pairs_from_df_gt100":${shStats.get(2)},"shingles_over_100":${shStats.get(3)},"pairs_capped":${shStats.get(4)}}""")

    // LSH bucket sizes for the d4 path (same tables/planes as
    // embeddingNearDupPairs defaults: 8 tables x 8 planes, seed 42)
    val tables = Seq.tabulate(8)(i => Similarity.randomPlanes(64, 8, 42L + 7919 * i))
    val buckets = emb
      .select(posexplode(graft.plans.VectorExpressions.lsh_buckets(
        graft.plans.VectorExpressions.vector_normalize(col("embedding")),
        tables.flatten, 8)).as(Seq("tbl", "bucket")))
      .groupBy("tbl", "bucket").agg(count(lit(1)).as("sz"))
    val bStats = buckets.agg(
      max("sz").as("max_bucket"),
      sum(col("sz") * (col("sz") - 1) / 2).as("candidate_pairs"),
      sum(when(col("sz") <= 200, col("sz") * (col("sz") - 1) / 2).otherwise(0L)).as("pairs_capped")).head()
    println(s"""{"evidence":"lsh_buckets","max_bucket":${bStats.get(0)},"candidate_pairs":${bStats.get(1)},"pairs_capped":${bStats.get(2)}}""")

    // SemDeDup cell sizes (seeded centroids, k=64 — the d8 assignment)
    val cells = emb
      .select(graft.plans.VectorExpressions.nearest_centroids(
        graft.plans.VectorExpressions.vector_normalize(col("embedding")),
        Similarity.seededCentroids(64, 64, 42L), 1)(0).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("sz"))
    val cStats = cells.agg(
      max("sz").as("max_cell"),
      sum(col("sz") * (col("sz") - 1) / 2).as("within_cell_pairs"),
      sum(when(col("sz") <= 200, col("sz") * (col("sz") - 1) / 2).otherwise(0L)).as("pairs_capped")).head()
    println(s"""{"evidence":"semdedup_cells","max_cell":${cStats.get(0)},"within_cell_pairs":${cStats.get(1)},"pairs_capped":${cStats.get(2)}}""")

    // --- operator legs: guards off vs on ------------------------------
    leg("d1_jaccard_uncapped") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.5).count()
    }
    leg("d1_jaccard_maxDf100") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.5,
        maxDf = Some(100)).count()
    }
    leg("d5_cc_uncapped") {
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.5)
      Graph.connectedComponents(docs.select("doc_id"), pairs, "doc_id", "id_a", "id_b").count()
    }
    leg("d4_neardup_uncapped") {
      Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = 0.4, dim = 64).count()
    }
    leg("d4_neardup_maxBucket200") {
      Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = 0.4, dim = 64,
        maxBucketSize = Some(200)).count()
    }
    leg("d8_semdedup_uncapped") {
      Similarity.semanticDedup(emb, "vec_id", "embedding", threshold = 0.4, dim = 64).count()
    }
    leg("d8_semdedup_maxCell200") {
      Similarity.semanticDedup(emb, "vec_id", "embedding", threshold = 0.4, dim = 64,
        maxCellSize = Some(200)).count()
    }
    leg("t11_repetition") {
      SparkEntry.queries("t11_repetition")(spark, dir).count()
    }
    leg("x7_quantile_shards") {
      SparkEntry.queries("x7_quantile_shards")(spark, dir).count()
    }
    spark.stop()
  }
}
