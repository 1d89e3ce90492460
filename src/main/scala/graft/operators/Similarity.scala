package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column. Baseline: brute-force cosine top-k with the (small) query set
  * broadcast against the full corpus — one scan, no shuffle of the corpus.
  * Scale path: random-hyperplane LSH bucketing so candidate generation is
  * an equi-join on the bucket id instead of a cross product.
  */
object Similarity {

  /** Top-k cosine neighbors for each query vector. `queries` must be small
    * (it is broadcast); the corpus side streams through in one pass. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), VectorFunctions.cosine(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes from a fixed seed; inlined as
    * literals so LSH bucketing needs no broadcast or side data. */
  def randomPlanes(dim: Int, numPlanes: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Assign each vector to a 2^numPlanes-bucket LSH code. */
  def withLshBucket(vectors: DataFrame, vecCol: String, planes: Seq[Seq[Double]]): DataFrame =
    vectors.withColumn("lsh_bucket", VectorFunctions.lshBucket(col(vecCol), planes))

  /** ANN top-k: candidates restricted to the query's LSH bucket, then
    * exact-cosine ranked. Trades recall for a cross-product-free plan; at
    * 100 TB the bucket join shuffles on a 2^p-ary key instead of comparing
    * all pairs. Recall vs bruteForceTopK is asserted in SimilaritySpec. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      numPlanes: Int = 6,
      seed: Long = 42L
  ): DataFrame = {
    val planes = randomPlanes(dim, numPlanes, seed)
    val c = withLshBucket(corpus, vecCol, planes).select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"), col("lsh_bucket"))
    val q = withLshBucket(queries, vecCol, planes).select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("lsh_bucket"))
    val scored = c
      .join(q, Seq("lsh_bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), VectorFunctions.cosine(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidates with
    * exact cosine ≥ threshold. Equi-join on bucket — no cross join. */
  def embeddingNearDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      numPlanes: Int = 6,
      seed: Long = 42L
  ): DataFrame = {
    val planes = randomPlanes(dim, numPlanes, seed)
    val v = withLshBucket(vectors, vecCol, planes).select(col(idCol).as("vid"), col(vecCol).as("v"), col("lsh_bucket"))
    v.as("a")
      .join(v.as("b"), Seq("lsh_bucket"))
      .filter(col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"), VectorFunctions.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
