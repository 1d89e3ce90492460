package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions.{lsh_buckets, nearest_centroids, pq_lut, pq_score, vector_cosine, vector_dot, vector_normalize}

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column. Baseline: brute-force cosine top-k with the (small) query set
  * broadcast against the full corpus — one scan, no shuffle of the corpus.
  * Scale path: random-hyperplane LSH bucketing so candidate generation is
  * an equi-join on the bucket id instead of a cross product.
  */
object Similarity {

  /** Process-level cache of trained quantizer models (IVF centroids, PQ
    * codebooks) keyed by caller-supplied string — train once, search many.
    * A long-running service (or a bench harness doing warmup + timed
    * passes) should not re-run k-means per query when (data, params) are
    * unchanged; this is model reuse, the same contract as persisting a
    * FAISS index. Opt-in via `cacheKey`. */
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private def cachedModel[T <: AnyRef](key: Option[String])(train: => T): T = key match {
    case Some(k) => modelCache.computeIfAbsent(k, _ => train).asInstanceOf[T]
    case None    => train
  }

  /** Read-only view into the trained-model cache, for oracle builders that
    * replay a deterministic learned quantizer in SQL by inlining its
    * codebooks as literals (x6b). */
  def trainedModel(key: String): Option[AnyRef] = Option(modelCache.get(key))

  /** Log-scaled LSH depth: planes per table sized so expected bucket
    * occupancy stays ~`targetBucket` as the corpus grows (buckets per
    * table = 2^planes). This is the knob that keeps the bucket self-join
    * linear in N: with FIXED depth, occupancy grows ~N and within-bucket
    * candidate pairs grow ~N² — measured ×76 wall-clock for ×10 data on
    * the sf1 leg before this existed (BASELINE.md round-4). The floor
    * keeps small corpora at the tuned default; the cap bounds the bucket
    * id within an int fold. */
  def lshPlanesFor(n: Long, targetBucket: Int = 8, floor: Int = 8, cap: Int = 24): Int = {
    val needed = math.ceil(
      math.log(math.max(n, 1L).toDouble / targetBucket) / math.log(2.0)).toInt
    math.min(cap, math.max(floor, needed))
  }

  /** Shuffle a (driver-small) training sample into ONE sorted partition:
    * k-means' floating-point aggregation order follows row order, so
    * cross-machine/cross-partitioning determinism requires fixing that
    * order. repartition(1) keeps the upstream scan parallel (vs coalesce,
    * which would serialize it); the sortWithinPartitions makes the row
    * order — and therefore the fitted codebook — a pure function of
    * (data, seed), not of shuffle-fetch arrival order. */
  private def deterministicTrainOrder(sample: DataFrame, vecCol: String): DataFrame =
    sample.repartition(1).sortWithinPartitions(col(vecCol))

  /** Top-k cosine neighbors for each query vector. `queries` must be small
    * (it is broadcast); the corpus side streams through in one pass. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    def unit(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col(idCol).as(idAs), vector_normalize(col(vecCol)).as(vecAs))
    val q = unit(queries, "query_id", "qv")
    val c = unit(corpus, "neighbor_id", "nv")
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), vector_dot(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Maximum-inner-product search (MIPS) top-k — recommendation-style
    * retrieval where magnitude MATTERS (user×item factor models score by
    * raw dot product; cosine's normalization would erase item
    * popularity). Same plan as [[bruteForceTopK]] minus the unit
    * normalization: broadcast query set, ONE corpus scan, no corpus
    * shuffle. The scale path composes with the existing ANN
    * infrastructure via the Shrivastava–Li (2014) augmentation — append
    * sqrt(M²−‖x‖²) to each corpus vector and 0 to each query (M = max
    * corpus norm) and MIPS order becomes cosine order, so [[ivfTopK]] /
    * [[pqTopK]] serve MIPS untouched (reduction proven in Wave7Spec). */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), vector_dot(col("qv"), col("nv")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Exact scan over int8-quantized storage (the "flat SQ8" index): the
    * query set keeps full float precision while every corpus vector is
    * decoded on the fly from its uint8 codes ([[Quantization]] — 4x less
    * corpus I/O, which at 100 TB of embeddings is the difference between
    * a page-cached scan and a disk-bound one). Asymmetric distance
    * (float query x decoded corpus) loses at most half a quantization
    * bucket per dimension, so recall@k vs full-precision brute force
    * stays near 1. Same plan shape as [[bruteForceTopK]]: broadcast
    * queries, ONE corpus scan, no corpus shuffle; encode∘decode is pure
    * codegen projection work. Per-dim bounds are caller-supplied (learn
    * once via `Quantization.dimStats`, reuse many — the stats travel
    * with the codes in a real deployment). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, mins: Array[Double], maxs: Array[Double]): DataFrame = {
    val dec = Quantization.decode(
      Quantization.encode(col(vecCol), mins, maxs), mins, maxs)
    val c = corpus.select(col(idCol).as("neighbor_id"), dec.as("nv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        vector_cosine(col("qv"), col("nv")).as("sim"))
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

  /** Explode to one row per (vector, table-bucket), carrying the vector
    * pre-normalized to unit length — downstream cosine is then a single
    * dot product per pair instead of dot + two norms. */
  private def explodedBuckets(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, tables: Seq[Seq[Seq[Double]]]): DataFrame = {
    val planesPerTable = tables.head.length
    df.select(col(idCol).as(idAs), vector_normalize(col(vecCol)).as(vecAs))
      .select(col(idAs), col(vecAs),
        posexplode(lsh_buckets(col(vecAs), tables.flatten, planesPerTable)).as(Seq("tbl", "bucket")))
  }

  /** ANN top-k: candidates = vectors sharing any LSH table bucket with the
    * query, then exact-cosine ranked. The bucket equi-join replaces the
    * cross product — at 100 TB the corpus shuffles once on (tbl, bucket)
    * instead of comparing all pairs. Recall vs bruteForceTopK is asserted
    * in OperatorsSpec. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      numTables: Int = 10,
      planesPerTable: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val tables = Seq.tabulate(numTables)(t => randomPlanes(dim, planesPerTable, seed + 7919 * t))
    val c = explodedBuckets(corpus, idCol, vecCol, "neighbor_id", "nv", tables)
    val q = explodedBuckets(queries, idCol, vecCol, "query_id", "qv", tables)
    val scored = c
      .join(q, Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), vector_dot(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Coarse-quantizer training: k-means over (a sample of) the UNIT
    * vectors — centroids on the unit sphere make nearest-centroid-by-L2
    * equivalent to nearest-by-angle, matching the cosine metric of the
    * search. `unitCorpus` must carry the normalized vector in column "nv". */
  private def trainCoarseCentroids(
      unitCorpus: DataFrame,
      nlist: Int,
      seed: Long,
      trainFraction: Double,
      maxIter: Int
  ): Seq[Seq[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sampled = if (trainFraction < 1.0) unitCorpus.sample(trainFraction, seed) else unitCorpus
    val train = deterministicTrainOrder(sampled, "nv")
      .select(array_to_vector(col("nv")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter).fit(train)
    model.clusterCenters.map(_.toArray.toSeq).toSeq
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer partitions the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest
    * centroids and exact-cosine-ranks only those cells. The cell
    * assignment is one pass over the corpus; search is an equi-join on
    * the cell id — at 100 TB the corpus can be written partitioned by
    * `cell` so a probe touches nprobe/nlist of the data. Mirrors the
    * FAISS IVF-Flat layout re-expressed as DataFrame plans.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L,
      trainFraction: Double = 1.0,
      maxIter: Int = 10,
      cacheKey: Option[String] = None
  ): DataFrame = {
    val unitCorpus = corpus
      .select(col(idCol).as("neighbor_id"), vector_normalize(col(vecCol)).as("nv"))
    val centroids: Seq[Seq[Double]] = cachedModel(cacheKey) {
      trainCoarseCentroids(unitCorpus, nlist, seed, trainFraction, maxIter)
    }

    // nearest cell per corpus vector: ONE codegen'd expression holding the
    // packed centroid matrix as a reference object — row-local (no shuffle,
    // no broadcast join), and plan size is independent of nlist. (A literal
    // struct-ladder formulation embeds nlist×dim expression nodes in the
    // plan and stops compiling around nlist≈10³.)
    val assigned = unitCorpus
      .withColumn("cell", nearest_centroids(col("nv"), centroids, 1)(0))

    val unitQ = queries.select(col(idCol).as("query_id"), vector_normalize(col(vecCol)).as("qv"))
    val probed = unitQ
      .withColumn("cell", explode(nearest_centroids(col("qv"), centroids, nprobe)))
    val scored = assigned
      .join(broadcast(probed), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), vector_dot(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Train product-quantization codebooks: the vector is split into `m`
    * subspaces of dim/m dims and each gets an independent `ksub`-centroid
    * k-means codebook (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search"). Trained on (a sample of) the unit-normalized
    * corpus — one cached sample feeds all m fits, so the 100 TB corpus
    * is scanned once regardless of m. */
  def pqTrain(
      corpus: DataFrame,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      seed: Long = 42L,
      trainFraction: Double = 1.0,
      maxIter: Int = 10
  ): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val dsub = dim / m
    val unit = corpus.select(vector_normalize(col(vecCol)).as("nv"))
    val sample = deterministicTrainOrder(
      if (trainFraction < 1.0) unit.sample(trainFraction, seed) else unit, "nv").cache()
    try {
      (0 until m).map { s =>
        val train = sample.select(
          array_to_vector(slice(col("nv"), s * dsub + 1, dsub)).as("features"))
        val model = new KMeans().setK(ksub).setSeed(seed + s).setMaxIter(maxIter).fit(train)
        val centers = model.clusterCenters.map(_.toArray.toSeq).toSeq
        // k-means yields < ksub centers when a subspace has few distinct
        // points; pad to a uniform ksub so the ADC LUT stride is constant
        // (padded duplicates of center 0 lose every nearest-tie to index 0,
        // so they are never assigned)
        centers ++ Seq.fill(ksub - centers.length)(centers.head)
      }
    } finally { sample.unpersist(): Unit }
  }

  /** Encode each vector into m byte-sized codes (nearest sub-centroid per
    * subspace) — 256-dim float storage collapses to m bytes per vector,
    * the compression that makes a 100 TB embedding store scannable.
    * Row-local codegen'd expressions; no shuffle. */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]
  ): DataFrame = {
    val dsub = codebooks.head.head.length
    val codeCols = codebooks.indices.map { s =>
      nearest_centroids(slice(vector_normalize(col(vecCol)), s * dsub + 1, dsub),
        codebooks(s), 1)(0)
    }
    corpus.select(col(idCol).as("neighbor_id"), array(codeCols: _*).as("codes"))
  }

  /** PQ ADC top-k: each query precomputes its m×ksub inner-product lookup
    * table ONCE (PqLut), then every encoded corpus vector scores in O(m)
    * table lookups (PqScore) instead of an O(dim) dot product — against
    * codes 32× smaller than the raw floats. Queries ride a broadcast
    * nested-loop over the code scan (no corpus shuffle); recall vs
    * brute force is asserted in OperatorsSpec.
    *
    * `refine > 1` adds the standard exact re-ranking pass (the FAISS
    * IndexIVFPQR / DiskANN pattern): the ADC scan keeps a k·refine
    * shortlist per query, whose raw vectors are then fetched in ONE
    * map-side corpus pass (the shortlist is |Q|·k·refine rows — driver
    * small — so it broadcasts) and exact-cosine re-ranked. This is how
    * production PQ serves high recall: the lossy codes prune 100 TB down
    * to a shortlist, exact math decides the final order. */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L,
      trainFraction: Double = 1.0,
      refine: Int = 1,
      cacheKey: Option[String] = None
  ): DataFrame = {
    val codebooks = cachedModel(cacheKey)(pqTrain(corpus, vecCol, dim, m, ksub, seed, trainFraction))
    val encoded = pqEncode(corpus, idCol, vecCol, codebooks)
    val q = queries.select(col(idCol).as("query_id"),
      pq_lut(vector_normalize(col(vecCol)), codebooks).as("lut"))
    val scored = encoded
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pq_score(col("codes"), col("lut"), ksub).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    val adcTop = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k * refine)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    if (refine <= 1) adcTop
    else {
      val shortlist = adcTop.select(col("query_id"), col("neighbor_id"))
      val unitC = corpus.select(col(idCol).as("neighbor_id"), vector_normalize(col(vecCol)).as("nv"))
      val unitQ = queries.select(col(idCol).as("query_id"), vector_normalize(col(vecCol)).as("qv"))
      val rescored = unitC
        .join(broadcast(shortlist), Seq("neighbor_id"))
        .join(broadcast(unitQ), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"), vector_dot(col("qv"), col("nv")).as("sim"))
      rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }
  }

  /** IVF-PQ: the production 100 TB ANN layout — an IVF coarse quantizer
    * prunes the corpus to `nprobe`/`nlist` of its cells, and within the
    * probed cells vectors are scored from m-byte PQ codes via ADC lookup
    * tables, then the shortlist is exact-cosine re-ranked. Composes the
    * two quantizers this engine already has (FAISS IndexIVFPQ shape, Jégou
    * et al. §V; codes are built on the RAW unit vectors rather than
    * per-cell residuals — FAISS's by_residual=false variant — so encode
    * stays one row-local pass and the same codebook serves every cell).
    *
    * Plan shape: corpus side = one scan (assign cell + encode, both
    * codegen'd row-local expressions, no shuffle); query side = tiny
    * (cells × LUTs, broadcast); the ADC scan joins on the cell key; the
    * refine pass re-reads raw vectors for |Q|·k·refine ids (broadcast
    * semi-join against the scan — map-side). At scale, write the encoded
    * corpus partitioned by `cell` and a probe touches nprobe/nlist of the
    * files — the partition-pruning layout S16 already demonstrates. */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 32,
      refine: Int = 10,
      seed: Long = 42L,
      trainFraction: Double = 1.0,
      maxIter: Int = 10,
      cacheKey: Option[String] = None
  ): DataFrame = {
    val unitC = corpus.select(col(idCol).as("neighbor_id"), vector_normalize(col(vecCol)).as("nv"))
    val (centroids, codebooks) = cachedModel(cacheKey) {
      (trainCoarseCentroids(unitC, nlist, seed, trainFraction, maxIter),
        pqTrain(corpus, vecCol, dim, m, ksub, seed, trainFraction, maxIter))
    }
    val dsub = dim / m
    val codeCols = codebooks.indices.map { s =>
      nearest_centroids(slice(col("nv"), s * dsub + 1, dsub), codebooks(s), 1)(0)
    }
    // one corpus pass: cell assignment + PQ codes, both row-local codegen
    val encoded = unitC.select(
      col("neighbor_id"),
      nearest_centroids(col("nv"), centroids, 1)(0).as("cell"),
      array(codeCols: _*).as("codes"))

    val unitQ = queries.select(col(idCol).as("query_id"), vector_normalize(col(vecCol)).as("qv"))
    val probed = unitQ
      .select(col("query_id"), col("qv"),
        explode(nearest_centroids(col("qv"), centroids, nprobe)).as("cell"))
      .select(col("query_id"), col("cell"), pq_lut(col("qv"), codebooks).as("lut"))
    val scored = encoded
      .join(broadcast(probed), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pq_score(col("codes"), col("lut"), ksub).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    val adcTop = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k * refine)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
    if (refine <= 1) adcTop
    else {
      val shortlist = adcTop.select(col("query_id"), col("neighbor_id"))
      val rescored = unitC
        .join(broadcast(shortlist), Seq("neighbor_id"))
        .join(broadcast(unitQ), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"), vector_dot(col("qv"), col("nv")).as("sim"))
      rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }
  }

  /** Embedding-cosine near-duplicate pairs: multi-table LSH candidates with
    * exact cosine ≥ threshold. Equi-join on (tbl,bucket) — no cross join.
    *
    * Scale posture: the exploded (normalize + hash + explode) frame is
    * materialized ONCE via localCheckpoint before the self-join — without
    * it Spark recomputes the full corpus bucketing for both join sides.
    * `maxBucketSize` caps degenerate buckets (a near-zero hyperplane
    * projection on correlated embeddings makes one bucket quadratic) the
    * same way ngramJaccardPairs' maxDf caps stop-shingles. Pairs are
    * deduped on ids before the exact dot product so each candidate pair
    * is scored exactly once. */
  def embeddingNearDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      numTables: Int = 8,
      planesPerTable: Int = 8,
      seed: Long = 42L,
      maxBucketSize: Option[Int] = None
  ): DataFrame = {
    // more planes/table than the ANN path: near-dup thresholds (≥0.9)
    // mean tiny angles, which survive 8 hyperplane cuts with ~0.99 recall
    // while shrinking buckets ~16x (fewer candidate pairs to score)
    val tables = Seq.tabulate(numTables)(t => randomPlanes(dim, planesPerTable, seed + 7919 * t))
    val exploded = explodedBuckets(vectors, idCol, vecCol, "vid", "v", tables)
    val capped = maxBucketSize match {
      case Some(cap) =>
        // window count over the join key partitioning — one shuffle, and
        // buckets past the cap never reach the self-join (off by default so
        // the DuckDB oracle stays an exact replica of the candidate set)
        val wB = Window.partitionBy("tbl", "bucket")
        exploded
          .withColumn("bsz", count(lit(1)).over(wB))
          .filter(col("bsz") <= cap)
          .drop("bsz")
      case None => exploded
    }
    val v = capped.localCheckpoint()
    v.as("a")
      .join(v.as("b").withColumnRenamed("vid", "vid_b").withColumnRenamed("v", "v_b"), Seq("tbl", "bucket"))
      .filter(col("vid") < col("vid_b"))
      .dropDuplicates("vid", "vid_b")
      .select(col("vid").as("id_a"), col("vid_b").as("id_b"), vector_dot(col("v"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Seeded unit-norm centroids: a deterministic spherical partitioner
    * (nearest-centroid on unit vectors ≡ max-cosine cell). Trained k-means
    * centroids slot into the same assignment expression; the seeded form
    * keeps the operator a pure function of (seed, k) so an external SQL
    * engine can replicate the cells from literals. */
  def seededCentroids(dim: Int, k: Int, seed: Long): Seq[Seq[Double]] =
    randomPlanes(dim, k, seed).map { p =>
      val n = math.sqrt(p.map(x => x * x).sum)
      p.map(_ / n)
    }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning through semantic deduplication"): partition
    * the corpus into k spherical cells by nearest centroid, score pairwise
    * cosine ONLY within a cell, and flag every vector that has a lower-id
    * in-cell neighbor at/above `threshold` (min-id keeper rule, as
    * Graph.keepers). Candidate generation is one row-local codegen'd
    * assignment + one exchange on the cell id — no all-pairs. At 100 TB:
    * k grows with the corpus (k ≈ N / target cell size, the paper's
    * regime) so cells stay small and the within-cell self-join is bounded;
    * written `partitionBy(cell)`, each cell dedups without a second
    * shuffle. `maxCellSize` caps degenerate cells the same way
    * embeddingNearDupPairs' maxBucketSize does. */
  def semanticDedup(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      k: Int = 64,
      seed: Long = 42L,
      centroids: Option[Seq[Seq[Double]]] = None,
      maxCellSize: Option[Int] = None
  ): DataFrame = {
    val cents = centroids.getOrElse(seededCentroids(dim, k, seed))
    val assigned = vectors
      .select(col(idCol).as("vec_id"), vector_normalize(col(vecCol)).as("nv"))
      .withColumn("cluster", nearest_centroids(col("nv"), cents, 1)(0))
    val capped = maxCellSize match {
      case Some(cap) =>
        val wC = Window.partitionBy("cluster")
        assigned.withColumn("csz", count(lit(1)).over(wC)).filter(col("csz") <= cap).drop("csz")
      case None => assigned
    }
    // materialized once: both self-join sides and the final flag join read
    // the same assignment, not three recomputes of scan+normalize+assign
    val a = capped.localCheckpoint()
    val dups = a
      .join(a.select(col("vec_id").as("lo_id"), col("nv").as("lo_nv"), col("cluster")), Seq("cluster"))
      .filter(col("lo_id") < col("vec_id"))
      .filter(vector_dot(col("nv"), col("lo_nv")) >= threshold)
      .select("vec_id").distinct()
    a.join(dups.withColumn("is_dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }
}
