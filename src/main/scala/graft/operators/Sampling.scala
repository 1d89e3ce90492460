package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cluster-stable sampling for training-data pipelines.
  *
  * RNG-based `df.sample` changes membership under repartitioning/retries;
  * everything here derives membership from a HASH of a stable key, so the
  * same row lands in the same split on every run, any cluster size, and
  * any partitioning — the property that matters when a 100 TB corpus is
  * re-materialized incrementally (new files join the same splits).
  */
object Sampling {

  /** Train/validation/test split by key hash. Fractions must sum to ≤ 1;
    * remainder (if any) is dropped (useful for downsampling while
    * splitting). Adds a `split` column; membership is a pure function of
    * (key, seed). */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[(String, Double)],
      seed: Long = 42L
  ): DataFrame = {
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    // bucket in [0, 1): hash to 64-bit, scale the non-negative half
    val u = (abs(xxhash64(col(keyCol), lit(seed))).cast("double") / lit(Long.MaxValue.toDouble))
    val (expr, _) = fractions.foldLeft((lit(null).cast("string"), 0.0)) {
      case ((acc, lo), (name, frac)) =>
        val hi = lo + frac
        (when(u >= lo && u < hi, name).otherwise(acc), hi)
    }
    df.withColumn("split", expr).filter(col("split").isNotNull)
  }

  /** Oracle-portable hash split: same contract as [[hashSplit]] but the
    * bucket is the first 4 hex chars of `md5("<key>|<seed>")` compared
    * against cumulative-fraction thresholds quantized to 1/65536 — md5 and
    * lexicographic string compare are identical in Spark and ANSI-SQL
    * engines, so split membership is replayable (and driver-checkable) as
    * plain SQL. Fractions are honored to ±1/65536. Production path is
    * [[hashSplit]] (one 64-bit hash, no string materialization); this
    * variant exists to cross-validate it. */
  def hashSplitPortable(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[(String, Double)],
      seed: Long = 42L
  ): DataFrame = {
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val bucket = substring(md5(concat(col(keyCol).cast("string"), lit(s"|$seed"))), 1, 4)
    val (expr, _) = fractions.foldLeft((lit(null).cast("string"), 0.0)) {
      case ((acc, lo), (name, frac)) =>
        val hi = lo + frac
        val loHex = f"${math.round(lo * 65536)}%04x"
        // fractions summing to 1 ("ffff" is in the last split): skip the
        // upper bound instead of emitting a 5-char "10000" literal, which
        // would compare lexicographically BELOW every 4-char bucket
        val cond =
          if (math.round(hi * 65536) >= 65536L) bucket >= loHex
          else bucket >= loHex && bucket < f"${math.round(hi * 65536)}%04x"
        (when(cond, name).otherwise(acc), hi)
    }
    df.withColumn("split", expr).filter(col("split").isNotNull)
  }

  /** Per-row weighted Bernoulli keep (quality-weighted downsampling — the
    * "sample good documents more" step of corpus curation): row survives
    * iff u(key) < weight, where u is a deterministic uniform in [0,1)
    * derived from the md5 hex prefix of the salted key — so membership is
    * a pure function of (key, seed), stable under repartition/retry, and
    * the whole filter replays as plain SQL (`('0x'||substr(md5(..),1,4))
    * ::INT / 65536.0`), which is how the x4 oracle hash-checks it.
    * u is quantized to 1/65536 — weights are honored to ±1.5e-5. */
  def weightedKeepPortable(
      df: DataFrame,
      keyCol: String,
      weight: Column,
      seed: Long = 42L
  ): DataFrame = {
    val u = (conv(substring(md5(concat(col(keyCol).cast("string"), lit(s"|ws$seed"))), 1, 4), 16, 10)
      .cast("double") / 65536.0)
    df.withColumn("keep_p", weight.cast("double"))
      .withColumn("u", u)
      .filter(col("u") < col("keep_p"))
  }

  /** Epoch-repeat to a token budget — the "how many epochs of each source"
    * step of corpus curation (the fractional-epoch repeat schedule of
    * GLaM/PaLM-style data mixtures): given a per-source token budget,
    * repeat factor r = budget / source_tokens, and every doc is emitted
    * floor(r) times plus one extra epoch with probability frac(r),
    * decided by a deterministic per-doc hash — so a 1.3-epoch source
    * repeats every doc once and a stable, reproducible 30% of docs twice,
    * and r < 1 downsamples (possibly to zero epochs). All arithmetic is
    * quantized (r to 4 dp, the hash draw to 1/65536) and the hash is the
    * portable md5 bucket, so the whole schedule replays as plain SQL and
    * is a pure function of (doc key, seed): stable under repartitioning,
    * retries, and incremental re-materialization. Plan shape: ONE agg for
    * source token totals (n_sources rows, broadcast back) + a map-side
    * explode — no shuffle of the corpus itself. */
  def tokenBudgetRepeat(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      tokensCol: String,
      budgets: DataFrame, // (sourceCol, budget_tokens)
      seed: Long = 42L
  ): DataFrame = {
    val srcTok = docs.groupBy(col(sourceCol)).agg(sum(col(tokensCol)).as("src_tokens"))
    val rate = srcTok
      .join(budgets, Seq(sourceCol))
      .select(col(sourceCol),
        round(col("budget_tokens").cast("double") / col("src_tokens"), 4).as("r"))
    val base = floor(col("r")).cast("int")
    val thr = round((col("r") - floor(col("r"))) * 65536, 0).cast("int")
    val u16 = conv(substring(md5(concat(col(idCol).cast("string"), lit(s"|ep$seed"))), 1, 4), 16, 10)
      .cast("int")
    val epochs = (base + when(u16 < thr, 1).otherwise(0)).as("n_epochs")
    docs
      .join(broadcast(rate), Seq(sourceCol))
      .select(col(idCol), col(sourceCol), epochs)
      .select(col(idCol), col(sourceCol),
        explode(when(col("n_epochs") >= 1, sequence(lit(1), col("n_epochs")))
          .otherwise(array().cast("array<int>"))).as("epoch"))
  }

  /** Deterministic global shuffle — training-example randomization as a
    * pure function of (key, seed): order key = md5 of the salted key,
    * shard = the order key's first `hexChars` hex chars, position = rank
    * within shard. The scale shape: NO single-partition global sort —
    * shards are hash-uniform slices of the md5 keyspace, so `hexChars`
    * sets the fan-out (16^hexChars shards) and each shard's row_number
    * window sorts ~N/shards rows in parallel. The total order is
    * (shard, pos) lexicographic and reproducible across runs,
    * partitionings, retries, and engines (the x8 oracle replays it as
    * plain SQL). At 100 TB: raise hexChars (4 → 65 536 shards), write
    * one file per shard — a reader streaming shards in key order sees a
    * fully shuffled corpus without any epoch-time shuffle at all. */
  def globalShuffle(
      df: DataFrame,
      keyCol: String,
      seed: Long = 42L,
      hexChars: Int = 1
  ): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, "hexChars must be in [1, 8]")
    val okey = md5(concat(col(keyCol).cast("string"), lit(s"|gs$seed")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("okey"), col(keyCol))
    df.withColumn("okey", okey)
      .withColumn("shard", substring(col("okey"), 1, hexChars))
      .withColumn("pos", row_number().over(w))
  }

  /** Per-key top-k cut — the per-domain quota's PRODUCTION form (x18b;
    * x18 keeps all rows with a keep flag for auditability). Keeps the k
    * best rows per key under `order` (the caller's order columns must be
    * a total order per key for a deterministic cut — tie-break on a
    * unique id). The `rnk <= k` filter sits DIRECTLY above the
    * row_number so Catalyst's InferWindowGroupLimit rewrites it into a
    * partial-then-final WindowGroupLimit: every map task forwards at
    * most k rows per key BEFORE the exchange, so a hot key ships k rows
    * — not its corpus share — and the post-shuffle straggler is bounded
    * by k·|tasks|, not by the key's row count. Plan-pinned in
    * PlanAuditSpec. */
  def topKPerKey(
      df: DataFrame,
      keyCol: Column,
      k: Int,
      order: Seq[Column],
      rankCol: String = "rnk"
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // withColumn would silently REPLACE an existing rankCol and corrupt
    // caller data — a collision must fail loudly
    require(!df.columns.contains(rankCol),
      s"input already has a column named '$rankCol' — pass a different rankCol")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Stratified downsample: per-stratum keep fraction, deterministic by key
    * hash (the hash is salted with the stratum so strata are independent). */
  def stratifiedByHash(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      fractionPerStratum: Map[String, Double],
      seed: Long = 42L
  ): DataFrame = {
    val u = (abs(xxhash64(col(keyCol), col(strataCol), lit(seed))).cast("double") / lit(Long.MaxValue.toDouble))
    val keepFrac = fractionPerStratum.foldLeft(lit(0.0)) {
      case (acc, (stratum, f)) => when(col(strataCol) === stratum, f).otherwise(acc)
    }
    df.filter(u < keepFrac)
  }
}
