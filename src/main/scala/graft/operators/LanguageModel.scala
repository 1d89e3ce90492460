package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-statistics language-model scoring for training-data quality
  * filtering — the CCNet/KenLM-style "how typical is this document of the
  * corpus" signal, built from the corpus' own unigram statistics.
  *
  * Shapes chosen for 100 TB:
  *   - token → document-frequency is the classic inverted-index shuffle
  *     (groupBy token with map-side partial counts);
  *   - the top-K vocabulary comes from `orderBy(desc(cnt)).limit(K)` —
  *     Spark plans TakeOrderedAndProject (per-partition heaps + one
  *     driver merge of K rows), never a global sort — and is broadcast
  *     back, so the scoring join adds no extra shuffle of the big side;
  *   - per-doc aggregation is one exchange on doc_id.
  */
object LanguageModel {

  /** Bigram-LM corpus typicality — t10's unigram signal upgraded to
    * conditional probability: score each doc by the average log p(w2|w1)
    * of its bigrams under the corpus's own bigram counts (c12 over the
    * count of w1 as a non-final token). Self-trained on the scored corpus
    * means every observed bigram has mass — no smoothing parameter to
    * match across engines, so the score is fully SQL-replayable (6-dp
    * rounding absorbs ln()/summation-order drift with a boundary-hit
    * probability ~1e-8 per doc; 12 dp sat on the rounding grid edge).
    *
    * Scale shape: bigram counts reduce on the gram key before anything
    * else; the per-first-token totals come from a window over that
    * REDUCED frame (vocab²-bounded, not corpus-bounded); the occurrence
    * frame joins only the reduced counts (sort-merge on gram at scale,
    * AQE demotes to broadcast when the vocab is small). No driver-side
    * vocabulary, no collect. */
  def bigramTypicality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the occurrence frame is pinned to ONE explicit exchange on the gram
    // key: the counts branch and the scoring join both hang off the same
    // shuffle, so AQE's runtime stage dedup materializes the scan+explode
    // once; the SHUFFLE_HASH hint keeps the vocab aggregate the build side
    // (file-size stats at toy scale would otherwise broadcast the
    // corpus-sized occurrence explosion)
    val bi = docs.select(
      col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.wordShinglesAll(col(textCol), 2)).as("g"))
      .repartition(col("g"))
    val bg = bi.groupBy("g").agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("c1", sum("c12").over(Window.partitionBy("w1")))
    bi.join(bg.hint("shuffle_hash"), Seq("g"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(col("c12").cast("double") / col("c1"))), 6).as("avg_logp"))
  }

  /** Per-document corpus-typicality statistics, all integer-exact (counts
    * and single divisions), so results are engine-reproducible:
    * `n_tokens`, `sum_df` (sum of each token instance's corpus frequency),
    * `avg_df`, `oov_cnt`/`oov_rate` (tokens outside the top-`topK`
    * most-frequent vocabulary; vocabulary ties broken by token for
    * determinism). High `oov_rate` + low `avg_df` = atypical/noisy doc. */
  def corpusTypicality(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 1000
  ): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val df = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val vocab = broadcast(
      df.orderBy(desc("cnt"), asc("tok")).limit(topK)
        .select(col("tok"), lit(1).as("__in")))
    tok
      .join(df.hint("shuffle_hash"), Seq("tok"))
      .join(vocab, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("cnt")).as("sum_df"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("oov_cnt")
      )
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("sum_df"),
        (col("sum_df").cast("double") / col("n_tokens")).as("avg_df"),
        col("oov_cnt"),
        (col("oov_cnt").cast("double") / col("n_tokens")).as("oov_rate")
      )
  }

  /** Per-document average negative log-probability under the corpus'
    * own unigram model (≈ log-perplexity): the production quality-filter
    * score. Float log/summation order is engine-specific, so this
    * variant is differentially spec-tested rather than oracle-hashed. */
  def unigramNegLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val df = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = df.agg(sum(col("cnt")).as("total"))
    tok
      .join(df.hint("shuffle_hash"), Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(avg(-log(col("cnt").cast("double") / col("total"))).as("avg_neg_logprob"))
  }
}
