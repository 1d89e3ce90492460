package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical (BM25) retrieval and hybrid rank fusion over the document
  * corpus — the search-side counterpart of [[Similarity]]'s embedding
  * ANN. A training-data pipeline uses this for boilerplate hunting,
  * eval-set mining, and hybrid (lexical + semantic) retrieval; a serving
  * stack uses the same plan as its batch re-indexing job.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - the query set is broadcast TWICE as a term set — once to semi-join
  *    the exploded corpus postings down to query terms BEFORE any
  *    shuffle, once to attach (query_id, term) after the tf reduce. The
  *    corpus is never shuffled on anything but (doc_id, term) of
  *    query-term postings — a tiny fraction of the full postings list.
  *  - document frequency is computed over the SAME query-term-restricted
  *    postings (df of a term the query never mentions is irrelevant), so
  *    the df aggregate is |query terms| rows, broadcast back.
  *  - corpus-level stats (N, avgdl) are ONE 1-row aggregate, broadcast.
  *  - nothing in the plan is proportional to |corpus| x |queries| except
  *    the final per-(query, candidate-doc) score frame, which is bounded
  *    by the postings that actually share a term with the query.
  */
object Retrieval {

  /** Okapi BM25 top-k: for each query document, the k highest-scoring
    * corpus documents under BM25(k1, b) with the standard
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf. Scores are rounded to 6 dp
    * BEFORE ranking so the ordering is reproducible across engines and
    * summation orders (t16's ln-rounding precedent); ties break by
    * doc_id. Self-matches are excluded.
    *
    * Output: (query_id, doc_id, rank, score). Only documents sharing at
    * least one term with the query appear (BM25 of a disjoint doc is 0
    * and unranked).
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String, textCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFromScores(bm25Scores(docs, queries, idCol, textCol, k1, b), k)

  /** The k-free half of [[bm25TopK]]: the per-(query, candidate-doc)
    * BM25 score frame — everything proportional to the corpus (both
    * tokenize scans, the one postings exchange, the score reduce) and
    * nothing proportional to k. Split out (round 14) so callers that
    * rank the SAME query set at different k (s8 at 10, s9's lexical arm
    * at 20) or across repeated batches can build this once — at 100 TB
    * the postings index is a materialized table probed per query batch,
    * never rebuilt per query ([[graft.core.FrameMemo]] is the bench-
    * session analog). */
  def bm25Scores(docs: DataFrame, queries: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = split(col(textCol), " ", -1)

    // (query_id, term) distinct — the broadcast side. Small by contract.
    val queryTerms = queries
      .select(col(idCol).as("query_id"), explode(toks).as("term"))
      .distinct()
    val termSet = queryTerms.select("term").distinct()

    // corpus postings restricted to query terms BEFORE the tf shuffle:
    // explode is map-side, the broadcast left_semi keeps only rows whose
    // term the query set mentions, and only those reach the exchange.
    val postings = docs
      .select(col(idCol).as("doc_id"), size(toks).as("dl"), explode(toks).as("term"))
      .join(broadcast(termSet), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

    // document frequency per query term over the restricted postings —
    // |query terms| rows, broadcast back onto the postings.
    val df = postings.groupBy("term").agg(count(lit(1)).as("df"))

    // N and avgdl: one corpus scan, 1-row aggregate, broadcast cross
    // join (the MlFeatures stats-row pattern). avgdl as sum/count keeps
    // the division identical in the SQL replay.
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(size(toks)).cast("double") / count(lit(1))).as("avgdl"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / col("avgdl")))
    val termScore = idf * (col("tf") * (lit(k1) + lit(1.0))) / norm

    postings
      .join(broadcast(df), Seq("term"))
      .join(broadcast(queryTerms), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(termScore), 6).as("score"))
  }

  /** The k-dependent half of [[bm25TopK]]: rank a [[bm25Scores]] frame
    * and keep the top k per query — one window over the (bounded)
    * candidate frame, WindowGroupLimit-prunable map-side. */
  def bm25TopKFromScores(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two ranked lists —
    * the standard hybrid-retrieval combiner: rrf = Σ 1/(c + rank) over
    * the lists that ranked the doc. Pure rational arithmetic on two
    * terms (no ln, no order-dependent float sum), so the fused score is
    * bit-identical across engines. Inputs carry (query_id, doc_id/
    * neighbor_id, rank); the fused top-k re-ranks by (rrf DESC, doc_id).
    */
  def rrfFuse(lexical: DataFrame, semantic: DataFrame, k: Int, c: Int = 60): DataFrame = {
    val lex = lexical.select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val sem = semantic.select(col("query_id"), col("neighbor_id").as("doc_id"),
      col("rank").as("sem_rank"))
    val fused = lex
      .join(sem, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        (coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("sem_rank")), lit(0.0))).as("rrf"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("rrf"))
  }
}
