package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.BpeEncode

/** BPE tokenizer TRAINING on the corpus' own statistics (Sennrich et al.
  * 2016) — the learned counterpart of t6's fixed regex pre-tokenizer.
  *
  * Shaped for 100 TB the way production trainers (SentencePiece, HF
  * tokenizers) are: the corpus-sized job is ONE word-frequency
  * extraction (explode + groupBy word with map-side partial counts);
  * merge learning then runs on the word HISTOGRAM, which is Zipf-bounded
  * and capped at `vocabWords` via `orderBy(desc).limit(K)` — Spark plans
  * TakeOrderedAndProject (per-partition heaps + one K-row driver merge,
  * never a global sort), the same bounded-collect pattern as
  * LanguageModel's vocabulary. The histogram loop is driver-side on
  * vocab-sized data, exactly like k-means centroid updates; the corpus
  * itself is never iterated.
  *
  * Determinism: word ties in the top-K cut break by word; pair-frequency
  * ties in each merge round break lexicographically. Both the histogram
  * (exact long sums) and the loop are partitioning-independent, so the
  * learned merge table is a pure function of (corpus, numMerges,
  * vocabWords).
  */
object Bpe {

  private val memo = new ConcurrentHashMap[String, Seq[(String, String)]]()

  /** Learn `numMerges` merges from the top-`vocabWords` word histogram. */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      vocabWords: Int,
      cacheKey: Option[String] = None
  ): Seq[(String, String)] = {
    def train: Seq[(String, String)] = {
      val hist = docs
        .select(explode(split(col(textCol), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("f"))
        .orderBy(desc("f"), asc("w"))
        .limit(vocabWords)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
      learnFromHistogram(hist, numMerges)
    }
    cacheKey match {
      case Some(k) => memo.computeIfAbsent(k, _ => train)
      case None    => train
    }
  }

  /** The classic histogram merge loop: count adjacent symbol pairs
    * weighted by word frequency, fuse the most frequent pair
    * (lexicographic tie-break), repeat. Runs on vocab-sized data. */
  def learnFromHistogram(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var vocab: Array[(Array[String], Long)] = wordFreq.map { case (w, f) =>
      (w.toCharArray.map(String.valueOf) :+ BpeEncode.EndMark, f)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = merges.length < numMerges
    while (continue) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- vocab) {
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, f) => (BpeEncode.mergeAll(syms, best._1, best._2), f) }
        continue = merges.length < numMerges
      }
    }
    merges.toSeq
  }

  def encode(text: Column, merges: Seq[(String, String)]): Column =
    BpeEncode.bpe_encode(text, merges)
}
