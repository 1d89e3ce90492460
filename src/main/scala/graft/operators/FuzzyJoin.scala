package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance (Levenshtein) self-join — approximate string
  * matching for entity resolution / fuzzy dedup of names, titles, and
  * short identifiers, the string-side analogue of the embedding near-dup
  * operators in [[Dedup]].
  *
  * Never all-pairs: candidate pairs are generated ONLY inside a blocking
  * key (one equi-join shuffle on the block columns), and the quadratic
  * work is bounded by the largest block. The caller picks blocking
  * columns that keep blocks small (here: a token of the string plus an
  * orthogonal attribute); `maxBlock` is a hard skew guard in the same
  * spirit as Dedup's maxDf — a block larger than the cap is dropped
  * whole (a block that big means the blocking key is degenerate, and its
  * pairs would dominate the stage). The levenshtein predicate itself is
  * a codegen'd builtin evaluated post-join, never a join condition, so
  * the join stays a hash equi-join.
  */
object FuzzyJoin {

  /** Self-join `df` on equality of `blockCols`, keep pairs (idA < idB)
    * whose `strCol` values are within `maxDist` edits.
    *
    * `lengthBucketWidth` (default 8) appends `length(strCol) div w` to the
    * block key. This is the scale-stability lever: on any corpus whose
    * attribute vocabulary is finite (TPC-H p_name by construction — 5
    * words from a 92-word list — and natural-language name corpora behave
    * the same), the caller-supplied block key's cardinality is bounded, so
    * block MEMBERSHIP grows linearly with corpus size and candidate-pair
    * work grows quadratically until the maxBlock guard truncates. The
    * length bucket multiplies key cardinality by the length spread,
    * keeping membership (and thus per-block pair work) ~constant across a
    * 10x corpus growth. Standard blocking recall trade-off: a true pair
    * straddling a bucket boundary is missed (|len diff| <= maxDist, so
    * width >= 2*maxDist+2 keeps the miss band narrow); pass None for the
    * exhaustive-within-block behavior.
    *
    * Output: (id_a, id_b, name_a, name_b, dist) with dist as long.
    */
  def blockedLevenshtein(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockCols: Seq[String],
      maxDist: Int,
      maxBlock: Option[Int] = Some(1000),
      lengthBucketWidth: Option[Int] = Some(8)
  ): DataFrame = {
    lengthBucketWidth.foreach { w =>
      require(w >= 1, s"lengthBucketWidth must be >= 1, got $w")
      // the derived bucket column joins the block key; a caller column of
      // the same name would silently double into the key (topKPerKey's
      // collision rule)
      require(!df.columns.contains("_len_b") && !blockCols.contains("_len_b"),
        "input already has a column named '_len_b' — rename it or pass lengthBucketWidth = None")
    }
    val lenCols = lengthBucketWidth.toSeq.map(w =>
      expr(s"length(${strCol}) div ${w}").as("_len_b"))
    val allBlockCols = blockCols ++ lengthBucketWidth.map(_ => "_len_b")
    val base0 = df.select(
      (col(idCol).as("id") +: col(strCol).as("name") +:
        (blockCols.map(c => col(c)) ++ lenCols)): _*)
    val base = maxBlock match {
      case Some(cap) =>
        // block-size census as a window count over the SAME partitioning
        // the self-join shuffles on — no broadcast of the (unbounded)
        // block-key set, no extra exchange shape
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(allBlockCols.map(col): _*)
        base0
          .withColumn("_bn", count(lit(1)).over(w))
          .filter(col("_bn") <= cap)
          .drop("_bn")
      case None => base0
    }
    val a = base.select(
      (col("id").as("id_a") +: col("name").as("name_a") +:
        allBlockCols.map(c => col(c))): _*)
    val b = base.select(
      (col("id").as("id_b") +: col("name").as("name_b") +:
        allBlockCols.map(c => col(c))): _*)
    // banded Ukkonen distance (plans/EditDistanceExpressions): exact for
    // every surviving pair (value == builtin levenshtein when <= maxDist)
    // but O(k·len) with length-gap and dead-band short-circuits on the
    // dominant non-matching pairs, and codegen'd like the builtin
    val dist = graft.plans.LevenshteinWithin
      .levenshtein_within(col("name_a"), col("name_b"), maxDist)
    a.join(b, allBlockCols)
      .filter(col("id_a") < col("id_b"))
      .filter(dist <= maxDist)
      .select(
        col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        dist.cast("long").as("dist"))
  }
}
