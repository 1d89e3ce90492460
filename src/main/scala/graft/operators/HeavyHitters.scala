package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-key mining (heavy hitters) without ever shuffling the
  * long-tail key universe — the corpus-statistics primitive behind
  * stopword discovery, boilerplate n-gram detection, and join-key skew
  * diagnosis (the reference's pandas `value_counts` distribution
  * metrics — ops/data_processing_ops.py:402,438,453 — re-expressed as a
  * distributed plan that survives an unbounded key universe).
  *
  * The naive `groupBy(key).count().filter(cnt >= f)` shuffles one row per
  * DISTINCT key — at 100 TB of text the n-gram tail is billions of keys
  * that are each seen a handful of times and then discarded. This
  * operator never moves them:
  *
  *  1. '''Sketch''': a count–min sketch is built with one BOUNDED
  *     shuffle — keys hash into `depth × width` counters keyed on
  *     (depth, bucket), so after map-side partial aggregation at most
  *     depth·width rows leave each task regardless of corpus size.
  *  2. '''Probe''': the sketch (≤ depth·width rows by construction — the
  *     bucket space bounds it, not the data) is collected and embedded
  *     as literal counter arrays, so each key occurrence computes its
  *     estimate map-side — `least` over its depth counters, the CMS
  *     upper bound, which can overestimate (collisions) but NEVER
  *     underestimates. This makes the operator eager at construction
  *     (one bounded job), the trained-model convention of
  *     Similarity/Quantization.
  *  3. '''Exact recount''': only occurrences whose estimate clears
  *     `minCount` reach the key-keyed shuffle; a final exact
  *     count + filter removes collision survivors.
  *
  * Because step 2 never underestimates, the candidate set is a superset
  * of the true frequent set for ANY partitioning, width, or depth, and
  * step 3 makes the output exactly `{key, cnt : cnt ≥ minCount}` —
  * deterministic and identical to the naive plan (the oracle replays the
  * naive form). Costs two scans of the input instead of one; the
  * exchange saved is the distinct-key tail, which at corpus scale dwarfs
  * a rescan.
  */
object HeavyHitters {

  /** Sketch-size bound: the counters embed as plan LITERALS, so a 3×1M
    * sketch would inflate the plan and its generated code by tens of MB
    * before any data flows. Don't widen the sketch to chase precision —
    * raise `minCount` (fewer collision candidates reach the exact
    * recount) or add a depth row instead. */
  val MaxCounters: Long = 65536L

  /** All keys occurring at least `minCount` times, with exact counts.
    * `keys` is a one-column-of-interest frame; extra columns are ignored.
    * `depth × width` bounds both the sketch shuffle and the broadcast
    * (default 3×4096 = 12k counters ≈ 200 KB), and is capped at
    * [[MaxCounters]]. Smaller widths only cost extra collision candidates
    * in step 3, never correctness. */
  def frequentKeys(
      keys: DataFrame,
      keyCol: String,
      minCount: Long,
      depth: Int = 3,
      width: Int = 4096
  ): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    require(depth.toLong * width <= MaxCounters,
      s"depth*width = ${depth.toLong * width} exceeds $MaxCounters: the sketch embeds as plan " +
        "literals, so oversizing it inflates the plan/codegen by megabytes — raise minCount " +
        "(collision candidates are filtered exactly in the recount) instead of widening")
    require(minCount >= 1, "minCount must be positive")
    val k = col(keyCol)

    val bucketRows = keys.select(explode(array((0 until depth).map { j =>
      struct(lit(j).as("j"), pmod(xxhash64(lit(j), k), lit(width)).as("b"))
    }: _*)).as("jb"))
    val cms = bucketRows
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("c"))

    // The sketch is ≤ depth×width rows BY CONSTRUCTION (the bucket space,
    // not the data, bounds it), so collect it and embed the counters as
    // array literals — the probe is then a pure map-side expression and
    // the operator scans the input exactly twice: sketch + probe/recount.
    // (Per-depth broadcast-join probes were tried first: Catalyst pushes
    // the depth selector into each build side, defeating exchange reuse
    // and re-scanning the corpus once per depth. Same bounded-collect
    // pattern as Quantization's per-dim stats and Similarity's trained
    // models.)
    val tables: Array[Array[Long]] = Array.fill(depth)(Array.fill(width)(0L))
    cms.collect().foreach { r =>
      tables(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2)
    }
    val perDepth = (0 until depth).map { j =>
      element_at(
        typedLit(tables(j).toSeq),
        (pmod(xxhash64(lit(j), k), lit(width)) + 1).cast("int"))
    }
    val est = if (depth == 1) perDepth.head else least(perDepth: _*)

    keys.select(k)
      .filter(est >= minCount)
      .groupBy(k)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
