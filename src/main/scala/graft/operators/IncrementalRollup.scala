package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance — the engine-side semantics of the
  * reference's async-refresh materialized view
  * (macros/create_starrocks_materialized_view.sql:1-16 `REFRESH ASYNC`)
  * and of dbt-style incremental models: keep a stored PARTIAL aggregate
  * per group and fold newly-arrived partitions into it instead of
  * recomputing the world.
  *
  * Only ALGEBRAIC aggregates participate (count/sum/min/max — each
  * merges by an aggregate of the same or dual kind), which is exactly
  * the class a delta-refresh MV can maintain; AVG is derived as
  * sum/count at read time, and holistic aggregates (median, distinct)
  * need the full input or a mergeable sketch (a5b/a25b's HLL path).
  *
  * Scale posture: `partial` is one partial-agg'd shuffle over ONLY the
  * new partition; `merge` is one shuffle over |groups| rows per state
  * frame — the whole point is that steady-state cost tracks the delta,
  * not the accumulated history. Merge is associative and commutative,
  * so states can themselves be merged hierarchically (per-hour →
  * per-day → total) without ever touching raw rows twice.
  */
object IncrementalRollup {

  /** Aggregate spec: (inputCol, kind) with kind ∈ count|sum|min|max.
    * Output column is named `<col>_<kind>` (count uses `n`). */
  type Spec = Seq[(String, String)]

  private def outName(c: String, kind: String): String =
    if (kind == "count") "n" else s"${c}_$kind"

  /** One partition's partial aggregate — the unit a refresh folds in.
    * Sums go through DECIMAL(28,6) so partial+merge is EXACT and
    * order-independent (a double sum would make `merge(partial…)` differ
    * from the full recompute it must equal). */
  def partial(df: DataFrame, keys: Seq[String], specs: Spec): DataFrame = {
    val aggs = specs.map {
      case (_, "count") => count(lit(1)).as("n")
      case (c, "sum") => sum(col(c).cast("decimal(28,6)")).as(outName(c, "sum"))
      case (c, "min") => min(col(c)).as(outName(c, "min"))
      case (c, "max") => max(col(c)).as(outName(c, "max"))
      case (c, k) => throw new IllegalArgumentException(s"non-algebraic agg $k($c)")
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold any number of partial states into one — count/sum re-SUM,
    * min/max re-MIN/MAX. merge(partial(a), partial(b)) == partial(a ∪ b)
    * by construction; groups present in only some states merge fine
    * (union + group, no join, no null-coalescing edge cases). */
  def merge(states: Seq[DataFrame], keys: Seq[String], specs: Spec): DataFrame = {
    val aggs = specs.map {
      case (_, "count") => sum(col("n")).as("n")
      case (c, "sum") => sum(col(outName(c, "sum"))).as(outName(c, "sum"))
      case (c, "min") => min(col(outName(c, "min"))).as(outName(c, "min"))
      case (c, "max") => max(col(outName(c, "max"))).as(outName(c, "max"))
      case (c, k) => throw new IllegalArgumentException(s"non-algebraic agg $k($c)")
    }
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
