package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: assign documents to
  * fixed-token-budget training sequences ("bins"), the step between a
  * cleaned corpus and a token-efficient dataloader (unpacked batches waste
  * budget on padding).
  *
  * The packer is OFFSET-BASED first-fit: documents are ordered
  * deterministically within each packing group, and a document joins the
  * bin its cumulative-token offset falls into. Bins may overrun the budget
  * by at most one document — the standard streaming-pack approximation.
  * The exact greedy packer is inherently sequential (each placement depends
  * on every earlier one); offset packing is a pure window function, so it
  * parallelizes per group and its output is a deterministic function of
  * (data, ordering) — replayable as plain SQL, hence driver-checkable.
  *
  * 100 TB posture: ONE shuffle, on the group key. Each group's window sorts
  * locally within its partition; groups are independent, so skew is bounded
  * by the largest group (choose groupCol with enough cardinality — e.g.
  * source × date — the same rule as any partition-by-window pipeline).
  */
object Packing {

  /** Adds `seq_id` (the bin) per row. `tokensCol` must be a non-negative
    * numeric column; `budget` is the per-sequence token target. */
  def packSequences(
      docs: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offset = coalesce(sum(col(tokensCol)).over(w), lit(0L))
    docs.withColumn("seq_id", floor(offset / budget.toDouble).cast("long"))
  }

  /** Per-sequence summary: doc count, token fill, fill ratio vs budget.
    * The shape a dataloader manifest consumes. */
  def packedSummary(
      docs: DataFrame,
      groupCol: String,
      orderCol: String,
      tokensCol: String,
      budget: Long
  ): DataFrame =
    packSequences(docs, groupCol, orderCol, tokensCol, budget)
      .groupBy(col(groupCol), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("seq_tokens")
      )
      .withColumn("fill_ratio", col("seq_tokens").cast("double") / budget.toDouble)
}
