package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Equi-depth bucket assignment against a broadcast boundary array, as a
  * binary search: `bounds_rank(v, bounds)` = COUNT of sorted boundaries
  * ≤ v — the bucket id used by the RangeRank / Percentiles distributed-
  * selection operators.
  *
  * Why not `size(filter(array(b₁…b_B), b -> b <= v))`: that probe is
  * O(B) per row AND materializes the boundary list as B literal
  * expressions in the plan. B equals the shuffle-partition count, so at
  * the 32 partitions of local test runs the linear scan is noise, but at
  * cluster-scale partition counts (2048+) it is a 60×-wasted inner loop
  * on EVERY input row and a plan tree with thousands of literal nodes.
  * This expression carries the boundaries as ONE reference object
  * (double[], the codebook/sketch pattern) and answers in O(log B) via
  * `Arrays.binarySearch`; `doGenCode` emits a single static call, so the
  * probe stays inside the enclosing whole-stage-codegen stage.
  *
  * Semantics match the array-filter probe exactly (boundaries are
  * distinct+sorted by the callers): count of bounds ≤ v under SPARK's
  * comparison order, where NaN is greater than every other double — so
  * NaN lands in the top bucket (B), which is also what
  * `Arrays.binarySearch`'s total order yields natively; null in → null
  * out.
  */
case class BoundsRank(child: Expression, bounds: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounds_rank expects a double column, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    BoundsRank.compute(v.asInstanceOf[Double], bounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("boundsRankArr", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.plans.BoundsRank.compute($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BoundsRank {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toCol, toExpr}

  /** @param bounds MUST be sorted ascending and duplicate-free (the
    *               callers' `.distinct.sorted` contract). */
  def bounds_rank(v: Column, bounds: Array[Double]): Column =
    toCol(BoundsRank(toExpr(v), bounds))

  /** Count of bounds ≤ v. NaN → bounds.length (Spark's `b <= NaN` is
    * true for every b — NaN sorts greatest — and binarySearch's total
    * order agrees, so no special case is needed). A -0.0 PROBE is
    * canonicalized to +0.0 first: the `b <= v` filter this replaces uses
    * primitive comparison (-0.0 == 0.0) while binarySearch's total order
    * puts -0.0 BELOW +0.0, which would skip a 0.0 boundary. A -0.0
    * boundary needs no such fix — total order ranks it below/equal to
    * any zero probe, which is what primitive `<=` says too. */
  def compute(v: Double, bounds: Array[Double]): Int = {
    val key = if (v == 0.0d) 0.0d else v
    val i = java.util.Arrays.binarySearch(bounds, key)
    if (i >= 0) i + 1 else -(i + 1)
  }
}
