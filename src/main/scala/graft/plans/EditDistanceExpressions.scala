package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Threshold-banded Levenshtein (Ukkonen 1985) as a native codegen
  * expression: `levenshtein_within(a, b, k)` returns the exact edit
  * distance when it is ≤ k and the sentinel k+1 otherwise.
  *
  * Why not the builtin `levenshtein`: a fuzzy-match filter
  * `levenshtein(a,b) <= k` pays the full O(|a|·|b|) dynamic program on
  * EVERY candidate pair — including the overwhelming majority whose
  * distance is far above k (d17's blocked join discards them). The
  * banded program only visits the 2k+1-wide diagonal band — O(k·min(|a|,
  * |b|)) — and exits before touching a single cell when the length gap
  * alone exceeds k, or mid-scan the moment the band's minimum passes k.
  * At k=3 over 100-char strings that is ~14× fewer cells, and the
  * short-circuits dominate on real blocked workloads where most pairs
  * miss. Distance is over Unicode code points, matching the builtin's
  * semantics (and DuckDB's) on every input, not just ASCII.
  *
  * `doGenCode` emits one static call, so the predicate stays inside the
  * enclosing whole-stage-codegen stage like any builtin.
  */
case class LevenshteinWithin(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 0, "threshold must be >= 0")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"levenshtein_within expects string columns, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(l: Any, r: Any): Any =
    LevenshteinWithin.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.plans.LevenshteinWithin.compute($l, $r, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LevenshteinWithin {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toCol, toExpr}

  def levenshtein_within(a: Column, b: Column, k: Int): Column =
    toCol(LevenshteinWithin(toExpr(a), toExpr(b), k))

  /** min(levenshtein(a, b), k + 1) over code points, visiting only the
    * ±k diagonal band. */
  def compute(a: UTF8String, b: UTF8String, k: Int): Int = {
    val s = a.toString.codePoints.toArray
    val t = b.toString.codePoints.toArray
    // ensure s is the shorter side: band width is relative to the shorter
    val (x, y) = if (s.length <= t.length) (s, t) else (t, s)
    val n = x.length
    val m = y.length
    if (m - n > k) return k + 1 // length gap alone exceeds the threshold
    if (n == 0) return math.min(m, k + 1)

    val inf = k + 1
    // prev(j) = distance for (i-1, j); band over j ∈ [i-k, i+k]
    val prev = new Array[Int](m + 1)
    val curr = new Array[Int](m + 1)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      // left edge: column 0 is the all-deletions prefix d(i,0)=i, still in
      // band while i <= k; otherwise the cell left of the band is inf
      curr(lo - 1) = if (lo == 1) math.min(i, inf) else inf
      var rowMin = curr(lo - 1)
      j = lo
      while (j <= hi) {
        val subst = (if (x(i - 1) == y(j - 1)) 0 else 1) +
          (if (j - 1 >= i - k - 1) prev(j - 1) else inf)
        val del = (if (j <= i - 1 + k) prev(j) else inf) + 1
        val ins = curr(j - 1) + 1
        val v = math.min(inf, math.min(subst, math.min(del, ins)))
        curr(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return inf // the whole band passed k: early exit
      System.arraycopy(curr, lo - 1, prev, lo - 1, hi - lo + 2)
      i += 1
    }
    math.min(prev(m), inf)
  }
}
