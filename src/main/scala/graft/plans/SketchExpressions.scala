package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-probe expressions: fixed-size approximate membership against a
  * pre-built sketch riding along as ONE reference object in the plan
  * (same pattern as the PQ codebook expressions — plan size independent
  * of sketch content).
  */
object SketchExpressions {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toCol, toExpr}

  /** Membership probe against a Spark `BloomFilter`. One-sided error:
    * `false` is certain, `true` may be a false positive at the filter's
    * configured fpp — exactly the contract a contamination SCREEN needs
    * (never miss a leaked span; tolerate a small over-flag rate that a
    * second exact pass can clean up). */
  def might_contain(text: Column, bf: BloomFilter): Column =
    toCol(BloomMightContain(toExpr(text), bf))

  /** Interpreted eval (CodegenFallback): the probe is k hash evaluations
    * over the string bytes — scan-bound, not dispatch-bound. */
  case class BloomMightContain(child: Expression, bf: BloomFilter)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"might_contain expects a string column, got ${child.dataType.catalogString}")
    }

    override def nullSafeEval(v: Any): Any =
      bf.mightContainString(v.asInstanceOf[UTF8String].toString)

    override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  }
}
