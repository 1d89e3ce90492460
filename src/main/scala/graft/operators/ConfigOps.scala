package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven filtering and aggregation (SURVEY §2.2 P6, §2.4 A7) —
  * the reference builds pandas masks / agg dicts from YAML config
  * (ops/data_processing_ops.py:69-82, 221-283). Here the config compiles to
  * `Column` predicates / typed agg expressions, so Catalyst still sees a
  * fully declarative plan (pushdown + codegen intact).
  */
object ConfigOps {

  sealed trait FieldFilter
  final case class InList(values: Seq[String]) extends FieldFilter
  final case class NumRange(lo: Double, hi: Double) extends FieldFilter
  final case class Exact(value: String) extends FieldFilter

  /** AND-combine per-field filters into one pushdown-friendly predicate. */
  def predicate(filters: Map[String, FieldFilter]): Column =
    filters.foldLeft(lit(true)) {
      case (acc, (field, InList(vs)))      => acc && col(field).isInCollection(vs)
      case (acc, (field, NumRange(lo, hi))) => acc && col(field) >= lo && col(field) <= hi
      case (acc, (field, Exact(v)))        => acc && col(field) === v
    }

  /** Grouped aggregation from a {column -> function} map with an optional
    * time-floor bucket (df[ts].dt.floor(window) in the reference). Doubles
    * are summed as fixed-scale decimals so results are order-independent. */
  def aggregate(
      df: DataFrame,
      groupCols: Seq[String],
      aggMap: Seq[(String, String)],
      timeFloor: Option[(String, String)] = None
  ): DataFrame = {
    val aggs = aggMap.map {
      case (c, "sum")   => sum(col(c).cast("decimal(18,2)")).as(s"${c}_sum")
      case (c, "mean")  => (sum(col(c).cast("decimal(18,2)")).cast("double") / count(col(c))).as(s"${c}_mean")
      case (c, "min")   => min(col(c)).as(s"${c}_min")
      case (c, "max")   => max(col(c)).as(s"${c}_max")
      case (c, "count") => count(col(c)).as(s"${c}_count")
      case (c, f)       => expr(s"$f($c)").as(s"${c}_$f")
    }
    val keys = groupCols.map(col) ++ timeFloor.map { case (ts, unit) =>
      date_trunc(unit, col(ts)).as(s"${ts}_$unit")
    }
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }
}
