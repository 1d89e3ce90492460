package graft.core

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** Explicit pipeline DAG — the dbt `ref()` graph / Dagster asset
  * dependencies (SURVEY §3.2) as a plain topological runner. Each node is
  * a pure function of its dependencies' DataFrames; materialization is a
  * pluggable sink (parquet layer writes in production, identity in tests).
  *
  * Runs single-threaded in dependency order; Spark itself provides all
  * intra-node parallelism, so scheduling model complexity buys nothing —
  * the reference's Dagster value-add (sensors, retries, cadence) is
  * orchestration-level and documented as external concerns.
  */
object Dag {

  final case class Node(
      name: String,
      deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame,
      materialize: Boolean = true
  )

  final case class Result(outputs: Map[String, DataFrame], order: Seq[String])

  /** Topologically sort and build every node. `sink` is invoked for nodes
    * with materialize=true and must return the (possibly re-read) frame —
    * so downstream nodes read the written table, exactly like dbt's
    * table materialization. Cycles and unknown deps fail fast. */
  def run(nodes: Seq[Node], sink: (String, DataFrame) => DataFrame = (_, df) => df): Result = {
    val byName = nodes.map(n => n.name -> n).toMap
    nodes.flatMap(_.deps).foreach { d =>
      require(byName.contains(d), s"unknown dependency: $d")
    }
    val order = mutable.ArrayBuffer.empty[String]
    val state = mutable.Map.empty[String, Int] // 0=unseen 1=visiting 2=done
    def visit(name: String, path: List[String]): Unit = state.getOrElse(name, 0) match {
      case 2 => ()
      case 1 => throw new IllegalArgumentException(
        s"cycle: ${(name :: path.takeWhile(_ != name)).reverse.mkString(" -> ")} -> $name")
      case _ =>
        state(name) = 1
        byName(name).deps.foreach(visit(_, name :: path))
        state(name) = 2
        order += name
    }
    nodes.foreach(n => visit(n.name, Nil))

    val built = mutable.Map.empty[String, DataFrame]
    order.foreach { name =>
      val node = byName(name)
      val df = node.build(node.deps.map(d => d -> built(d)).toMap)
      built(name) = if (node.materialize) sink(name, df) else df
    }
    Result(built.toMap, order.toSeq)
  }
}
