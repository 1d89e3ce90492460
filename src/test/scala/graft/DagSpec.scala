package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Dag
import graft.em.{Fixtures, Marts, PublicLayer, Staging}

/** DAG runner semantics + the EM pipeline expressed as a DAG. */
class DagSpec extends SparkSpecBase {
  import spark.implicits._

  test("topological order, memoization, cycle and unknown-dep detection") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    def leaf(n: String, v: Int) = Dag.Node(n, Nil, _ => { calls += n; Seq(v).toDF("x") })
    val nodes = Seq(
      Dag.Node("c", Seq("a", "b"), deps => { calls += "c"; deps("a").unionAll(deps("b")) }),
      leaf("a", 1),
      leaf("b", 2),
      Dag.Node("d", Seq("c"), deps => { calls += "d"; deps("c") })
    )
    val res = Dag.run(nodes)
    assert(res.order.indexOf("a") < res.order.indexOf("c"))
    assert(res.order.indexOf("b") < res.order.indexOf("c"))
    assert(res.order.indexOf("c") < res.order.indexOf("d"))
    assert(calls.count(_ == "a") == 1) // built once despite two paths
    assert(res.outputs("c").count() == 2)

    intercept[IllegalArgumentException] {
      Dag.run(Seq(Dag.Node("x", Seq("y"), _ => ???), Dag.Node("y", Seq("x"), _ => ???)))
    }
    intercept[IllegalArgumentException] {
      Dag.run(Seq(Dag.Node("x", Seq("ghost"), _ => ???)))
    }
  }

  test("EM pipeline as a DAG materializes through the sink in dbt layer order") {
    val runTs = Timestamp.valueOf("2024-07-01 12:00:00")
    val asOf = Date.valueOf("2024-07-01")
    val dir = java.nio.file.Files.createTempDirectory("dag").toString
    val written = scala.collection.mutable.ArrayBuffer.empty[String]
    def parquetSink(name: String, df: DataFrame): DataFrame = {
      written += name
      df.write.mode("overwrite").parquet(s"$dir/$name")
      spark.read.parquet(s"$dir/$name")
    }
    val nodes = Seq(
      Dag.Node("stg_fema", Nil, _ => Staging.femaDisasters(Fixtures.fema(spark, 200), runTs)),
      Dag.Node("stg_noaa", Nil, _ => Staging.noaaWeather(Fixtures.noaa(spark, 100), runTs)),
      Dag.Node("stg_usda", Nil, _ => Staging.usdaData(Fixtures.usda(spark, 400), runTs)),
      Dag.Node("emergency_events", Seq("stg_fema", "stg_noaa"),
        d => Marts.emergencyEvents(spark, d("stg_fema"), d("stg_noaa"), runTs)),
      Dag.Node("disaster_analytics", Seq("emergency_events", "stg_usda"),
        d => Marts.disasterAnalytics(d("emergency_events"), d("stg_usda"), asOf, runTs)),
      Dag.Node("public_disasters", Seq("emergency_events"),
        d => PublicLayer.publicDisasters(d("emergency_events"), asOf, runTs))
    )
    val res = Dag.run(nodes, parquetSink)
    assert(written.toSet == nodes.map(_.name).toSet)
    assert(res.outputs("public_disasters").count() > 0)
    assert(spark.read.parquet(s"$dir/disaster_analytics").count() ==
      res.outputs("disaster_analytics").count())
  }
}
