package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.{AdvancedQueries, DedupQueries, EmModelQueries, EventGraphQueries, ExtraQueries, RelationalQueries, RetrievalQueries, StreamingQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2) as named
  * DataFrame-producing entry points over the driver testdata;
  * `oracleSql` holds the DuckDB-equivalent SQL for each (omitted only for
  * sketch-based operators with no 1:1 SQL form — those get rows-only
  * checks and are differentially tested in ScalaTest instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Customer balances enriched through the broadcast dim chain
    * nation→region (SURVEY §2.3 J1). */
  def entry(spark: SparkSession): DataFrame = {
    val t = Tables(spark, "/root/testdata/sf0.001")
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("cust_cnt"),
        sum(col("c_acctbal").cast("decimal(18,2)")).as("sum_bal")
      )
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      StreamingQueries.queries ++ ExtraQueries.queries ++ AdvancedQueries.queries ++
      EmModelQueries.queries ++ RetrievalQueries.queries ++ EventGraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++ DedupQueries.oracle ++
      StreamingQueries.oracle ++ ExtraQueries.oracle ++ AdvancedQueries.oracle ++
      EmModelQueries.oracle ++ RetrievalQueries.oracle ++ EventGraphQueries.oracle
}
