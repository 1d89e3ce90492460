package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `dir` (e.g. /root/testdata/sf0.01).
  * Every query entry point receives (SparkSession, sfDir) and goes through
  * here, so scans stay declarative and Catalyst can push filters/prune
  * columns into the parquet reader.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses to read as
    * a timestamp; read it as raw nanos (legacy conf) and truncate to micros
    * with exact integer division (a double division would lose precision at
    * ~1.7e18 ns epochs). Matches DuckDB's ns->us truncation semantics. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Raw events with ts as epoch nanos (LongType) — streaming reads need
    * the on-disk schema. */
  def eventsRawNanos: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events")
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
