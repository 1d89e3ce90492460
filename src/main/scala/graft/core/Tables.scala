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

  /** events.ts has shipped in two physical forms across driver testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark 4 refuses to read
    * as a timestamp, so it's read as raw nanos under the legacy conf — and
    * plain TIMESTAMP(MICROS), which reads natively. Normalize both to
    * TimestampType here so every query sees one logical schema. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(table("events"))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  import org.apache.spark.sql.functions.{col, expr, from_utc_timestamp, timestamp_micros}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Normalize an events-shaped frame's `ts` to TimestampType regardless of
    * the on-disk representation:
    *   - epoch-nanos LongType (TIMESTAMP(NANOS) testdata read under
    *     `spark.sql.legacy.parquet.nanosAsLong`) is truncated to micros with
    *     exact integer division (a double division would lose precision at
    *     ~1.7e18 ns epochs — matches DuckDB's ns->us truncation);
    *   - TIMESTAMP_NTZ (timestamp[us] written with isAdjustedToUTC=false,
    *     read by a session with NTZ inference on) is reinterpreted as a UTC
    *     instant — same wall-clock micros, watermark-compatible type. The
    *     NTZ→TIMESTAMP cast itself interprets the wall-clock in the SESSION
    *     zone, so for non-UTC sessions (user notebooks — engine sessions
    *     pin UTC) the cast is re-shifted with from_utc_timestamp; the two
    *     cancel to the UTC-instant reading in any zone (up to DST-ambiguous
    *     local times, which a UTC-pinned engine never produces);
    *   - a native TimestampType passes through untouched.
    * A frame WITHOUT the column is a caller bug (an upstream rename or a
    * wrong table) — fail fast rather than silently skipping normalization
    * and letting a LongType ts reach a watermark later. */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema.find(_.name == tsCol) match {
      case None =>
        throw new IllegalArgumentException(
          s"normalizeTs: column `$tsCol` not found in schema " +
            df.schema.fieldNames.mkString("[", ", ", "]"))
      case Some(f) if f.dataType == LongType =>
        // backtick-quoted so non-identifier column names parse correctly
        df.withColumn(tsCol, timestamp_micros(expr(s"`$tsCol` div 1000")))
      case Some(f) if f.dataType == TimestampNTZType =>
        val zone = df.sparkSession.conf.get("spark.sql.session.timeZone")
        df.withColumn(tsCol,
          from_utc_timestamp(col(tsCol).cast(TimestampType), zone))
      case _ => df
    }
}
