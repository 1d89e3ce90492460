package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.core.Tables

/** Tables.normalizeTs: all three on-disk ts forms → one logical schema.
  * The engine session reads parquet with NTZ inference OFF, but sessions
  * built elsewhere (user code, notebooks) may hand frames over with NTZ
  * columns — the normalizer must cover that path too. */
class TablesSpec extends SparkSpecBase {
  import spark.implicits._

  test("TIMESTAMP_NTZ ts is reinterpreted as the same UTC wall-clock instant") {
    val ntz = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-02 03:04:05' AS ts, 1 AS x")
    val out = Tables.normalizeTs(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as[String].head()
      == "2024-01-02 03:04:05")
  }

  test("epoch-nanos LongType ts truncates to micros; weird column names parse") {
    val nanos = Seq((1704164645123456789L, 1)).toDF("odd ts", "x")
    val out = Tables.normalizeTs(nanos, "odd ts")
    assert(out.schema("odd ts").dataType == TimestampType)
    assert(out.select(col("`odd ts`").cast("long")).as[Long].head() == 1704164645L)
  }

  test("native TimestampType passes through; a missing ts column fails fast") {
    val ts = spark.sql("SELECT TIMESTAMP '2024-01-02 03:04:05' AS ts")
    assert(Tables.normalizeTs(ts).schema("ts").dataType == TimestampType)
    val none = Seq((1, 2)).toDF("a", "b")
    val err = intercept[IllegalArgumentException](Tables.normalizeTs(none))
    assert(err.getMessage.contains("`ts` not found"))
  }
}
