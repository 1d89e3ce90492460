package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/agg keys (SURVEY §7.4.6: CA/TX dominate
  * the state key at national scale). AQE skew-join handles most cases at
  * runtime; explicit salting remains the tool when one side must
  * pre-aggregate or AQE can't split (e.g. aggregation skew).
  */
object Skew {

  /** Salted two-phase aggregation: groupBy(keys + salt) partial, then
    * final groupBy(keys). Use when a single group dwarfs the others and
    * map-side combine alone can't absorb it. `aggs` must be decomposable
    * (sum/count/min/max). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__cnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"${valueCol}_sum"), sum(col("__cnt")).as("row_cnt"))

  /** Salted broadcast-side replication for a skewed equi join: the big
    * (skewed) side gets a random salt in [0, n); the small side is
    * replicated n times with every salt value. Join on (key, salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Hot-key report: keys holding more than `threshold` fraction of rows —
    * the observability half of skew handling (feeds the salting decision). */
  def hotKeys(df: DataFrame, key: String, threshold: Double): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .withColumn("fraction", col("cnt") / total)
      .filter(col("fraction") > threshold)
      .orderBy(col("cnt").desc)
  }
}
