package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout via Z-order (Morton) curves — the
  * technique behind Delta Lake's `OPTIMIZE ZORDER BY` and ClickHouse's
  * space-filling-curve indexes. A table range-partitioned and sorted on
  * ONE column prunes file-level min/max stats only for filters on that
  * column; sorting on the bit-interleaved Z-value of two columns keeps
  * every file's bounding box tight in BOTH dimensions, so point/range
  * filters on either column (or both) skip most files. At 100 TB the
  * parquet row-group stats ARE the index — layout is the only thing that
  * makes them selective.
  *
  * Pipeline: min/max-normalize each dimension to a 16-bit bin (same
  * fixed-association double arithmetic as [[Quantization]], so the curve
  * value replays exactly in SQL), spread the bits, interleave. All pure
  * codegen'd projections; the only shuffle is the range partition on the
  * final write.
  */
object Layout {

  /** Spread the low 16 bits of a non-negative long so bit i lands at bit
    * 2i (the classic mask-shift cascade; constants are the 32-bit Morton
    * masks). */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Interleave two 16-bit bins into a 32-bit Z-value (a gets the even
    * bits, b the odd). */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Min/max-normalize a numeric column into [0, 65535] with the same
    * double association order as `Quantization.encode` (a value at the
    * max lands in the top bin; a constant column bins to 0), so SQL
    * engines replay the bin exactly. */
  def minMaxBin16(c: Column, mn: Double, mx: Double): Column = {
    val raw = floor(((c.cast("double") - lit(mn)) * lit(65536.0)) / (lit(mx) - lit(mn)))
    when(lit(mx) > lit(mn), least(raw, lit(65535.0))).otherwise(lit(0.0)).cast("long")
  }

  /** (min, max) of two columns in one corpus pass (bounded 1-row collect,
    * the same trained-reference shape as `Quantization.dimStats`). */
  def bounds2(df: DataFrame, a: Column, b: Column): (Double, Double, Double, Double) = {
    val r = df.agg(
      min(a.cast("double")), max(a.cast("double")),
      min(b.cast("double")), max(b.cast("double"))).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** Project the Z-value of two numeric dimensions: output keeps the two
    * 16-bit bins (`bin_a`, `bin_b`) plus the interleaved `z`. */
  def zValue(df: DataFrame, a: Column, b: Column): DataFrame = {
    val (amn, amx, bmn, bmx) = bounds2(df, a, b)
    df.withColumn("bin_a", minMaxBin16(a, amn, amx))
      .withColumn("bin_b", minMaxBin16(b, bmn, bmx))
      .withColumn("z", interleave16(col("bin_a"), col("bin_b")))
  }

  /** Write `df` Z-ordered on (a, b): range-partition on the curve value
    * (one shuffle), sort within partitions, drop the helper columns. Each
    * output file then covers a compact curve segment = a tight bounding
    * box in both dimensions. */
  def zorderedParquet(df: DataFrame, path: String, a: Column, b: Column,
      numFiles: Int): Unit = {
    zValue(df, a, b)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("bin_a", "bin_b", "z")
      .write.mode("overwrite").parquet(path)
  }
}
