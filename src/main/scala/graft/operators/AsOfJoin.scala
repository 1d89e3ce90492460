package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each probe row, attach the payload of the latest build
  * row with `build.time <= probe.time` on the same key (the "most recent
  * prior observation" join used for point-in-time feature lookup in
  * training-data pipelines; the reference has no as-of operator — this is
  * a beyond-reference scale addition, cf. SURVEY.md §7.4/7).
  *
  * Implementation is the scalable union + carry-forward shape, not a range
  * join: both sides are tagged and unioned, then a single
  * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY time, tag)`
  * window carries the newest build payload forward onto each probe row.
  * Cost: ONE shuffle on the key (the window sort), no BroadcastNestedLoop,
  * no per-row range scans — at 100 TB this behaves exactly like a single
  * sort-merge pass and never materializes candidate pairs.
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param probe       left side; all its columns are preserved
    * @param build       right side holding the payload observations
    * @param keyCol      equi-key present on both sides
    * @param timeCol     event-time column present on both sides (inclusive:
    *                    a build row at exactly probe.time matches, like
    *                    DuckDB/pandas `ASOF JOIN ... ON l.t >= r.t`)
    * @param payloadCols build columns to attach
    * @param prefix      prefix for the attached payload columns
    *
    * Build rows are first reduced to one per (key, time) —
    * `max(struct(payload))` — so ties inside the build side resolve
    * deterministically regardless of partitioning.
    */
  def asOfLeft(
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      timeCol: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"
  ): DataFrame = {
    // one build row per (key, time); wrap payload in a struct so a build
    // row whose payload value is genuinely NULL still blocks carry-forward
    // past it (last(ignoreNulls) skips null STRUCTS, not null fields)
    val b1 = build
      .groupBy(col(keyCol), col(timeCol))
      .agg(max(struct(payloadCols.map(col): _*)).as("_asof_payload"))
    val payloadType = b1.schema("_asof_payload").dataType

    val probeCols = probe.columns.toSeq
    val pAligned = probe
      .withColumn("_asof_payload", lit(null).cast(payloadType))
      .withColumn("_tag", lit(1))
    val bAligned = b1.select(
      probeCols.map { c =>
        if (c == keyCol || c == timeCol) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)
      } ++ Seq(col("_asof_payload"), lit(0).as("_tag")): _*
    )

    // tag orders build (0) before probe (1) at equal timestamps => inclusive
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(timeCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    pAligned
      .unionByName(bAligned)
      .withColumn("_ff", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(probeCols.map(col) ++
        payloadCols.map(p => col(s"_ff.$p").as(prefix + p)): _*)
  }
}
