package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact interpolated percentiles at 100 TB scale.
  *
  * Spark's builtin `percentile` (and the (value, freq) pre-aggregated form)
  * buffers every value of a group into that group's single final-merge
  * task: 3 groups → 3 tasks no matter how large the cluster, with per-group
  * state proportional to the group's DISTINCT values. For a near-unique
  * measure (prices, latencies) that is O(group rows) memory in one task —
  * the classic scale-killer the reference's percentile rollups hit on wide
  * groups.
  *
  * This operator is the distributed-selection re-expression, fully
  * declarative (no typed row round-trips, every stage codegen'd):
  *
  *   1. compact to (group, value) → freq            [one shuffle, partial agg]
  *   2. ~equi-depth value buckets from approximate-quantile boundaries over
  *      the compacted frame, computed in the SAME driver job as the
  *      maxGroups guard (bucket id = #boundaries ≤ v, an O(log P) codegen
  *      binary search per row [[graft.plans.BoundsRank]] — no
  *      RangePartitioner sampling job, no separate guard-count job)
  *   3. (bucket, group) → count, collected          [B × G scalars — bounded
  *      by buckets × groups, NOT by data]; driver prefix-sums them into the
  *      absolute rank offset of every bucket slice
  *   4. running rank inside each (bucket, group) window slice — parallelism
  *      B × G, per-task state one bucket slice (≈ distinct-values / B),
  *      sort-based and spill-safe; a broadcast join against the ≤ 2·|ps|·G
  *      target ranks keeps only the straddling values
  *   5. tiny conditional agg interpolates            [G rows]
  *
  * Nothing anywhere is proportional to a whole group. The driver-side step
  * is B × G counters, config-bounded like the engine's other allowed
  * collects (vocab/dimension/config), which is why this operator targets
  * LOW-cardinality group columns over HUGE groups; for high-cardinality
  * grouping the builtin is already well-distributed (groups spread across
  * final-merge tasks) and should be used instead.
  *
  * Interpolation matches Spark's `percentile` and DuckDB's `quantile_cont`:
  * pos = p·(n−1) (0-based), result = v_lo·(⌈pos⌉−pos) + v_hi·(pos−⌊pos⌋)
  * (v_lo alone when pos is integral).
  */
object Percentiles {

  /** @param ps (outputColumnName, percentile) pairs, each p in [0, 1].
    * @return one row per group: (groupCol, ps₁, ps₂, …) with double values
    *         and the group column cast back to its input type; null VALUES
    *         are filtered like the builtin, null GROUPS are kept, NaN sorts
    *         greatest (builtin order). A group whose values are ALL null
    *         still emits a row with null quantiles, exactly like the
    *         builtin. The result is a small local frame (G rows — the
    *         operator contract is low-cardinality groups), so no lingering
    *         cache/lineage is left on the session.
    *
    * Group-key contract: groups are keyed by `CAST(groupCol AS STRING)`
    * internally (the driver-side offset/target maps need one hashable key
    * type) and cast back at the end. Distinct native values that share a
    * string rendering would merge, and a type whose string round-trip is
    * lossy would corrupt the key — string/int/date/decimal keys (the
    * intended call sites, and everything on the board) round-trip exactly;
    * do NOT group by binary, struct, map, or non-canonical float keys.
    *
    * @param maxGroups hard cardinality bound on distinct groups (the
    *         HeavyHitters `require` pattern): the driver holds B×G
    *         counters and the G-row result, so an unbounded-G caller
    *         must fail LOUDLY before the collect, not OOM the driver
    *         after it. 65536 groups × 32 buckets ≈ 2M counters — well
    *         inside any driver; raise it only with the driver heap to
    *         match. High-cardinality grouping belongs on the builtin
    *         `percentile` (see object doc). Note: since the round-15
    *         fused stats job, an OVERSIZED input pays one full
    *         compaction+aggregate pass before the guard fires — the
    *         trade for fusing the guard with the boundary sketch; the
    *         failure is still loud and still precedes the B×G collect
    *         (ADVICE r15). */
  def exactByRange(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      ps: Seq[(String, Double)],
      maxGroups: Int = 1 << 16
  ): DataFrame = {
    val spark = df.sparkSession
    val groupType = df.schema(groupCol).dataType

    // ONE scan of the input: compact to (group, value) → freq WITHOUT a
    // value-null pre-filter, so the output spine (every distinct group,
    // including all-null-valued ones) and the guard cardinality both
    // derive from this persisted frame instead of paying a second full
    // input scan plus its own driver job (the pre-round-15 shape: a
    // separate distinct+count over the raw input). Null-value cells carry
    // no rank weight — they exist only so the spine sees their groups.
    // Persisted: boundary/guard estimation, the count pass, the rank pass
    // and the spine re-attach all read this frame.
    val cells = df
      .select(col(groupCol).cast("string").as("g"), col(valCol).cast("double").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val freq = cells.filter(col("v").isNotNull)
      val numBuckets = spark.sessionState.conf.numShufflePartitions
      // ONE driver job computes the maxGroups guard AND the ~equi-depth
      // bucket boundaries (materializing the persist as its side effect):
      //  - ng: EXACT distinct-group count over the UNfiltered cells frame.
      //    A guard on the value-filtered freq would wave through a df with
      //    millions of all-null groups and still OOM the final collect;
      //    countDistinct skips a null group key, so null-group presence is
      //    re-added explicitly (the builtin keeps null groups).
      //  - bounds: percentile_approx over the compacted values — the same
      //    QuantileSummaries machinery as Dataset.stat.approxQuantile at
      //    relativeError ≈ 1/accuracy, fused into the guard job instead of
      //    running as its own. Boundaries only steer balance, never
      //    correctness. NaN values are legal input (pinned to the top
      //    bucket below) but make useless boundaries — masked to null so
      //    the sketch skips them, exactly like approxQuantile did.
      val probs = (1 until numBuckets).map(_.toDouble / numBuckets)
      val boundsAgg =
        if (probs.isEmpty) max(lit(null).cast("array<double>"))
        else percentile_approx(
          when(isnan(col("v")), lit(null)).otherwise(col("v")),
          lit(probs.toArray), lit(100))
      val statsRow = cells.agg(
        (countDistinct(col("g")) +
          coalesce(max(when(col("g").isNull, lit(1L)).otherwise(lit(0L))), lit(0L))).as("ng"),
        boundsAgg.as("bounds")).collect().head
      val nGroups = statsRow.getLong(0)
      require(nGroups <= maxGroups,
        s"exactByRange: more than maxGroups=$maxGroups distinct groups (including " +
          "all-null-valued ones) — this operator holds B×G counters and a G-row " +
          "result on the driver; use the builtin percentile for high-cardinality " +
          "grouping, or raise maxGroups with the driver heap")
      val bounds: Array[Double] =
        Option(statsRow.getSeq[Double](1)).map(_.toArray).getOrElse(Array.empty[Double])
          .filterNot(_.isNaN).distinct.sorted
      // NaN sorts greatest in Spark (and in the builtin percentile's
      // sort), so NaN must pin to the top bucket. bounds_rank's
      // binarySearch total order already sends NaN there; the explicit
      // isnan branch stays as belt-and-suspenders documentation of the
      // contract. bounds_rank is an O(log B) codegen binary search over
      // ONE broadcast boundary array, not an O(B) literal-array filter
      // (B tracks the shuffle-partition count).
      val bucketOf =
        if (bounds.isEmpty) lit(0)
        else when(isnan(col("v")), lit(bounds.length))
          .otherwise(graft.plans.BoundsRank.bounds_rank(col("v"), bounds))
      val freqB = freq.withColumn("bucket", bucketOf)

      // B × G counters -> absolute rank offset of every (bucket, group)
      // slice and per-group totals. Counted over ALL cells (null-value
      // cells ride bucket −1, zero rank weight) so this ONE collect also
      // hands the driver the complete group set — the output spine that
      // used to cost a separate distinct + null-safe left join in the
      // final pass (round 16: the spine is re-attached on the driver
      // below instead). Row count stays ≤ B×G + G, driver-bounded by the
      // guard above.
      val countsAll: Array[(Int, String, Long)] = freqB
        .unionByName(cells.filter(col("v").isNull).select(
          col("g"), col("v"), col("c"), lit(-1).as("bucket")))
        .groupBy("bucket", "g").agg(sum("c").as("n"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      val allGroups: Array[String] = countsAll.map(_._2).distinct
      val counts: Array[(Int, String, Long)] = countsAll.filter(_._1 >= 0)
      val totals: Map[String, Long] =
        counts.groupBy(_._2).map { case (g, a) => g -> a.map(_._3).sum }
      val offsetRows: Seq[(Int, String, Long)] = counts
        .groupBy(_._2).toSeq
        .flatMap { case (g, a) =>
          val byBucket = a.sortBy(_._1)
          byBucket.map(_._1).zip(byBucket.scanLeft(0L)(_ + _._3))
            .map { case (b, off) => (b, g, off) }.toSeq
        }

      // 1-based target ranks per group and percentile: lo = ⌊pos⌋+1,
      // hi = ⌈pos⌉+1 (equal when pos is integral — emitted once, as lo)
      val targetRows: Seq[(String, String, Long, Boolean, Double)] = for {
        (g, n) <- totals.toSeq
        (name, p) <- ps
        pos = p * (n - 1).toDouble
        (rank, isHi) <- Seq((math.floor(pos).toLong + 1, false)) ++
          (if (math.ceil(pos) != math.floor(pos)) Seq((math.ceil(pos).toLong + 1, true)) else Nil)
      } yield (g, name, rank, isHi, pos)

      import spark.implicits._
      val offsets = offsetRows.toDF("obucket", "og", "off")
      val targets = targetRows.toDF("tg", "pname", "rank", "is_hi", "pos")

      // running rank inside each (bucket, group) slice; each row covers
      // ranks [cum_lo, cum_hi] and keeps any target rank it straddles.
      // Both small-side joins are NULL-SAFE on the group key — a using-join
      // would silently drop a null group the builtin keeps.
      val w = Window.partitionBy("bucket", "g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val picked = freqB
        .join(broadcast(offsets),
          col("bucket") === col("obucket") && col("g") <=> col("og"))
        .withColumn("cum_hi", col("off") + sum("c").over(w))
        .withColumn("cum_lo", col("cum_hi") - col("c") + 1)
        .join(broadcast(targets),
          col("g") <=> col("tg") &&
            col("rank") >= col("cum_lo") && col("rank") <= col("cum_hi"))
        .select(col("g"), col("pname"), col("is_hi"), col("pos"), col("v"))

      val outCols = ps.map { case (name, _) =>
        val loV = max(when(col("pname") === name && !col("is_hi"), col("v")))
        val hiV = max(when(col("pname") === name && col("is_hi"), col("v")))
        val pos = max(when(col("pname") === name, col("pos")))
        when(ceil(pos) === floor(pos), loV)
          .otherwise(loV * (ceil(pos) - pos) + hiV * (pos - floor(pos)))
          .as(name)
      }
      val agged = picked
        .groupBy(col("g"))
        .agg(outCols.head, outCols.tail: _*)
      // Materialize the G-row result on the driver and return it as a
      // local frame: the input persist can be dropped eagerly, and no
      // cache entry outlives the call (a session-cached result would also
      // let a later identical invocation silently skip the rank pass).
      // Groups the isNotNull filter removed entirely (all-null-valued —
      // the builtin keeps them with null percentile values) are
      // re-attached HERE from the group set the counts collect already
      // carried: the distributed spine distinct + null-safe left join
      // this replaced cost two extra stages per invocation (round 16).
      // The group key is cast back to its input type through a local
      // Spark projection, never on the driver, so cast semantics stay
      // exactly Spark's.
      val aggedRows = agged.collect()
      val seen = aggedRows.map(_.get(0)).toSet
      val missing = allGroups.filterNot(seen.contains)
      val rows = aggedRows ++ missing.map(g =>
        org.apache.spark.sql.Row.fromSeq(g +: Seq.fill(ps.size)(null)))
      val local = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), agged.schema)
      local.select(col("g").cast(groupType).as(groupCol) +: ps.map(p => col(p._1)): _*)
    } finally {
      cells.unpersist(): Unit
    }
  }
}
