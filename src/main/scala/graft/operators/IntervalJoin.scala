package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/theta join done scalably (SURVEY §2.3 J3, §7.4 risk 1).
  *
  * The reference joins observations to alert windows with
  * `obs_date BETWEEN a.effective AND a.expires` — a non-equi predicate that
  * Spark can only plan as BroadcastNestedLoopJoin (O(n·m)). Because the
  * reference's intervals are short (alert durations tracked in hours,
  * stg_noaa_weather.sql:54-57), we explode each interval into its covered
  * day keys and equi-join on the day — Catalyst then plans a shuffled hash /
  * sort-merge join that scales to 100 TB fact tables, with the fact-side
  * date filter still pushed to parquet.
  */
object IntervalJoin {

  /** Equi-join `facts` to `intervals` on day granularity.
    *
    * @param intervals  the (small-ish) interval side; exploded ×days
    * @param startDate  DateType column on `intervals` (inclusive)
    * @param endDate    DateType column on `intervals` (inclusive)
    * @param facts      the large fact side
    * @param factDate   DateType column on `facts`
    * @return intervals ⟕ facts matched per covered day; interval rows with
    *         no matching fact keep one row per day with null fact columns,
    *         so aggregate with count(factKey) not count(*).
    */
  def byDay(
      intervals: DataFrame,
      startDate: Column,
      endDate: Column,
      facts: DataFrame,
      factDate: Column
  ): DataFrame = {
    val exploded = intervals.withColumn("__day", explode(sequence(startDate, endDate)))
    exploded.join(facts, factDate === col("__day"), "left")
  }

  /** Interval × interval OVERLAP join (closed intervals: overlap iff
    * lStart <= rEnd AND rStart <= lEnd) — the two-sided generalization of
    * [[byDay]], for session-vs-incident / alert-vs-outage correlation.
    * Same scale device: each side explodes into its covered days, the
    * join is an equi join on the day key (shuffled hash, never a BNLJ),
    * the exact overlap predicate filters post-join, and `distinct()`
    * collapses the double-match of pairs that share several days. Both
    * sides must carry disjoint column names; input rows must be unique
    * (they define pair identity for the distinct).
    *
    * Day buckets are low-cardinality, so every bucket is a bounded
    * mini-cross of that day's rows — the intended shape when intervals
    * are short (sessions, alert windows); for long-lived intervals
    * bucket at a coarser grain first.
    *
    * SCALE CAVEAT: per-bucket pairs grow as the PRODUCT of the two
    * sides, so when both sides scale with the data this is quadratic
    * (measured ×16.9 for ×10 data on the j11 workload). Use it only
    * when the pair LIST itself is the output; for overlap COUNTS use
    * [[RangeRank.overlapCounts]] — O((L+R) log), measured ×1.9 for
    * ×10 data on the same workload.
    *
    * GUARD (default ON, the d1-maxDf spirit): `maxPairsPerBucket` caps
    * the per-day pair product via a day-grain census of both sides (one
    * bounded row per active calendar day, part of the SAME lazy plan —
    * no extra action). By default a bucket over the cap FAILS THE JOB
    * with the offending day and its pair product in the error — a hot
    * day (a global outage, a batch-dated backfill) surfaces loudly
    * instead of re-creating the quadratic shape this operator's own doc
    * warns about. Callers who prefer lossy completion pass
    * `dropOverflowBuckets = true`: the over-cap day is then dropped from
    * the join — pairs whose only shared days are degenerate are lost,
    * exactly like maxDf drops stop-gram postings — an explicit opt-in so
    * nobody gets a silently incomplete pair list. Pass `Long.MaxValue`
    * to accept unbounded per-bucket products on trusted-small inputs.
    */
  def overlapByDay(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      maxPairsPerBucket: Long = 10000000L,
      dropOverflowBuckets: Boolean = false
  ): DataFrame = {
    val l = left.withColumn("__day",
      explode(sequence(to_date(col(lStart)), to_date(col(lEnd)))))
    val r = right.withColumn("__day",
      explode(sequence(to_date(col(rStart)), to_date(col(rEnd)))))
    val (lg, rg) =
      if (maxPairsPerBucket == Long.MaxValue) (l, r)
      else {
        // day-grain census of both sides (bounded: one row per calendar
        // day with activity)
        val lc = l.groupBy("__day").agg(count(lit(1)).as("__ln"))
        val rc = r.groupBy("__day").agg(count(lit(1)).as("__rn"))
        val census = lc.join(rc, Seq("__day"))
          .withColumn("__pairs", col("__ln") * col("__rn"))
        if (dropOverflowBuckets) {
          val allowed = census
            .filter(col("__pairs") <= maxPairsPerBucket)
            .select("__day")
          (l.join(broadcast(allowed), Seq("__day"), "left_semi"),
            r.join(broadcast(allowed), Seq("__day"), "left_semi"))
        } else {
          // fail-loudly path: the (tiny) over-cap day list broadcasts onto
          // the left side; assert_true yields null for every clean row
          // (filter keeps all) and raises with the day + product on the
          // first row of an overflowing bucket — lazy, no extra action
          val over = census
            .filter(col("__pairs") > maxPairsPerBucket)
            .select(col("__day"), col("__pairs"))
          val lChecked = l.join(broadcast(over), Seq("__day"), "left")
            .filter(assert_true(col("__pairs").isNull,
              concat(lit("overlapByDay: day bucket "), col("__day").cast("string"),
                lit(" has |left|x|right| = "), col("__pairs").cast("string"),
                lit(s" candidate pairs > maxPairsPerBucket = $maxPairsPerBucket; "),
                lit("raise the cap, pre-filter the hot day, or opt into lossy "),
                lit("dropOverflowBuckets = true"))).isNull)
            .drop("__pairs")
          (lChecked, r)
        }
      }
    lg.join(rg, Seq("__day"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__day")
      .distinct()
  }

  /** Reference-shaped naive variant (BroadcastNestedLoopJoin) kept for
    * semantic differential tests on small data: byDay must aggregate to the
    * same result. */
  def naive(
      intervals: DataFrame,
      startDate: Column,
      endDate: Column,
      facts: DataFrame,
      factDate: Column
  ): DataFrame =
    intervals.join(facts, factDate.between(startDate, endDate), "left")
}
