package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.EmFunctions._
import graft.operators.{ConfigOps, IntervalJoin}

/** Relational operator inventory (SURVEY §2.2–§2.7) as oracle-checked
  * queries over the driver testdata. Numeric determinism rules (so Spark
  * and DuckDB hash-match bit-for-bit regardless of row order):
  *   - double aggregates go through fixed-scale DECIMAL sums (`dsum`)
  *   - averages = exact decimal sum cast to double / count (`davg`)
  *   - year()/row_number() etc. are cast to identical widths on both sides
  *   - raw ns-precision timestamps are never projected (Spark truncates to
  *     micros; day/hour truncations are projected instead)
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ---- P: projections / filters -------------------------------------
    "p1_standardize_project" -> ((s, d) => {
      Tables(s, d).customer.select(
        col("c_custkey").as("cust_key"),
        upper(trim(col("c_name"))).as("cust_name"),
        lower(col("c_mktsegment")).as("segment"),
        col("c_acctbal").as("acctbal")
      )
    }),
    "p2_required_nonnull" -> ((s, d) => {
      Tables(s, d).lineitem
        .filter(col("l_orderkey").isNotNull && col("l_quantity").isNotNull && col("l_returnflag").isNotNull)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("row_cnt"))
    }),
    "p3_range_validate" -> ((s, d) => {
      Tables(s, d).lineitem.select(
        col("l_orderkey"),
        col("l_linenumber"),
        when(col("l_quantity").between(1.0, 45.0), col("l_quantity")).as("qty_valid"),
        when(col("l_discount").between(0.0, 0.08), col("l_discount")).as("disc_valid")
      )
    }),
    "p4_time_window_prune" -> ((s, d) => {
      Tables(s, d).lineitem
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).cast("double").as("sum_price"))
    }),
    "p5_categorical_filter" -> ((s, d) => {
      Tables(s, d).orders
        .filter(col("o_orderpriority").isInCollection(Seq("1-URGENT", "2-HIGH")))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).cast("double").as("total"))
    }),
    "p6_config_filter" -> ((s, d) => {
      val pred = ConfigOps.predicate(Map(
        "event_type" -> ConfigOps.InList(Seq("purchase", "click")),
        "value"      -> ConfigOps.NumRange(10.0, 500.0)
      ))
      Tables(s, d).events.filter(pred).select("event_id", "user_id", "event_type", "value")
    }),
    "p7_truncate_mask" -> ((s, d) => {
      Tables(s, d).documents.select(
        col("doc_id"),
        substring(col("text"), 1, 50).as("snippet"),
        maskSensitive(col("source")).as("masked_source"),
        surrogateId(col("doc_id"), col("source")).as("doc_sid")
      )
    }),

    // ---- J: joins ------------------------------------------------------
    "j1_dim_enrich_agg" -> ((s, d) => {
      val t = Tables(s, d)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("cust_cnt"),
          dsum(col("c_acctbal")).cast("double").as("sum_bal"),
          davg(col("c_acctbal")).as("avg_bal")
        )
    }),
    "j2_two_key_left" -> ((s, d) => {
      val t = Tables(s, d)
      val a = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"), year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("order_cnt"), dsum(col("o_totalprice")).cast("double").as("order_total"))
      val b = t.lineitem
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nationkey"), year(col("l_shipdate")).as("yr"))
        .agg(dsum(col("l_quantity")).cast("double").as("supply_qty"))
      a.join(b, Seq("nationkey", "yr"), "left")
    }),
    "j3_interval_join" -> ((s, d) => {
      val t = Tables(s, d)
      val intervals = t.orders
        .filter(col("o_orderkey") % 997 === 0)
        .select(
          col("o_orderkey").as("interval_id"),
          to_date(col("o_orderdate")).as("start_d"),
          date_add(to_date(col("o_orderdate")), 30).as("end_d")
        )
      IntervalJoin
        .byDay(intervals, col("start_d"), col("end_d"), t.lineitem, to_date(col("l_shipdate")))
        .groupBy("interval_id")
        .agg(count(col("l_orderkey")).as("line_cnt"), dsum(col("l_quantity")).cast("double").as("qty"))
    }),
    "j5_anti_join" -> ((s, d) => {
      val t = Tables(s, d)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),
    "j6_semi_join" -> ((s, d) => {
      val t = Tables(s, d)
      t.supplier
        .join(
          t.lineitem.filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")),
          col("s_suppkey") === col("l_suppkey"),
          "left_semi"
        )
        .select("s_suppkey", "s_name")
    }),
    "j7_daily_merge" -> ((s, d) => {
      val t = Tables(s, d)
      val purchases = t.events
        .filter(col("event_type") === "purchase")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("purchase_cnt"), dsum(col("value")).cast("double").as("purchase_val"))
      val errors = t.events
        .filter(col("event_type") === "error")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("error_cnt"))
      purchases.join(errors, Seq("day"), "left")
    }),

    // ---- A: aggregations ----------------------------------------------
    "a1_conditional_agg" -> ((s, d) => {
      Tables(s, d).orders
        .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("cnt"),
          count(when(col("o_totalprice") > 200000.0, 1)).as("big_cnt"),
          dsum(col("o_totalprice")).cast("double").as("total"),
          davg(col("o_totalprice")).as("avg_price")
        )
    }),
    "a2_daily_rollup" -> ((s, d) => {
      Tables(s, d).events
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(
          count(lit(1)).as("n"),
          min(col("value")).as("min_val"),
          max(col("value")).as("max_val"),
          dsum(col("value")).cast("double").as("sum_val"),
          davg(col("value")).as("avg_val"),
          count(when(col("value") > 150.0, 1)).as("high_cnt"),
          min(col("user_id")).as("first_user")
        )
    }),
    "a3_privacy_rollup" -> ((s, d) => {
      val t = Tables(s, d)
      t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"), year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("policy_cnt"), dsum(col("o_totalprice")).cast("double").as("t"))
        .filter(col("policy_cnt") >= 5)
        .select(
          col("nationkey"),
          col("yr"),
          col("policy_cnt"),
          privacyRound(col("t")).cast("long").as("total_banded")
        )
    }),
    "a4_quality_union" -> ((s, d) => {
      val t = Tables(s, d)
      def profile(df: DataFrame, name: String, nullCol: String, keyCol: String): DataFrame =
        df.agg(
          count(lit(1)).as("rows_cnt"),
          sum(col(nullCol).isNull.cast("int")).cast("long").as("null_cnt"),
          countDistinct(col(keyCol)).as("key_cnt")
        ).select(lit(name).as("src"), col("rows_cnt"), col("null_cnt"), col("key_cnt"))
      profile(t.orders, "orders", "o_totalprice", "o_custkey")
        .unionByName(profile(t.lineitem, "lineitem", "l_quantity", "l_orderkey"))
        .unionByName(profile(t.customer, "customer", "c_acctbal", "c_custkey"))
    }),
    "a5_count_distinct" -> ((s, d) => {
      Tables(s, d).lineitem
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("part_cnt"),
          countDistinct(col("l_suppkey")).as("supp_cnt"),
          count(lit(1)).as("row_cnt")
        )
    }),
    "a7_time_floor_agg" -> ((s, d) => {
      Tables(s, d).events
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hr"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).cast("double").as("val_sum"))
    }),
    "a9_profile_stats" -> ((s, d) => {
      Tables(s, d).orders.agg(
        count(lit(1)).as("rows_cnt"),
        sum(col("o_custkey").isNull.cast("int")).cast("long").as("null_custkey"),
        sum(col("o_totalprice").isNull.cast("int")).cast("long").as("null_price"),
        countDistinct(col("o_orderstatus")).as("status_cnt"),
        min(year(col("o_orderdate"))).cast("long").as("min_yr"),
        max(year(col("o_orderdate"))).cast("long").as("max_yr")
      )
    }),
    "a11_zscore_outliers" -> ((s, d) => {
      val li = Tables(s, d).lineitem
      val dec = col("l_extendedprice").cast("decimal(18,2)")
      val stats = li
        .groupBy(col("l_returnflag").as("rf"))
        .agg(count(lit(1)).as("n"), sum(dec).cast("double").as("s1"), sum(dec * dec).cast("double").as("s2"))
        .select(
          col("rf"),
          (col("s1") / col("n")).as("mu"),
          sqrt(greatest(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")), lit(0.0))).as("sigma")
        )
      li.join(broadcast(stats), col("l_returnflag") === col("rf"))
        .groupBy("l_returnflag")
        .agg(
          count(when(abs(col("l_extendedprice") - col("mu")) / col("sigma") > 2.0, 1)).as("outlier_cnt"),
          count(lit(1)).as("total_cnt")
        )
    }),

    // ---- W: window functions ------------------------------------------
    "w1_lag_yoy" -> ((s, d) => {
      val t = Tables(s, d)
      val yearly = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"), year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("nationkey").orderBy("yr")
      yearly
        .withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
        .withColumn("yoy_pct", (col("cnt") - col("prev_cnt")).cast("double") / col("prev_cnt") * 100.0)
        .withColumn(
          "trend",
          when(col("yoy_pct") > 10.0, "INCREASING")
            .when(col("yoy_pct") < -10.0, "DECREASING")
            .when(col("yoy_pct").isNull, "NEW")
            .otherwise("STABLE")
        )
    }),
    "w2_row_number" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, d).orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    }),
    "w3_range_frame_30d" -> ((s, d) => {
      val w = Window
        .partitionBy("user_id")
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-2592000L, -1L)
      Tables(s, d).events
        .select(col("event_id"), col("user_id"), count(lit(1)).over(w).as("cnt_30d"))
    }),
    "w4_rows_frame_trailing" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("event_id")
      val frame = w.rowsBetween(-5, -1)
      Tables(s, d).events.select(
        col("event_id"),
        col("event_type"),
        sum(col("value").cast("decimal(18,2)")).over(frame).cast("double").as("trail_sum"),
        count(lit(1)).over(frame).as("trail_cnt"),
        (sum(col("value").cast("decimal(18,2)")).over(frame).cast("double") /
          when(count(lit(1)).over(frame) > 0, count(lit(1)).over(frame))).as("trail_avg")
      )
    }),
    "w5_lead_next" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables(s, d).events.select(
        col("event_id"),
        col("user_id"),
        lead(col("event_id"), 1).over(w).as("next_event_id"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        (lead(unix_timestamp(col("ts")), 1).over(w) - unix_timestamp(col("ts"))).as("gap_s")
      )
    }),

    "w8_gapfill_ffill" -> ((s, d) => {
      // calendar resample + forward fill — the feature-store / sensor
      // shape: per-user daily last observation (argmax by event_id, so
      // determinism never depends on sub-micro timestamp ties), missing
      // days materialized over each user's own [first,last] span via
      // sequence+explode (the day universe is GENERATED per key — no
      // global calendar broadcast, no cross join), value carried forward
      // with last(ignoreNulls) over the key-partitioned day window.
      // Every exchange keys on user_id[, day]; output is |users|×span
      // rows, which is the operator's contract, not a blowup.
      val daily = Tables(s, d).events
        .select(col("user_id"), to_date(col("ts")).as("day"),
          struct(col("event_id"), col("value")).as("obs"))
        .groupBy("user_id", "day")
        .agg(max(col("obs")).getField("value").as("v_day"))
      val days = daily.groupBy("user_id")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day").cast("string").as("day"),
          last(col("v_day"), ignoreNulls = true).over(w).as("v_ff"),
          col("v_day").isNotNull.cast("int").as("observed"))
    }),

    // ---- O: sort / top-k ----------------------------------------------
    "o2_custom_sort_topk" -> ((s, d) => {
      val rank = priorityRank(col("o_orderpriority"), Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      Tables(s, d).orders
        .select(col("o_orderkey"), rank.as("sev_rank"), col("o_totalprice"))
        .orderBy(col("sev_rank"), col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // ---- U: set operations ---------------------------------------------
    "u1_union_align" -> ((s, d) => {
      val t = Tables(s, d)
      val a = t.orders.select(
        lit("order").as("src"),
        col("o_orderkey").as("id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("o_orderpriority").as("category"),
        col("o_totalprice").as("value")
      )
      val b = t.events.select(
        lit("event").as("src"),
        col("event_id").as("id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type").as("category"),
        col("value").as("value")
      )
      a.unionByName(b)
    }),
    "u5_upsert_latest" -> ((s, d) => {
      graft.operators.Upsert
        .latestByKey(Tables(s, d).events, Seq("user_id", "event_type"), "event_id", "event_id")
        .select("user_id", "event_type", "event_id", "value")
    }),
    "u11_incremental_rollup" -> ((s, d) => {
      // REFRESH ASYNC materialized-view semantics (the reference's
      // create_starrocks_materialized_view macro) as explicit state
      // maintenance: the pre-cutoff history is a STORED partial
      // aggregate, the post-cutoff days arrive as a new partition whose
      // partial folds in via IncrementalRollup.merge — and the merged
      // state is byte-identical to the full recompute the oracle runs
      // (exact decimal sums make partial+merge order-independent).
      // Steady-state refresh cost = one delta scan + a |groups|-row
      // merge, never the accumulated history.
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      val e = Tables(s, d).events
        .select(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
          col("value"), col("ts"))
      val keys = Seq("event_type", "day")
      val specs: graft.operators.IncrementalRollup.Spec =
        Seq(("value", "count"), ("value", "sum"), ("value", "min"), ("value", "max"))
      val stored = graft.operators.IncrementalRollup.partial(
        e.filter(col("ts") < cutoff), keys, specs)
      val delta = graft.operators.IncrementalRollup.partial(
        e.filter(col("ts") >= cutoff), keys, specs)
      graft.operators.IncrementalRollup.merge(Seq(stored, delta), keys, specs)
        .select(col("event_type"), col("day"), col("n"),
          col("value_sum").cast("double").as("value_sum"),
          col("value_min"), col("value_max"))
    }),
    "u10_snapshot_diff" -> ((s, d) => {
      // snapshot diff: the event log's first and second halves (split at
      // the median event_id) materialized as two keep-latest-per-user
      // snapshots, then diffed into the added/removed/changed/unchanged
      // audit report a versioned table layer publishes per run. ONE
      // full-outer join; the median split rides an O(1) broadcast row.
      val ev = Tables(s, d).events.select("user_id", "event_id", "value")
      val mx = ev.agg(max("event_id").as("mx"))
      val tagged = ev.crossJoin(broadcast(mx))
      val v1 = graft.operators.Upsert.latestByKey(
        tagged.filter(col("event_id") <= col("mx") / 2), Seq("user_id"), "event_id", "event_id")
      val v2 = graft.operators.Upsert.latestByKey(
        tagged.filter(col("event_id") > col("mx") / 2), Seq("user_id"), "event_id", "event_id")
      graft.operators.Upsert.snapshotDiff(v1, v2, "user_id", Seq("value"), Seq("event_id"))
    }),
    "u12_scd2_checkcols" -> ((s, d) => {
      // dbt 'check' snapshot strategy with a FULL oracle (the timestamp
      // strategy's board twin is u8/em_snapshots): the event log's
      // first-half keep-latest table is snapshotted at run 1, then the
      // SECOND-half keep-latest table is merged at run 2 with change
      // detection by null-safe (event_type, value) column diff — no
      // source timestamp involved, the check strategy's reason to exist.
      // All four merge paths fire: unchanged users stay open from run 1,
      // changed users close at run 2 and reopen with the new values,
      // first-half-only users hard-delete at run 2, second-half-only
      // users open new. Median split rides u10's O(1) broadcast row; one
      // full-outer join on user_id.
      val runTs1 = new java.sql.Timestamp(19990L * 86400000L + 12L * 3600000L)
      val runTs2 = new java.sql.Timestamp(19991L * 86400000L + 12L * 3600000L)
      val ev = Tables(s, d).events.select("user_id", "event_id", "event_type", "value")
      val mx = ev.agg(max("event_id").as("mx"))
      val tagged = ev.crossJoin(broadcast(mx))
      def latest(df: DataFrame) = graft.operators.Upsert
        .latestByKey(df, Seq("user_id"), "event_id", "event_id")
        .select("user_id", "event_type", "value")
      val v1 = latest(tagged.filter(col("event_id") <= col("mx") / 2))
      val v2 = latest(tagged.filter(col("event_id") > col("mx") / 2))
      graft.operators.Scd2
        .mergeCheckCols(graft.operators.Scd2.initAt(v1, runTs1), v2,
          Seq("user_id"), Seq("event_type", "value"), runTs2,
          invalidateHardDeletes = true)
        .select(col("user_id"), col("event_type"), col("value"),
          unix_timestamp(col("valid_from")).as("valid_from_s"),
          unix_timestamp(col("valid_to")).as("valid_to_s"),
          col("is_current"))
    }),
    "u9_cdc_apply" -> ((s, d) => {
      // CDC changelog apply: events as a change feed keyed by user —
      // newest change wins, and a key whose newest change is a tombstone
      // (event_type 'error' stands in for the delete op) leaves the
      // materialized table. ONE window + filter; streaming twin st16
      // converges to this same table.
      graft.operators.Upsert
        .cdcApply(Tables(s, d).events, Seq("user_id"), "event_id", "event_id",
          isDelete = col("event_type") === "error")
        .select("user_id", "event_id", "event_type", "value")
    }),
    "u8_scd2_history" -> ((s, d) => {
      // history-preserving variant of u5's keep-latest: the event stream
      // as an SCD2 dimension — one validity interval per run of equal
      // event_type per user, versioned, deterministic via event_id ties.
      // One exchange on user_id; both window passes share the sort.
      graft.operators.Scd
        .history(Tables(s, d).events, "user_id", "ts", "event_type", "event_id")
        .select(
          col("user_id"), col("event_type"),
          unix_timestamp(col("valid_from")).as("valid_from_s"),
          unix_timestamp(col("valid_to")).as("valid_to_s"),
          col("version"), col("is_current"))
    }),

    // ---- EM expression library -----------------------------------------
    "em_fiscal_calendar" -> ((s, d) => {
      Tables(s, d).orders
        .groupBy(
          federalFiscalYear(col("o_orderdate")).as("fiscal_yr"),
          season(col("o_orderdate")).as("season")
        )
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).cast("double").as("total"))
    }),
    "em_surrogate_ids" -> ((s, d) => {
      Tables(s, d).nation.select(
        col("n_nationkey"),
        surrogateId(col("n_nationkey"), col("n_name")).as("nation_sid"),
        maskSensitive(col("n_name")).as("masked_name")
      )
    })
  )

  def oracle: Map[String, String] = Map(
    "p1_standardize_project" ->
      """SELECT c_custkey AS cust_key, upper(trim(c_name)) AS cust_name,
        |lower(c_mktsegment) AS segment, c_acctbal AS acctbal
        |FROM customer""".stripMargin,
    "p2_required_nonnull" ->
      """SELECT l_returnflag, count(*) AS row_cnt FROM lineitem
        |WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "p3_range_validate" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE WHEN l_quantity BETWEEN CAST(1 AS DOUBLE) AND CAST(45 AS DOUBLE) THEN l_quantity END AS qty_valid,
        |CASE WHEN l_discount BETWEEN CAST(0 AS DOUBLE) AND CAST(0.08 AS DOUBLE) THEN l_discount END AS disc_valid
        |FROM lineitem""".stripMargin,
    "p4_time_window_prune" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "p5_categorical_filter" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |GROUP BY 1, 2""".stripMargin,
    "p6_config_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type IN ('purchase','click')
        |AND value >= CAST(10 AS DOUBLE) AND value <= CAST(500 AS DOUBLE)""".stripMargin,
    "p7_truncate_mask" ->
      """SELECT doc_id, substring(text, 1, 50) AS snippet,
        |concat(substring(source, 1, 2), repeat('*', greatest(length(source) - 2, 0))) AS masked_source,
        |md5(concat_ws('|', doc_id, source)) AS doc_sid
        |FROM documents""".stripMargin,
    "j1_dim_enrich_agg" ->
      """SELECT r_name, n_name, count(*) AS cust_cnt,
        |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    "j2_two_key_left" ->
      """WITH a AS (
        |  SELECT c_nationkey AS nationkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         count(*) AS order_cnt, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_total
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |b AS (
        |  SELECT s_nationkey AS nationkey, CAST(year(l_shipdate) AS INTEGER) AS yr,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS supply_qty
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1, 2)
        |SELECT a.nationkey, a.yr, a.order_cnt, a.order_total, b.supply_qty
        |FROM a LEFT JOIN b ON a.nationkey = b.nationkey AND a.yr = b.yr""".stripMargin,
    "j3_interval_join" ->
      """SELECT o.o_orderkey AS interval_id, count(l.l_orderkey) AS line_cnt,
        |CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM orders o LEFT JOIN lineitem l
        |  ON CAST(l.l_shipdate AS DATE) BETWEEN CAST(o.o_orderdate AS DATE)
        |     AND CAST(o.o_orderdate AS DATE) + 30
        |WHERE o.o_orderkey % 997 = 0
        |GROUP BY 1""".stripMargin,
    "j5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "j6_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_suppkey = s.s_suppkey AND l.l_shipdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin,
    "j7_daily_merge" ->
      """WITH p AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS purchase_cnt,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_val
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |e AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS error_cnt
        |  FROM events WHERE event_type = 'error' GROUP BY 1)
        |SELECT p.day, p.purchase_cnt, p.purchase_val, e.error_cnt
        |FROM p LEFT JOIN e ON p.day = e.day""".stripMargin,
    "a1_conditional_agg" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
        |count(*) AS cnt,
        |count(CASE WHEN o_totalprice > CAST(200000 AS DOUBLE) THEN 1 END) AS big_cnt,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_price
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "a2_daily_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |min(value) AS min_val, max(value) AS max_val,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_val,
        |count(CASE WHEN value > CAST(150 AS DOUBLE) THEN 1 END) AS high_cnt,
        |min(user_id) AS first_user
        |FROM events GROUP BY 1, 2""".stripMargin,
    "a3_privacy_rollup" ->
      """WITH g AS (
        |  SELECT c_nationkey AS nationkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         count(*) AS policy_cnt, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT nationkey, yr, policy_cnt,
        |CAST(CASE WHEN abs(t) >= 10000000 THEN round(t, -5)
        |          WHEN abs(t) >= 1000000 THEN round(t, -4)
        |          ELSE round(t, -3) END AS BIGINT) AS total_banded
        |FROM g""".stripMargin,
    "a4_quality_union" ->
      """SELECT 'orders' AS src, count(*) AS rows_cnt,
        |CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
        |CAST(count(DISTINCT o_custkey) AS BIGINT) AS key_cnt FROM orders
        |UNION ALL
        |SELECT 'lineitem', count(*),
        |CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'customer', count(*),
        |CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer""".stripMargin,
    "a5_count_distinct" ->
      """SELECT l_returnflag,
        |CAST(count(DISTINCT l_partkey) AS BIGINT) AS part_cnt,
        |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supp_cnt,
        |count(*) AS row_cnt
        |FROM lineitem GROUP BY 1""".stripMargin,
    "a7_time_floor_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr, event_type,
        |count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "a9_profile_stats" ->
      """SELECT count(*) AS rows_cnt,
        |CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
        |CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_cnt,
        |CAST(min(year(o_orderdate)) AS BIGINT) AS min_yr,
        |CAST(max(year(o_orderdate)) AS BIGINT) AS max_yr
        |FROM orders""".stripMargin,
    "a11_zscore_outliers" ->
      """WITH s AS (
        |  SELECT l_returnflag AS rf, count(*) AS n,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM lineitem GROUP BY 1),
        |m AS (
        |  SELECT rf, s1/n AS mu, sqrt(greatest(s2/n - (s1/n)*(s1/n), CAST(0 AS DOUBLE))) AS sigma FROM s)
        |SELECT l.l_returnflag,
        |count(CASE WHEN abs(l.l_extendedprice - m.mu) / m.sigma > CAST(2 AS DOUBLE) THEN 1 END) AS outlier_cnt,
        |count(*) AS total_cnt
        |FROM lineitem l JOIN m ON l.l_returnflag = m.rf
        |GROUP BY 1""".stripMargin,
    "w1_lag_yoy" ->
      """WITH yearly AS (
        |  SELECT c_nationkey AS nationkey, CAST(year(o_orderdate) AS INTEGER) AS yr, count(*) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |lagged AS (
        |  SELECT nationkey, yr, cnt,
        |         lag(cnt, 1) OVER (PARTITION BY nationkey ORDER BY yr) AS prev_cnt
        |  FROM yearly)
        |SELECT nationkey, yr, cnt, prev_cnt,
        |CAST(cnt - prev_cnt AS DOUBLE) / prev_cnt * CAST(100 AS DOUBLE) AS yoy_pct,
        |CASE WHEN CAST(cnt - prev_cnt AS DOUBLE) / prev_cnt * CAST(100 AS DOUBLE) > CAST(10 AS DOUBLE) THEN 'INCREASING'
        |     WHEN CAST(cnt - prev_cnt AS DOUBLE) / prev_cnt * CAST(100 AS DOUBLE) < CAST(-10 AS DOUBLE) THEN 'DECREASING'
        |     WHEN prev_cnt IS NULL THEN 'NEW'
        |     ELSE 'STABLE' END AS trend
        |FROM lagged""".stripMargin,
    "w2_row_number" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin,
    "w3_range_frame_30d" ->
      """SELECT event_id, user_id,
        |count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |               RANGE BETWEEN 2592000 PRECEDING AND 1 PRECEDING) AS cnt_30d
        |FROM events""".stripMargin,
    "w4_rows_frame_trailing" ->
      """SELECT event_id, event_type,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail_sum,
        |count(*) OVER w AS trail_cnt,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |  / (CASE WHEN count(*) OVER w > 0 THEN count(*) OVER w END) AS trail_avg
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)""".stripMargin,
    "w5_lead_next" ->
      """SELECT event_id, user_id,
        |lead(event_id, 1) OVER w AS next_event_id,
        |lead(event_type, 1) OVER w AS next_type,
        |lead(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w - CAST(floor(epoch(ts)) AS BIGINT) AS gap_s
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin,
    "w8_gapfill_ffill" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY event_id DESC) AS rn
        |  FROM events),
        |daily AS (SELECT user_id, day, value AS v_day FROM e WHERE rn = 1),
        |span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
        |days AS (
        |  SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span),
        |j AS (
        |  SELECT days.user_id, days.day, daily.v_day
        |  FROM days LEFT JOIN daily ON daily.user_id = days.user_id AND daily.day = days.day)
        |SELECT user_id, CAST(day AS VARCHAR) AS day,
        |  last_value(v_day IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff,
        |  CASE WHEN v_day IS NULL THEN 0 ELSE 1 END AS observed
        |FROM j""".stripMargin,
    "o2_custom_sort_topk" ->
      """SELECT o_orderkey,
        |CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
        |     WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
        |     WHEN '5-LOW' THEN 5 ELSE 6 END AS sev_rank,
        |o_totalprice
        |FROM orders
        |ORDER BY sev_rank, o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "u1_union_align" ->
      """SELECT 'order' AS src, o_orderkey AS id, strftime(o_orderdate, '%Y-%m-%d') AS day,
        |o_orderpriority AS category, o_totalprice AS value
        |FROM orders
        |UNION ALL
        |SELECT 'event', event_id, strftime(ts, '%Y-%m-%d'), event_type, value
        |FROM events""".stripMargin,
    "u5_upsert_latest" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY event_id DESC, event_id ASC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "u11_incremental_rollup" ->
      """SELECT event_type,
        |  CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum,
        |  min(value) AS value_min,
        |  max(value) AS value_max
        |FROM events GROUP BY 1, 2""".stripMargin,
    "u10_snapshot_diff" ->
      """WITH mx AS (SELECT max(event_id) AS mx FROM events),
        |t AS (SELECT user_id, event_id, value, event_id <= mx / 2 AS is_v1 FROM events, mx),
        |v1 AS (SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM t WHERE is_v1) WHERE rn = 1),
        |v2 AS (SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM t WHERE NOT is_v1) WHERE rn = 1)
        |SELECT coalesce(v1.user_id, v2.user_id) AS user_id,
        |  CASE WHEN v2.user_id IS NULL THEN 'removed'
        |       WHEN v1.user_id IS NULL THEN 'added'
        |       WHEN v1.value IS DISTINCT FROM v2.value THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  v1.value AS v1_value, v2.value AS v2_value,
        |  v1.event_id AS v1_event_id, v2.event_id AS v2_event_id
        |FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id""".stripMargin,
    "u12_scd2_checkcols" ->
      """WITH mx AS (SELECT max(event_id) AS mx FROM events),
        |t AS (SELECT user_id, event_id, event_type, value, event_id <= mx / 2 AS is_v1 FROM events, mx),
        |v1 AS (SELECT user_id, event_type, value FROM (
        |  SELECT user_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM t WHERE is_v1) WHERE rn = 1),
        |v2 AS (SELECT user_id, event_type, value FROM (
        |  SELECT user_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM t WHERE NOT is_v1) WHERE rn = 1),
        |j AS (
        |  SELECT v1.user_id AS o_key, v1.event_type AS o_et, v1.value AS o_v,
        |         v2.user_id AS n_key, v2.event_type AS n_et, v2.value AS n_v,
        |         (v1.event_type IS DISTINCT FROM v2.event_type)
        |           OR (v1.value IS DISTINCT FROM v2.value) AS differs
        |  FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id),
        |ts AS (SELECT CAST(floor(epoch(TIMESTAMP '2024-09-24 12:00:00')) AS BIGINT) AS t1,
        |              CAST(floor(epoch(TIMESTAMP '2024-09-25 12:00:00')) AS BIGINT) AS t2)
        |SELECT o_key AS user_id, o_et AS event_type, o_v AS value,
        |       t1 AS valid_from_s, CAST(NULL AS BIGINT) AS valid_to_s, TRUE AS is_current
        |FROM j, ts WHERE o_key IS NOT NULL AND n_key IS NOT NULL AND NOT differs
        |UNION ALL
        |SELECT o_key, o_et, o_v, t1, t2, FALSE
        |FROM j, ts WHERE o_key IS NOT NULL AND n_key IS NOT NULL AND differs
        |UNION ALL
        |SELECT o_key, o_et, o_v, t1, t2, FALSE
        |FROM j, ts WHERE o_key IS NOT NULL AND n_key IS NULL
        |UNION ALL
        |SELECT n_key, n_et, n_v, t2, CAST(NULL AS BIGINT), TRUE
        |FROM j, ts WHERE n_key IS NOT NULL AND (o_key IS NULL OR differs)""".stripMargin,
    "u9_cdc_apply" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY event_id DESC, event_id ASC) AS rn
        |  FROM events) t WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "u8_scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_type, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (
        |  SELECT user_id, ts, event_type, event_id FROM o
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
        |  CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) AS valid_to_s,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  (lead(ts) OVER w IS NULL) AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "em_fiscal_calendar" ->
      """SELECT
        |CAST(CASE WHEN month(o_orderdate) >= 10 THEN year(o_orderdate) + 1
        |          ELSE year(o_orderdate) END AS INTEGER) AS fiscal_yr,
        |CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'WINTER'
        |     WHEN month(o_orderdate) IN (3, 4, 5) THEN 'SPRING'
        |     WHEN month(o_orderdate) IN (6, 7, 8) THEN 'SUMMER'
        |     ELSE 'FALL' END AS season,
        |count(*) AS cnt, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "em_surrogate_ids" ->
      """SELECT n_nationkey,
        |md5(concat_ws('|', n_nationkey, n_name)) AS nation_sid,
        |concat(substring(n_name, 1, 2), repeat('*', greatest(length(n_name) - 2, 0))) AS masked_name
        |FROM nation""".stripMargin
  )
}
