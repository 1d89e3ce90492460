package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Scale-posture regression gate over EVERY board query's physical plan.
  *
  * QueriesSmokeSpec proves the queries RUN; the DuckDB oracle proves they
  * are CORRECT; this spec pins the property the other two can't see — that
  * the plan Catalyst actually picks is one that survives a 1000-executor
  * 100 TB run. A future edit that silently turns an equi join into a
  * cartesian product, drops a join condition into a BroadcastNestedLoop,
  * or widens a window to a single unpartitioned task would stay green on
  * correctness and (at test SF) on the smoke test; it fails here.
  *
  * Whitelists are exact and per-query: every entry names the reason the
  * shape is bounded, and an entry that stops firing fails the staleness
  * test — so a NEW query tripping a detector has to argue its case in
  * review, and dead exemptions can't accumulate.
  */
class PlanAuditSpec extends SparkSpecBase {

  // BroadcastNestedLoopJoin is acceptable ONLY when the broadcast side is
  // provably tiny by construction (a 1-row global aggregate, a bounded
  // stats/query frame, a |sources|-grain table) — the standard
  // scalar-subquery / stats-join shape. Cost is |stream| x |bounded|.
  private val bnljBounded: Map[String, String] = Map(
    "a23_funnel" -> "broadcast 1-row first-stage user count (scalar-subquery shape)",
    "d9_semantic_decontamination" -> "broadcast distinct-collapsed bench embedding set",
    "d13_corpus_overlap" -> "source-pair signature matrix, |sources|^2 rows",
    "d13b_corpus_overlap_fast" -> "source-pair signature matrix, |sources|^2 rows",
    "s1_knn_bruteforce" -> "broadcast bounded query set; brute force is |q|x|corpus| by definition",
    "s11_mips_topk" -> "broadcast bounded query set; brute MIPS is |q|x|corpus| by definition",
    "s8_bm25_topk" -> "broadcast 1-row corpus stats frame (N, avgdl)",
    "s9_hybrid_rrf" -> "composes s8 (1-row stats) + s1 (bounded query set)",
    "s4_ann_pq" -> "broadcast bounded query set for ADC scoring",
    "s7_knn_quantized" -> "broadcast bounded query set vs decoded SQ8 corpus",
    "st18_stream_drift_psi" -> "broadcast bounded per-bucket reference histogram",
    "t19_lm_quality_filter" -> "broadcast 1-row corpus perplexity quantile bound",
    "u10_snapshot_diff" -> "broadcast 1-row max(event_id) median-split bound",
    "x6_ann_recall_report" -> "composes s1/s2: bounded query set both sides",
    "x6b_trained_ann_recall" -> "composes s1/s3: bounded query set both sides",
    "x6c_quantized_recall" -> "composes s1/s7: bounded query set both sides",
    "x7_quantile_shards" -> "broadcast |shards| cut-point rows",
    "x7b_quantile_shards_approx" -> "broadcast |shards| cut-point rows"
  )

  // A Window with an empty partitionSpec plans as ONE task holding the
  // whole input — acceptable only when the windowed frame is already a
  // bounded aggregate (histograms, per-source rate tables, shard
  // cut-points), never a raw fact table.
  private val globalWindowBounded: Map[String, String] = Map(
    "x5_mixture_rebalance" -> "normalize over |sources| rows",
    "x5b_temperature_mixture" -> "normalize over |sources| rows",
    "x12_mixture_apply" -> "temperature rates over |sources| rows, broadcast back",
    "x13_token_budget_repeat" -> "uniform budgets over |sources| rows, broadcast back"
  )

  private case class Fired(cartesian: Boolean, bnlj: Boolean, globalWindow: Boolean)

  private def audit(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Fired = {
    val df = fn(spark, Sf0001)
    val physical = df.queryExecution.sparkPlan.toString
    val globalWin = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }.nonEmpty
    Fired(
      cartesian = physical.contains("CartesianProduct"),
      bnlj = physical.contains("BroadcastNestedLoopJoin"),
      globalWindow = globalWin)
  }

  private lazy val fired: Map[String, Either[String, Fired]] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (try Right(audit(fn))
      catch { case e: Throwable => Left(s"${String.valueOf(e.getMessage).take(120)}") })
    }.toMap

  test("no board query plans a cartesian product, unbounded BNLJ, or raw global window") {
    val violations = fired.toSeq.sortBy(_._1).flatMap {
      case (name, Left(err)) => Seq(s"$name: audit failed to plan: $err")
      case (name, Right(f)) =>
        Seq(
          if (f.cartesian) Some(s"$name: CartesianProduct in physical plan") else None,
          if (f.bnlj && !bnljBounded.contains(name)) Some(s"$name: un-whitelisted BroadcastNestedLoopJoin") else None,
          if (f.globalWindow && !globalWindowBounded.contains(name)) Some(s"$name: un-whitelisted global (unpartitioned) Window") else None
        ).flatten
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("whitelists are exact: every exemption names a real query whose plan still fires the detector") {
    val known = SparkEntry.queries.keySet
    val stale = (bnljBounded.keySet ++ globalWindowBounded.keySet) -- known
    assert(stale.isEmpty, s"whitelist entries for unknown queries: $stale")
    val unusedBnlj = bnljBounded.keySet.filter(n => fired.get(n).exists(_.exists(f => !f.bnlj)))
    val unusedWin = globalWindowBounded.keySet.filter(n => fired.get(n).exists(_.exists(f => !f.globalWindow)))
    assert(unusedBnlj.isEmpty && unusedWin.isEmpty,
      s"exemptions whose detector no longer fires (remove them): bnlj=$unusedBnlj window=$unusedWin")
  }
}
