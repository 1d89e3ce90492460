package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.queries.EventGraphQueries

/** Round-15 hardening: the d17b canonical fuzzy-join identity and the
  * weatherImpacts alert tie-break under a non-enum risk level (the
  * round-14 ADVICE item — the alert-side top-1 rewrite's value-identity
  * argument leaned on Staging's closed {CRITICAL,HIGH,MEDIUM,LOW} enum;
  * the struct-min now carries risk_level before alert_id so ties inside
  * the otherwise(4) bucket stay value-deterministic for ANY enum). */
class Wave13Spec extends SparkSpecBase {
  import spark.implicits._

  test("d17b: sum(n_id_pairs) over the canonical form equals d17's id-level row count") {
    // the grouped entry carries the id×id expansion as multiplicities —
    // cross-group rows n_a·n_b, same-group rows n·(n-1)/2 — so the total
    // implicit pair count must equal the id-level join's materialized
    // row count exactly, at any SF
    val idLevel = EventGraphQueries.queries("d17_fuzzy_join")(spark, Sf0001).count()
    val grouped = EventGraphQueries.queries("d17b_fuzzy_join_grouped")(spark, Sf0001)
      .agg(sum("n_id_pairs")).as[Long].head()
    assert(grouped == idLevel, s"canonical pair mass $grouped != id-level rows $idLevel")
  }

  test("d17b: self rows are dist 0 with n·(n-1)/2 pairs; cross rows multiply group sizes") {
    val rows = EventGraphQueries.queries("d17b_fuzzy_join_grouped")(spark, Sf0001)
      .collect()
    val selfRows = rows.filter(r => r.getAs[String]("name_a") == r.getAs[String]("name_b"))
    assert(selfRows.nonEmpty, "sf0.001 should have at least one duplicated (name, p_size) group")
    selfRows.foreach { r =>
      val n = r.getAs[Long]("n_a")
      assert(r.getAs[Long]("dist") == 0L)
      assert(r.getAs[Long]("n_b") == n)
      assert(r.getAs[Long]("n_id_pairs") == n * (n - 1) / 2)
    }
    rows.filterNot(r => r.getAs[String]("name_a") == r.getAs[String]("name_b")).foreach { r =>
      assert(r.getAs[Long]("n_id_pairs") == r.getAs[Long]("n_a") * r.getAs[Long]("n_b"))
      assert(r.getAs[Long]("dist") > 0L && r.getAs[Long]("dist") <= 3L)
    }
  }

  test("neardup cluster memo: memoized board entries equal a fresh un-memoized build") {
    // round 15: d5/d6/d14/x9 read the session-memoized cluster map
    // (DedupQueries.neardupClusters). The memo must be value-invisible:
    // d5 through the memo == the raw builder pipeline, bit for bit.
    val fresh = graft.queries.DedupQueries.buildNeardupClusters(spark, Sf0001)
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
      .collect().map(_.toString).sorted
    val viaMemo = graft.queries.DedupQueries.queries("d5_neardup_clusters")(spark, Sf0001)
      .collect().map(_.toString).sorted
    assert(viaMemo.sameElements(fresh),
      "memoized cluster frame must be bit-identical to the fresh build")
  }

  // --- weatherImpacts alert tie-break under non-enum risk levels ---

  private val asOf = Date.valueOf("2024-09-24")
  private val runTs = Timestamp.valueOf("2024-09-24 12:00:00")
  private val obsDay = Date.valueOf("2024-09-01")

  /** One in-CO-box station-day (the only columns weatherImpacts reads). */
  private def obs = Seq(
    ("S1", obsDay, 20.0, 50.0, 10.0, 0.0, "NORMAL", "Station One", 39.0, -105.0, runTs)
  ).toDF("station_id", "observation_date", "temperature_celsius",
    "relative_humidity_percent", "wind_speed_kmh", "precipitation_mm",
    "agricultural_risk_indicator", "station_name", "latitude", "longitude",
    "processed_at")

  private def alertsDf(rows: (String, String, String)*) = rows.toSeq
    .map { case (id, ev, risk) => (id, ev, risk, obsDay, null.asInstanceOf[Date], "CO") }
    .toDF("alert_id", "weather_event", "risk_level",
      "effective_date", "expires_date", "state_code")

  private def winner(stgNoaa: org.apache.spark.sql.DataFrame): (String, String) = {
    val out = graft.em.Marts.weatherImpacts(obs, stgNoaa, asOf, runTs)
      .select("has_concurrent_alert", "concurrent_alert_type", "concurrent_alert_risk")
      .collect()
    assert(out.length == 1 && out(0).getBoolean(0), s"expected one alerted row, got ${out.toSeq}")
    (out(0).getString(1), out(0).getString(2))
  }

  test("weatherImpacts tie-break: non-enum risk levels order by risk_level before alert_id") {
    // all three land in the otherwise(4) priority bucket with the same
    // event name — the raw risk_level string must decide before alert_id,
    // so 'AARDVARK' beats 'EXTREME' even though its alert_id sorts last
    val (event, risk) = winner(alertsDf(
      ("A1", "STORM", "EXTREME"), ("A2", "STORM", "EXTREME"), ("A9", "STORM", "AARDVARK")))
    assert(event == "STORM")
    assert(risk == "AARDVARK", s"risk_level must rank before alert_id in the tie-break, got $risk")
  }

  test("weatherImpacts tie-break: full (priority, event, risk) ties fall to min alert_id") {
    val (_, risk) = winner(alertsDf(("A2", "STORM", "EXTREME"), ("A1", "STORM", "EXTREME")))
    assert(risk == "EXTREME")
    // and the enum path is unaffected: HIGH (p=2) still beats any
    // otherwise(4) value regardless of string order
    val (event2, risk2) = winner(alertsDf(
      ("A1", "STORM", "AARDVARK"), ("A2", "BLIZZARD", "HIGH")))
    assert(event2 == "BLIZZARD" && risk2 == "HIGH")
  }
}
