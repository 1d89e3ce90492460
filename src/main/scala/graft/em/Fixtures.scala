package graft.em

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic fixture generators honoring FIXTURES.md value domains
  * (fixed seed; clean rows by default, dirt injectable for negative
  * tests). Driver-side generation is fine here: fixtures are small test
  * inputs, not engine data paths.
  */
object Fixtures {

  private val incidentTypes = Seq("Hurricane", "Flood", "Fire", "Tornado", "Severe Storm", "Winter Storm", "Drought", "Earthquake")
  private val states = Seq("CO", "CA", "TX", "FL", "NY", "WA", "KS", "OK")
  private val severities = Seq("Extreme", "Severe", "Moderate", "Minor")
  private val urgencies = Seq("Immediate", "Expected", "Future")
  private val commodities = Seq("CORN", "WHEAT", "SOYBEANS", "COTTON")

  private def ts(epochDay: Long, hour: Int = 0): Timestamp =
    new Timestamp(epochDay * 86400000L + hour * 3600000L)

  def fema(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val declDay = 19700 + rng.nextInt(300) // ~2023-2024
      val begin = declDay - rng.nextInt(10)
      val end = if (rng.nextBoolean()) Some(begin + rng.nextInt(45)) else None
      Row(
        (4000 + i).toString,
        states(rng.nextInt(states.length)),
        Seq("DR", "EM", "FM")(rng.nextInt(3)),
        new Date(declDay * 86400000L),
        incidentTypes(rng.nextInt(incidentTypes.length)),
        s"Event $i declaration",
        new Date(begin * 86400000L),
        end.map(d => new Date(d * 86400000L)).orNull,
        s"County ${i % 30}",
        2024,
        ts(declDay, 6),
        "FEMA_OpenFEMA"
      )
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), EmSchemas.Fema)
  }

  def noaa(spark: SparkSession, n: Int, seed: Long = 43L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val effDay = 19900 + rng.nextInt(90)
      val effHour = rng.nextInt(24)
      val durH = 1 + rng.nextInt(72)
      Row(
        s"NOAA-ALERT-$i",
        Seq("Tornado", "Flood", "Winter Storm", "Severe Storm")(rng.nextInt(4)),
        severities(rng.nextInt(severities.length)),
        urgencies(rng.nextInt(urgencies.length)),
        Seq("Observed", "Likely", "Possible")(rng.nextInt(3)),
        s"Alert $i headline",
        s"Alert $i long description " + ("x" * rng.nextInt(600)),
        s"Take shelter instruction $i " + ("y" * rng.nextInt(400)),
        s"${states(rng.nextInt(states.length))} region, County ${i % 20}",
        ts(effDay, effHour),
        new Timestamp(ts(effDay, effHour).getTime + durH * 3600000L),
        { // closed triangular ring, GeoJSON Polygon nesting (ring list)
          val x = rng.nextInt(100)
          s"""{"type":"Polygon","coordinates":[[[$x.0,0.0],[$x.0,1.0],[${x + 1}.0,1.0],[$x.0,0.0]]]}"""
        },
        ts(effDay, effHour),
        "NOAA_NWS"
      )
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), EmSchemas.Noaa)
  }

  /** NOAA station observations with nested {value, unitCode,
    * qualityControl} measurement structs — mixed units (the API reports
    * degC or degF, m/s or km/h, Pa, by station) and occasional null
    * measurements, matching the feed's real shape. */
  def noaaObservations(spark: SparkSession, stations: Int, hoursBack: Int, seed: Long = 46L): DataFrame = {
    val rng = new scala.util.Random(seed)
    def m(value: Double, unit: String): Row = Row(value, unit, "qc:V")
    val rows = for {
      s <- 0 until stations
      h <- 0 until hoursBack
    } yield {
      val tempC = -10.0 + rng.nextDouble() * 45.0
      val dewC = tempC - rng.nextDouble() * 15.0
      val windMs = rng.nextDouble() * 25.0
      val fahrenheit = rng.nextBoolean() // station-dependent unit choice
      val tUnit = if (fahrenheit) "wmoUnit:degF" else "wmoUnit:degC"
      def temp(c: Double): Row = m(if (fahrenheit) c * 9.0 / 5.0 + 32 else c, tUnit)
      Row(
        f"KSTN$s%03d",
        ts(19950L - h / 24, h % 24),
        temp(tempC),
        temp(dewC),
        m(rng.nextInt(360).toDouble, "wmoUnit:degree_(angle)"),
        m(windMs, "wmoUnit:m_s-1"),
        if (rng.nextInt(3) == 0) m(windMs * 1.8, "wmoUnit:m_s-1") else null,
        m(85000.0 + rng.nextDouble() * 20000.0, "wmoUnit:Pa"),
        m(98000.0 + rng.nextDouble() * 7000.0, "wmoUnit:Pa"),
        m(2000.0 + rng.nextDouble() * 14000.0, "wmoUnit:m"),
        temp(tempC + 3),
        temp(tempC - 8),
        if (rng.nextInt(4) == 0) m(rng.nextDouble() * 20.0, "wmoUnit:mm") else Row(null, "wmoUnit:mm", "qc:Z"),
        null,
        null,
        m(rng.nextDouble() * 100.0, "wmoUnit:percent"),
        if (tempC < 5) temp(tempC - windMs * 0.7) else null,
        if (tempC > 27) temp(tempC + 4) else null,
        ts(19950L, h % 24),
        "NOAA_NWS"
      )
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), EmSchemas.NoaaObservations)
  }

  def coagmet(spark: SparkSession, stations: Int, daysBack: Int, asOfDay: Long, seed: Long = 44L): DataFrame = {
    val rng = new scala.util.Random(seed)
    // Station coordinates are per-STATION constants (stations do not move):
    // exactly-representable quarter/half-degree grid points, CO-ish, with
    // every 5th station placed north of the CO bounding box so downstream
    // geo attribution exercises its UNKNOWN branch.
    def lat(s: Int): Double = 37.5 + 0.25 * (s % 12) + (if (s % 5 == 4) 5.0 else 0.0)
    def lon(s: Int): Double = -108.5 + 0.5 * (s % 12)
    val rows = for {
      s <- 0 until stations
      d <- 0 until daysBack
      h <- Seq(0, 6, 12, 18)
    } yield {
      val day = asOfDay - d
      Row(
        f"COAG$s%03d",
        s"Station $s",
        lat(s),
        lon(s),
        ts(day, h),
        -15.0 + rng.nextDouble() * 60.0,          // occasionally freeze/heat
        rng.nextDouble() * 100.0,
        rng.nextDouble() * 90.0,
        if (rng.nextInt(4) == 0) rng.nextDouble() * 40.0 else 0.0,
        ts(day, h),
        "CoAgMet"
      )
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), EmSchemas.Coagmet)
  }

  def usda(spark: SparkSession, n: Int, seed: Long = 45L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val premium = 1000.0 + rng.nextDouble() * 50000.0
      val liability = premium * (5 + rng.nextInt(10))
      val indemnity = rng.nextDouble() * liability * 0.8
      Row(
        2020 + rng.nextInt(5),
        states(rng.nextInt(3)), // concentrate for privacy-threshold coverage
        (1 + rng.nextInt(8)).toString,
        commodities(rng.nextInt(commodities.length)),
        Seq("IRRIGATED", "NON-IRRIGATED")(rng.nextInt(2)),
        50.0 + rng.nextInt(40),
        premium,
        liability,
        indemnity,
        ts(19950L, 3),
        "USDA_RMA"
      )
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), EmSchemas.Usda)
  }
}
