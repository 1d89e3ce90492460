package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.em.{EmSchemas, Fixtures, Staging}
import graft.operators.Validation

/** FIXTURES.md contract: clean fixtures pass the reference's re-encoded
  * dbt tests (EmPipelineSpec) and injected dirt FAILS them — proving the
  * checks actually detect violations rather than vacuously passing. */
class DirtInjectionSpec extends SparkSpecBase {

  private val runTs = Timestamp.valueOf("2024-07-01 12:00:00")

  private def ts(s: String) = Timestamp.valueOf(s)

  test("staging null-gates drop rows with missing required fields") {
    val dirtyRows = Seq(
      Row(null, "CO", "DR", Date.valueOf("2024-06-01"), "Flood", "t", null, null, "a", 2024, ts("2024-06-01 00:00:00"), "FEMA"),
      Row("4700", null, "DR", Date.valueOf("2024-06-01"), "Flood", "t", null, null, "a", 2024, ts("2024-06-01 00:00:00"), "FEMA"),
      Row("4701", "CO", "DR", null, "Flood", "t", null, null, "a", 2024, ts("2024-06-01 00:00:00"), "FEMA")
    )
    val dirty = spark.createDataFrame(
      spark.sparkContext.parallelize(dirtyRows),
      EmSchemas.Fema.copy(fields = EmSchemas.Fema.fields.map(_.copy(nullable = true))))
    val clean = Fixtures.fema(spark, 50)
    val staged = Staging.femaDisasters(clean.unionByName(dirty), runTs)
    assert(staged.count() == 50) // all three dirty rows gated out
  }

  test("out-of-range measurements become NULL, not dropped rows") {
    val base = Fixtures.coagmet(spark, 2, 2, 19905L)
    val dirty = base.withColumn("temperature",
      when(col("station_id") === "COAG000", lit(999.0)).otherwise(col("temperature")))
    val staged = Staging.coagmetData(dirty, runTs)
    assert(staged.count() == base.count())
    assert(staged.filter(col("station_id") === "COAG000" && col("temperature_celsius").isNotNull).count() == 0)
  }

  test("PII injected into text fields is caught by the scan") {
    val dirty = Fixtures.fema(spark, 20)
      .withColumn("title",
        when(col("disaster_number") === "4005",
          lit("Contact john@example.com or 303-555-1234")).otherwise(col("title")))
    val res = Validation.run(Staging.femaDisasters(dirty, runTs),
      Seq(Validation.piiScan("disaster_title"))).head()
    assert(res.getLong(res.fieldIndex("pii_disaster_title")) == 1)
  }

  test("privacy threshold suppresses small county groups") {
    val usda = Staging.usdaData(Fixtures.usda(spark, 400), runTs)
    // every (state,county,year,commodity) group with < 5 policies is absent
    val pub = graft.em.PublicLayer.publicAgriculturalData(usda, Date.valueOf("2024-07-01"))
    val small = usda.filter(col("program_year") >= 2019)
      .groupBy("state_code", "county_code", "program_year", "commodity_name")
      .count().filter(col("count") < 5)
    val joined = pub.select(col("state_code"), col("county_code"), col("program_year"),
        col("crop_type").as("commodity_name"))
      .join(small, Seq("state_code", "county_code", "program_year", "commodity_name"), "inner")
    assert(joined.count() == 0)
  }

  test("temporal-sanity check flags begin > end") {
    val dirty = Fixtures.fema(spark, 30)
      .withColumn("incident_begin_date", lit(Date.valueOf("2024-06-20")))
      .withColumn("incident_end_date",
        when(col("disaster_number") === "4001", lit(Date.valueOf("2024-06-01")))
          .otherwise(lit(Date.valueOf("2024-06-25"))))
    val res = Validation.run(dirty, Seq(Validation.ordered("incident_begin_date", "incident_end_date"))).head()
    assert(res.getLong(res.fieldIndex("ordered_incident_begin_date_incident_end_date")) == 1)
  }
}
