package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.functions.EmFunctions._
import graft.functions.TextFunctions

/** Property-style tests for the scalar expression library (SURVEY §5:
  * fiscal year, privacy rounding, masking, bounds) — seeded random inputs,
  * invariants asserted over the whole frame in one pass. */
class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("federal fiscal year: Oct-Dec roll into next FY, else calendar year") {
    val rng = new scala.util.Random(7)
    val ds = Seq.fill(300)(new Date(rng.between(0L, 20000L) * 86400000L)).toDF("d")
    val bad = ds
      .select(federalFiscalYear(col("d")).as("fy"), month(col("d")).as("m"), year(col("d")).as("y"))
      .filter(col("fy") =!= when(col("m") >= 10, col("y") + 1).otherwise(col("y")))
      .count()
    assert(bad == 0)
  }

  test("season is total and maps months correctly") {
    val rows = (1 to 12).map(m => Date.valueOf(f"2024-$m%02d-15")).toDF("d")
      .select(month(col("d")), season(col("d"))).collect()
    val expected = Map(12 -> "WINTER", 1 -> "WINTER", 2 -> "WINTER",
      3 -> "SPRING", 4 -> "SPRING", 5 -> "SPRING",
      6 -> "SUMMER", 7 -> "SUMMER", 8 -> "SUMMER",
      9 -> "FALL", 10 -> "FALL", 11 -> "FALL")
    rows.foreach(r => assert(r.getString(1) == expected(r.getInt(0))))
  }

  test("privacy rounding bands by magnitude and is idempotent") {
    val vals = Seq(999.0, 1500.0, 123456.0, 2345678.0, 123456789.0, 0.0)
    val out = vals.toDF("x").select(col("x"), privacyRound(col("x")).as("r")).collect()
    out.foreach { r =>
      val (x, v) = (r.getDouble(0), r.getDouble(1))
      val band = if (math.abs(x) >= 1e7) 1e5 else if (math.abs(x) >= 1e6) 1e4 else 1e3
      assert(v % band == 0.0, s"x=$x v=$v band=$band")
    }
    val twice = vals.toDF("x").select(privacyRound(privacyRound(col("x"))).as("r2")).collect().map(_.getDouble(0))
    assert(twice.toSeq == out.map(_.getDouble(1)).toSeq)
  }

  test("masking keeps 2 chars, preserves length, never throws on short strings") {
    val out = Seq("ABCDEF", "AB", "A", "").toDF("s")
      .select(col("s"), maskSensitive(col("s")).as("m")).collect()
    out.foreach { r =>
      val (s, m) = (r.getString(0), r.getString(1))
      assert(m.length == s.length)
      assert(m.take(2) == s.take(2))
      assert(m.drop(2).forall(_ == '*'))
    }
  }

  test("clip bounds and safeRatio guards zero denominators") {
    val out = Seq((5.0, 0.0), (4.0, 2.0), (-9.0, 3.0)).toDF("a", "b")
      .select(clip(col("a"), -3, 3).as("c"), safeRatio(col("a"), col("b")).as("r")).collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(3.0, 3.0, -3.0))
    assert(out(0).isNullAt(1))
    assert(out(1).getDouble(1) == 2.0)
  }

  test("word shingles: n-grams count and short-doc degenerate case") {
    val out = Seq("a b c d e", "a b").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 3).as("sh")).collect()
    assert(out(0).getSeq[String](0) == Seq("a b c", "b c d", "c d e"))
    assert(out(1).getSeq[String](0) == Seq("a b"))
  }

  test("alertPriority matrix: risk x urgency with population/certainty escalation") {
    val out = Seq(
      ("CRITICAL", "IMMEDIATE", "POSSIBLE", null.asInstanceOf[java.lang.Long]),
      ("HIGH", "EXPECTED", "POSSIBLE", null.asInstanceOf[java.lang.Long]),
      ("LOW", "FUTURE", "POSSIBLE", java.lang.Long.valueOf(600000L)),
      ("LOW", "FUTURE", "OBSERVED", null.asInstanceOf[java.lang.Long]),
      ("LOW", "FUTURE", "POSSIBLE", null.asInstanceOf[java.lang.Long])
    ).toDF("risk", "urgency", "certainty", "pop")
      .select(alertPriority(col("risk"), col("urgency"), col("certainty"), col("pop")).as("p"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 2, 1, 2, 4))
  }

  test("state standardization join accepts codes, names, FIPS; unknowns null") {
    val df = Seq("CO", "colorado", "Texas ", "08", "Atlantis").toDF("raw")
    val got = graft.em.Staging.standardizeStateCode(df, "raw", "std_code")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("CO").contains("CO"))
    assert(got("colorado").contains("CO"))
    assert(got("Texas ").contains("TX"))
    assert(got("08").contains("CO"))
    assert(got("Atlantis").isEmpty)
  }

  test("priorityRank maps listed values in order and defaults past the end") {
    val out = Seq("HIGH", "LOW", "???").toDF("s")
      .select(priorityRank(col("s"), Seq("HIGH", "MED", "LOW")).as("p")).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 3, 4))
  }
}
