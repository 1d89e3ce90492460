package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

/** Differential spec: the distributed-selection exact percentile must agree
  * bit-for-bit with Spark's builtin `percentile` (same interpolation
  * formula), across ties, skewed groups, singleton groups, and nulls. */
class PercentilesSpec extends SparkSpecBase {
  import spark.implicits._

  // NO pre-filter: the builtin ignores null values natively but KEEPS a
  // group whose values are all null (null percentiles) — the baseline must
  // exercise that path too, or the parity claim is untested.
  private def builtin(df: org.apache.spark.sql.DataFrame) = df
    .groupBy("g")
    .agg(
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.75)").as("p75"))

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    def grab(df2: org.apache.spark.sql.DataFrame) = df2.collect()
      .map(r => r.getString(0) ->
        (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i))))
      .toMap
    val exp = grab(builtin(df))
    val got = grab(Percentiles
      .exactByRange(df, "g", "v", Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)))
    assert(got.keySet == exp.keySet)
    // bit-exact: identical interpolation formula, deterministic inputs
    // (NaN-aware — plain == would fail NaN==NaN)
    def beq(a: Option[Double], b: Option[Double]) = (a, b) match {
      case (Some(x), Some(y)) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
      case (None, None) => true
      case _            => false
    }
    got.foreach { case (g, t) =>
      val e = exp(g)
      assert(t.lazyZip(e).forall(beq), s"group $g: $t vs $e")
    }
  }

  test("matches builtin percentile on random data with ties and skewed groups") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      val g = if (i % 10 < 7) "big" else if (i % 10 < 9) "mid" else "small"
      // coarse rounding forces many ties; mix in exact-rank sizes
      (g, math.rint(rnd.nextDouble() * 50) / 2.0)
    }
    check(rows.toDF("g", "v").repartition(7))
  }

  test("singleton group, two-value group, and all-equal group") {
    val rows = Seq(
      ("one", 3.5),
      ("two", 1.0), ("two", 2.0),
      ("flat", 9.0), ("flat", 9.0), ("flat", 9.0), ("flat", 9.0)
    )
    check(rows.toDF("g", "v").repartition(5))
  }

  test("null values are excluded like the builtin") {
    val rows = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", Some(5.0)), ("b", None))
    check(rows.map { case (g, v) => (g, v.map(Double.box).orNull) }
      .toDF("g", "v").selectExpr("g", "cast(v as double) as v"))
  }

  test("a group whose values are ALL null emits a row with null quantiles") {
    val rows = Seq(
      ("allnull", None), ("allnull", None),
      ("b", Some(5.0)), ("b", Some(7.0)), ("b", None))
    check(rows.map { case (g, v) => (g, v.map(Double.box).orNull) }
      .toDF("g", "v").selectExpr("g", "cast(v as double) as v"))
  }

  test("null groups are kept and NaN sorts greatest, matching the builtin") {
    val rows: Seq[(String, Double)] = Seq(
      (null, 1.0), (null, 2.0), (null, 3.0), ("a", 5.0),
      ("n", 1.0), ("n", 2.0), ("n", Double.NaN), ("n", Double.NaN))
    check(rows.toDF("g", "v").repartition(3))
  }

  test("non-string group columns keep their type in the output") {
    val rows = Seq((7, 1.0), (7, 3.0), (8, 10.0))
    val out = Percentiles.exactByRange(rows.toDF("g", "v"), "g", "v", Seq("p50" -> 0.5))
    assert(out.schema("g").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      == Map(7 -> 2.0, 8 -> 10.0))
  }

  test("maxGroups guard fails loudly BEFORE collecting B×G counters") {
    // an unbounded-G caller must get an actionable error, not a driver
    // OOM mid-collect (the HeavyHitters require pattern)
    val rows = Seq.tabulate(10)(i => (s"g$i", i.toDouble))
    val e = intercept[IllegalArgumentException] {
      Percentiles.exactByRange(rows.toDF("g", "v"), "g", "v",
        Seq("p50" -> 0.5), maxGroups = 4)
    }
    assert(e.getMessage.contains("maxGroups"))
    // ALL-NULL-valued groups count too: they bypass the value filter but
    // still land on the driver via the output spine — the exact rows an
    // input-side guard would miss
    val nullRows = Seq.tabulate(10)(i => (s"g$i", Option.empty[Double]))
    val e2 = intercept[IllegalArgumentException] {
      Percentiles.exactByRange(nullRows.toDF("g", "v"), "g", "v",
        Seq("p50" -> 0.5), maxGroups = 4)
    }
    assert(e2.getMessage.contains("maxGroups"))
    // at or under the bound, results are unchanged
    val ok = Percentiles.exactByRange(rows.toDF("g", "v"), "g", "v",
      Seq("p50" -> 0.5), maxGroups = 10)
    assert(ok.count() == 10)
  }

  test("the input frame is scanned exactly once per invocation") {
    // round-15 machinery shape: ONE compaction scan feeds boundary/guard
    // estimation, the B×G count pass, the rank pass AND the output spine
    // (the pre-round-15 shape paid a SECOND full input scan + its own
    // driver job to build the spine for the maxGroups guard). Pinned with
    // a per-row accumulator riding the input projection: it fires only
    // when the raw input is (re)executed, never on reads of the persisted
    // compacted frame. Exactly-1000 would flake on a task retry, so the
    // assertion pins "strictly below the 2-scan signature".
    val acc = spark.sparkContext.longAccumulator("perc_input_rows")
    val bump = udf((x: Double) => { acc.add(1); x }).asNondeterministic()
    val df = Seq.tabulate(1000)(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
      .withColumn("v", bump(col("v")))
    val out = Percentiles.exactByRange(df, "g", "v", Seq("p50" -> 0.5))
    assert(out.count() == 3)
    assert(acc.value >= 1000L && acc.value < 2000L,
      s"input scanned ${acc.value / 1000.0}x; the single-scan shape reads it once")
  }

  test("integral-rank positions hit exact values (no interpolation drift)") {
    // 5 values -> p25 rank = 1 + .25*4 = 2.0 exactly
    val rows = Seq.tabulate(5)(i => ("g", (i + 1).toDouble))
    val out = Percentiles.exactByRange(rows.toDF("g", "v"), "g", "v",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)).collect().head
    assert((out.getDouble(1), out.getDouble(2), out.getDouble(3)) == ((2.0, 3.0, 4.0)))
  }
}
