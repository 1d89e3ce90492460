package graft

import org.apache.spark.sql.functions._

import graft.plans.TopRepeatedGram

/** Round-13 hardening: the native TopRepeatedGram expression behind the
  * zero-shuffle t18 repetition filter. */
class Wave12Spec extends SparkSpecBase {
  import spark.implicits._

  private def top(text: String, n: Int): Option[(Long, String)] = {
    val r = Seq(Tuple1(text)).toDF("t")
      .select(TopRepeatedGram.top_repeated_gram(col("t"), n).as("s"))
      .head()
    if (r.isNullAt(0)) None
    else { val s = r.getStruct(0); Some((s.getLong(0), s.getString(1))) }
  }

  test("top_repeated_gram counts multiplicity and picks the max-count gram") {
    // "a b" occurs 3x (positions 0, 2, 4 of: a b a b a b c)
    assert(top("a b a b a b c", 2).contains((3L, "a b")))
    assert(top("x y z x y z x y z", 3).contains((3L, "x y z")))
  }

  test("top_repeated_gram tie-break is the LARGEST gram (max(struct(cnt,g)) semantics)") {
    // "a b" and "b a" both occur 2x in: a b a b a -> the larger string wins
    assert(top("a b a b a", 2).contains((2L, "b a")))
    // all grams unique -> count 1, largest string wins
    assert(top("c a b", 2).contains((1L, "c a")))
  }

  test("top_repeated_gram is null below n tokens (oracle len(w) >= n guard)") {
    assert(top("solo", 2).isEmpty)
    assert(top("two words", 3).isEmpty)
    assert(top("", 2).isEmpty)            // split('') -> [''] = 1 token
    assert(top("two words", 2).contains((1L, "two words")))
  }

  test("top_repeated_gram keeps split(' ') empty-token semantics (double space)") {
    // split on single space: "a  b" -> [a, '', b]; 2-grams: "a ", " b"
    // (byte-slice parity with the exploded concat_ws formulation)
    assert(top("a  b", 2).contains((1L, "a ")))
  }

  test("top_repeated_gram agrees with the exploded HOF formulation on the corpus") {
    // the round-12 shape, as the in-Spark oracle for the native expression
    val docs = graft.core.Tables(spark, Sf0001).documents.limit(200)
      .select(col("doc_id"), split(col("text"), " ").as("w"), col("text"))
    def gramsOf(n: Int) =
      when(size(col("w")) >= n,
        transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("w"), i + k)): _*)))
        .otherwise(array().cast("array<string>"))
    for (n <- Seq(2, 3)) {
      val expected = docs
        .select(col("doc_id"), explode(gramsOf(n)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(max(struct(col("cnt"), col("g"))).as("t"))
        .select(col("doc_id"), col("t.cnt"), col("t.g"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      val actual = docs
        .select(col("doc_id"), TopRepeatedGram.top_repeated_gram(col("text"), n).as("s"))
        .collect().flatMap { r =>
          if (r.isNullAt(1)) None
          else Some(r.getLong(0) -> ((r.getStruct(1).getLong(0), r.getStruct(1).getString(1))))
        }.toMap
      assert(actual == expected, s"n=$n native vs exploded mismatch")
    }
  }

  test("t18 repetition filter is a pure map: physical plan has no exchange") {
    val q = graft.queries.TextQueries.queries("t18_repetition_filter")
    val plan = q(spark, Sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition pass must not shuffle:\n$plan")
  }

  test("top_repeated_gram is registered in SQL") {
    val r = spark.sql(
      "SELECT top_repeated_gram('a b a b a b c', 2) AS s").head().getStruct(0)
    assert(r.getLong(0) == 3L && r.getString(1) == "a b")
  }
}
