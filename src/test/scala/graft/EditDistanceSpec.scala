package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

import graft.plans.LevenshteinWithin

/** Differential correctness of the banded Ukkonen edit distance against a
  * reference full-matrix implementation: for EVERY pair and threshold,
  * levenshtein_within(a, b, k) == min(levenshtein(a, b), k + 1). */
object EditDistanceProps extends Properties("LevenshteinWithin") {

  private def full(a: String, b: String): Int = {
    val s = a.codePoints.toArray
    val t = b.codePoints.toArray
    val dp = Array.tabulate(s.length + 1)(i => i)
    var i = 1
    while (i <= t.length) {
      var prevDiag = dp(0)
      dp(0) = i
      var j = 1
      while (j <= s.length) {
        val tmp = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prevDiag + (if (s(j - 1) == t(i - 1)) 0 else 1))
        prevDiag = tmp
        j += 1
      }
      i += 1
    }
    dp(s.length)
  }

  private val word = Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.oneOf("abcde√üé".toSeq)))

  property("banded == min(full, k+1) on random short strings") =
    forAll(word, word, Gen.chooseNum(0, 6)) { (a, b, k) =>
      LevenshteinWithin.compute(UTF8String.fromString(a), UTF8String.fromString(b), k) ==
        math.min(full(a, b), k + 1)
    }

  property("symmetry") = forAll(word, word, Gen.chooseNum(0, 6)) { (a, b, k) =>
    LevenshteinWithin.compute(UTF8String.fromString(a), UTF8String.fromString(b), k) ==
      LevenshteinWithin.compute(UTF8String.fromString(b), UTF8String.fromString(a), k)
  }

  property("identity and cap") = forAll(word, Gen.chooseNum(0, 6)) { (a, k) =>
    LevenshteinWithin.compute(UTF8String.fromString(a), UTF8String.fromString(a), k) == 0 &&
      LevenshteinWithin.compute(UTF8String.fromString(a), UTF8String.fromString(a + "xxxxxxxxxx"), k) <= k + 1
  }
}

/** Spark-side parity: the expression inside a real plan equals the builtin
  * levenshtein wherever the builtin is within threshold. */
class EditDistanceSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("levenshtein_within matches the builtin on every within-threshold pair (codegen path)") {
    val words = Seq("red widget", "ted widget", "rad widget", "blue widget",
      "small gizmo", "smalt gizmo", "", "a", "ab", "réd widget")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val pairs = df.as("x").crossJoin(df.as("y"))
      .select(col("x.w").as("a"), col("y.w").as("b"))
    val k = 3
    val out = pairs.select(
      col("a"), col("b"),
      graft.plans.LevenshteinWithin.levenshtein_within(col("a"), col("b"), k).as("banded"),
      least(levenshtein(col("a"), col("b")), lit(k + 1)).as("expected")).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("banded") == r.getAs[Int]("expected"),
        s"${r.getAs[String]("a")} vs ${r.getAs[String]("b")}")
    }
  }

  test("d17's plan keeps whole-stage codegen around the banded predicate") {
    val out = graft.queries.EventGraphQueries.queries("d17_fuzzy_join")(spark, Sf0001)
    out.queryExecution.toRdd.count() // execute THIS plan so AQE finalizes it
    val plan = out.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in plan strings —
    // every operator evaluating the banded predicate must carry it
    val finalSection = plan.split("== Initial Plan ==")(0)
    val predLines = finalSection.split("\n").filter(_.contains("levenshteinwithin"))
    assert(predLines.nonEmpty && predLines.forall(_.contains("*(")), plan.take(800))
  }
}
