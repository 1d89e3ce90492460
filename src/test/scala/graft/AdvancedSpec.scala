package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Graph}

/** As-of join semantics, connected-components cluster resolution, and the
  * SQL-registered native expressions (GraftExtensions). */
class AdvancedSpec extends SparkSpecBase {
  import spark.implicits._

  test("asOfLeft picks latest prior build row, inclusive on ties") {
    val probe = Seq(
      (1L, 10L, "p1"), // before any build -> null
      (1L, 20L, "p2"), // exactly at build t=20 -> inclusive match
      (1L, 35L, "p3"), // between 30 and 40 -> t=30 value
      (2L, 99L, "p4")  // key with no build rows -> null
    ).toDF("k", "t", "tag")
    val build = Seq(
      (1L, 20L, 200.0),
      (1L, 30L, 300.0),
      (1L, 40L, 400.0)
    ).toDF("k", "t", "v")

    val out = AsOfJoin.asOfLeft(probe, build, "k", "t", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out("p1").isEmpty)
    assert(out("p2").contains(200.0))
    assert(out("p3").contains(300.0))
    assert(out("p4").isEmpty)
  }

  test("asOfLeft: a build row with NULL payload blocks carry-forward past it") {
    val probe = Seq((1L, 25L, "p")).toDF("k", "t", "tag")
    val build = Seq(
      (1L, 10L, Some(100.0)),
      (1L, 20L, None) // newest prior observation IS null
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asOfLeft(probe, build, "k", "t", Seq("v"))
      .select("asof_v").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None))
  }

  test("asOfLeft deduplicates build ties on (key, time) deterministically") {
    val probe = Seq((1L, 30L, "p")).toDF("k", "t", "tag")
    val build = Seq((1L, 20L, 5.0), (1L, 20L, 9.0)).toDF("k", "t", "v")
    val out = AsOfJoin.asOfLeft(probe, build, "k", "t", Seq("v"))
      .select("asof_v").as[Double].collect()
    assert(out.toSeq == Seq(9.0)) // max(struct(v)) keeps the largest payload
  }

  test("connectedComponents labels chains, triangles, and isolated nodes") {
    // component {1,2,3,4} as a chain, {10,11,12} as a triangle, {99} isolated
    val nodes = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L)).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("a", "b")
    val cc = Graph.connectedComponents(nodes, edges, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(cc(99L) == 99L)
  }

  test("keepersByWeight keeps heaviest doc per cluster, min-id tie-break") {
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L)).toDF("id", "comp")
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 50L), (9L, 7L)).toDF("doc_id", "n_chars")
    val keep = Graph.keepersByWeight(cc, docs, "doc_id", "n_chars")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(keep.toSeq == Seq((1L, 2L, 3L), (9L, 9L, 1L))) // doc 2 wins tie vs 3 by id
  }

  test("hashSplit: deterministic, disjoint, ratio-correct, partition-stable") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val s1 = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.8, "test" -> 0.2))
    val s2 = Sampling.hashSplit(docs.repartition(13), "doc_id", Seq("train" -> 0.8, "test" -> 0.2))
    val m1 = s1.select("doc_id", "split").as[(Long, String)].collect().toMap
    val m2 = s2.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m1 == m2) // same membership regardless of partitioning
    assert(m1.size == docs.count()) // fractions sum to 1 -> nothing dropped
    val trainFrac = m1.values.count(_ == "train").toDouble / m1.size
    assert(trainFrac > 0.7 && trainFrac < 0.9)
  }

  test("stratifiedByHash keeps per-stratum fractions approximately") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val out = Sampling.stratifiedByHash(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 1.0))
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val all = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept.getOrElse("de", 0L) == all("de")) // fraction 1.0 keeps all
    val enFrac = kept.getOrElse("en", 0L).toDouble / all("en")
    assert(enFrac > 0.3 && enFrac < 0.7)
    assert(!kept.keySet.exists(k => k != "en" && k != "de")) // unlisted strata dropped
  }

  test("GraftExtensions registers native expressions as SQL functions") {
    assume(spark.conf.getOption("spark.sql.extensions").exists(_.contains("GraftExtensions")))
    val r = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "vector_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "vector_normalize(array(3.0D, 4.0D)) AS n, " +
        "rolling_fingerprint('hello world hello', 8) AS f"
    ).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    val n = r.getSeq[Double](2)
    assert(math.abs(n(0) - 0.6) < 1e-12 && math.abs(n(1) - 0.8) < 1e-12)
    // SQL form must agree with the Column API form
    val viaCol = Seq("hello world hello").toDF("t")
      .select(graft.plans.VectorExpressions.rolling_fingerprint(col("t"), 8))
      .head().getLong(0)
    assert(r.getLong(3) == viaCol)
  }

  test("WordShingles native expression == HOF formulation (incl. edge cases)") {
    import graft.functions.TextFunctions
    val hof = { (text: org.apache.spark.sql.Column, n: Int) =>
      val toks = split(text, " ", -1)
      array_distinct(transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "", "a", "a b", "a b c", "a  b", " leading", "trailing ", "a a a a a",
      "x y x y x y", "αβγ δεζ ηθι κλμ", "tab\tis one token"
    ).toDF("t")
    for (n <- Seq(1, 2, 3, 5)) {
      val got = cases.select(TextFunctions.wordShingles(col("t"), n)).collect().map(_.getSeq[String](0))
      val want = cases.select(hof(col("t"), n)).collect().map(_.getSeq[String](0))
      assert(got.toSeq == want.toSeq, s"n=$n")
    }
    // null in -> null out
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 3)).collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("WordShingles matches HOF on the real corpus (property over sf0.001)") {
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val toks = split(col("text"), " ", -1)
    val hof = array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - 3, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
    val diff = docs.select(
      TextFunctions.wordShingles(col("text"), 3).as("a"), hof.as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(diff == 0)
  }

  test("SQL vector_cosine matches Column API on real embeddings") {
    assume(spark.conf.getOption("spark.sql.extensions").exists(_.contains("GraftExtensions")))
    val e = spark.read.parquet(s"$Sf0001/embeddings.parquet").limit(20).cache()
    e.createOrReplaceTempView("emb_ext_test")
    val sqlSum = spark.sql(
      """SELECT sum(vector_cosine(a.embedding, b.embedding)) AS s
        |FROM emb_ext_test a JOIN emb_ext_test b ON a.vec_id < b.vec_id""".stripMargin)
      .head().getDouble(0)
    val colSum = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(graft.plans.VectorExpressions.vector_cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .agg(sum("c")).head().getDouble(0)
    assert(sqlSum == colSum)
  }
}
