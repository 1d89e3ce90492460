package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Upsert, Validation}

/** Round-4 wave-5 operators: n-gram containment dedup, token-budget epoch
  * repeat, PSI drift detection, CDC changelog apply, token entropy. */
class Wave5Spec extends SparkSpecBase {
  import spark.implicits._

  // ---- d12 containment ------------------------------------------------

  test("containment flags a subset doc that Jaccard misses") {
    // doc 2 is a verbatim quote of doc 1 embedded in a much larger host:
    // containment(quote in host) = 1.0 while Jaccard is diluted below 0.5
    val quote = "alpha beta gamma delta epsilon zeta"
    val host = quote + " " + (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "b", quote),
      (2L, "b", host),
      (3L, "b", "totally unrelated words here only once")
    ).toDF("doc_id", "source", "text")

    val cont = Dedup.containmentPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.9)
      .collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12) // all of doc1's shingles appear in doc2
    assert(r.getDouble(3) < 0.5)                   // but doc2 is mostly other text

    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.5)
      .collect()
    assert(jac.isEmpty, "Jaccard at 0.5 must miss the embedded quote")
  }

  // ---- x13 token-budget repeat ---------------------------------------

  test("token-budget repeat hits each source's budget within quantization error") {
    // 3 sources with very different sizes; uniform budget = total/3
    val docs = (0 until 300).map { i =>
      val src = if (i < 200) "big" else if (i < 280) "mid" else "small"
      (i.toLong, src, "tok " * 10) // 10-ish tokens each; exact count unimportant
    }.toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tok"))

    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val budgets = docs.groupBy("source").agg(sum("n_tok").as("tokens"))
      .withColumn("budget_tokens",
        sum(col("tokens")).over(w).cast("double") / count(lit(1)).over(w))
      .select("source", "budget_tokens")

    val out = Sampling.tokenBudgetRepeat(docs, "doc_id", "source", "n_tok", budgets)
    val perSrc = out.join(docs, Seq("doc_id", "source"))
      .groupBy("source").agg(sum("n_tok").as("emitted_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val budget = budgets.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // each source's emitted token mass ≈ its budget: the Bernoulli draw is
    // per-doc, so tolerance is a few docs' worth of tokens per source
    val docTokens = 11.0
    budget.foreach { case (src, b) =>
      val got = perSrc.getOrElse(src, 0L).toDouble
      assert(math.abs(got - b) <= 12 * docTokens,
        s"$src emitted $got vs budget $b")
    }
    // upsampled source emits MORE tokens than it owns; downsampled fewer
    val owned = docs.groupBy("source").agg(sum("n_tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc("small") > owned("small"))
    assert(perSrc("big") < owned("big"))
  }

  test("token-budget repeat schedule is a pure function of (doc, seed)") {
    val docs = (0 until 100)
      .map(i => (i.toLong, if (i % 3 == 0) "a" else "b", 10L))
      .toDF("doc_id", "source", "n_tok")
    val budgets = Seq(("a", 500.0), ("b", 1500.0)).toDF("source", "budget_tokens")
    val a = Sampling.tokenBudgetRepeat(docs, "doc_id", "source", "n_tok", budgets)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sorted
    val b = Sampling.tokenBudgetRepeat(docs.repartition(7), "doc_id", "source", "n_tok", budgets)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sorted
    assert(a.sameElements(b))
    // epochs per doc are dense 1..n
    val byDoc = a.groupBy(_._1).values
    assert(byDoc.forall(es => es.map(_._2).sorted.sameElements(1 to es.length)))
  }

  // ---- a21 PSI drift --------------------------------------------------

  test("PSI is near zero for identical cohorts and large for disjoint ones") {
    // same distribution in both cohorts -> psi ~ 0
    // value keyed off i/2 so the even and odd cohorts see the SAME values
    val same = (0 until 1000).map(i => ("t", i.toLong, ((i / 2) % 20).toDouble))
      .toDF("event_type", "event_id", "value")
    val psiSame = Validation.psiDrift(same, "event_type", "value",
      cohortA = col("event_id") % 2 === 0, binWidth = 5.0, nBins = 5)
      .head()
    assert(math.abs(psiSame.getAs[Double]("psi")) < 0.01)
    assert(!psiSame.getAs[Boolean]("is_drift"))

    // cohort A all in bin 0, cohort B all in bin 4 -> massive psi
    val split = (0 until 1000).map { i =>
      val isA = i % 2 == 0
      ("t", i.toLong, if (isA) 1.0 else 22.0)
    }.toDF("event_type", "event_id", "value")
    val psiSplit = Validation.psiDrift(split, "event_type", "value",
      cohortA = col("event_id") % 2 === 0, binWidth = 5.0, nBins = 5).head()
    assert(psiSplit.getAs[Double]("psi") > 1.0)
    assert(psiSplit.getAs[Boolean]("is_drift"))
  }

  // ---- u9 CDC apply ---------------------------------------------------

  test("CDC apply keeps the newest non-tombstone row and drops deleted keys") {
    val changes = Seq(
      // key 1: insert, update -> survives with v2 value
      (1L, 10L, "upsert", 1.0),
      (1L, 11L, "upsert", 2.0),
      // key 2: insert then delete -> gone
      (2L, 20L, "upsert", 3.0),
      (2L, 21L, "delete", 0.0),
      // key 3: delete then re-insert -> back with the new value
      (3L, 30L, "delete", 0.0),
      (3L, 31L, "upsert", 9.0)
    ).toDF("k", "ver", "op", "v")
    val out = Upsert.cdcApply(changes, Seq("k"), "ver", "ver", isDelete = col("op") === "delete")
      .select("k", "ver", "v").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(out.toSeq == Seq((1L, 11L, 2.0), (3L, 31L, 9.0)))
  }

  // ---- d13 corpus overlap ---------------------------------------------

  test("corpus overlap estimates 1 for identical sources and ~0 for disjoint ones") {
    val text1 = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val text2 = (1 to 40).map(i => s"omega$i").mkString(" ")
    val docs = Seq(
      (1L, "a", text1), (2L, "b", text1), // b is a verbatim copy of a
      (3L, "c", text2)                    // c shares no shingle with either
    ).toDF("doc_id", "source", "text")
    val est = Dedup.corpusOverlap(docs, "source", "text", n = 3, k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(est(("a", "b")) == 1.0)
    assert(est(("a", "c")) == 0.0)
    assert(est(("b", "c")) == 0.0)
  }

  test("fast (xxhash64) corpus overlap twin agrees with the portable md5 estimator") {
    val text1 = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val text2 = (1 to 40).map(i => s"omega$i").mkString(" ")
    val half = ((1 to 20).map(i => s"alpha$i") ++ (1 to 20).map(i => s"omega$i")).mkString(" ")
    val docs = Seq(
      (1L, "a", text1), (2L, "b", text1), // identical corpora -> J = 1
      (3L, "c", text2),                   // disjoint from a/b -> J = 0
      (4L, "d", half)                     // partial overlap with both
    ).toDF("doc_id", "source", "text")
    val fast = Dedup.corpusOverlapFast(docs, "source", "text", n = 3, k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // exact endpoints are hash-family independent
    assert(fast(("a", "b")) == 1.0)
    assert(fast(("a", "c")) == 0.0)
    // mid-range estimates from two independent k=16 permutation families
    // agree within minhash sampling error (std ≈ sqrt(J(1-J)/k) ≈ 0.12)
    val md5e = Dedup.corpusOverlap(docs, "source", "text", n = 3, k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    md5e.foreach { case (pair, e) => assert(math.abs(fast(pair) - e) <= 0.4) }
  }

  // ---- u10 snapshot diff ----------------------------------------------

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, 1.0, 10L), (2L, 2.0, 11L), (3L, 3.0, 12L))
      .toDF("k", "value", "ver")
    val v2 = Seq((2L, 2.0, 21L), (3L, 9.0, 22L), (4L, 4.0, 23L))
      .toDF("k", "value", "ver")
    val out = Upsert.snapshotDiff(v1, v2, "k", Seq("value"), Seq("ver"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  // ---- t20 token entropy ----------------------------------------------

  test("token entropy separates uniform from degenerate docs") {
    val docs = Seq(
      (1L, "a b c d e f g h"),       // uniform over 8 types: H = ln 8
      (2L, "a a a a a a a a"),       // single type: H = 0
      (3L, "a a a a b b c d")        // mixed
    ).toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val h = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"))
      .select(col("doc_id"),
        (log(col("n").cast("double")) - col("clc") / col("n")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(h(1L) - math.log(8)) < 1e-12)
    assert(math.abs(h(2L)) < 1e-12)
    assert(h(3L) > 0 && h(3L) < math.log(8))
  }
}
