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

  test("top_repeated_gram_pair equals two single-width calls (one tokenization)") {
    val docs = graft.core.Tables(spark, Sf0001).documents.limit(200)
    val both = docs.select(col("doc_id"),
        TopRepeatedGram.top_repeated_gram(col("text"), 2).as("s2"),
        TopRepeatedGram.top_repeated_gram(col("text"), 3).as("s3"),
        TopRepeatedGram.top_repeated_gram_pair(col("text"), 2, 3).as("p"))
      .collect()
    both.foreach { r =>
      def f(i: Int) = if (r.isNullAt(i)) null
        else { val s = r.getStruct(i); (s.getLong(0), s.getString(1)) }
      val p = r.getStruct(3)
      def pf(i: Int) = if (p.isNullAt(i)) null
        else { val s = p.getStruct(i); (s.getLong(0), s.getString(1)) }
      assert(pf(0) == f(1) && pf(1) == f(2), s"pair mismatch for doc ${r.getLong(0)}")
    }
  }

  test("top_repeated_gram is registered in SQL") {
    val r = spark.sql(
      "SELECT top_repeated_gram('a b a b a b c', 2) AS s").head().getStruct(0)
    assert(r.getLong(0) == 3L && r.getString(1) == "a b")
  }

  // ---- pre-banded signature index (st22 probe trim) --------------------

  test("withBandHashCols is idempotent under the SAME scheme, additive under another") {
    import graft.operators.Dedup
    val docs = graft.core.Tables(spark, Sf0001).documents.select("doc_id", "text")
      .filter(col("doc_id") < 20)
    val sigs = Dedup.portableSignatures(docs, "doc_id", "text", n = 3, k = 32)
    val banded = Dedup.withBandHashCols(sigs, 32, 8, portable = true)
    // same scheme again: a NO-OP (round-13 advice: a second application
    // appended duplicate bh columns, making every later col() reference
    // an AnalysisException instead of a working frame)
    val again = Dedup.withBandHashCols(banded, 32, 8, portable = true)
    assert(again.columns.toSeq == banded.columns.toSeq)
    assert(again.columns.count(_ == "bh_md5_32_8_0") == 1)
    // a DIFFERENT scheme still appends its own columns (both schemes can
    // coexist; names disambiguate)
    val other = Dedup.withBandHashCols(banded, 32, 4, portable = true)
    assert(other.columns.contains("bh_md5_32_4_0") && other.columns.contains("bh_md5_32_8_0"))
  }

  test("pre-banded signature index probes identically to a bare one") {
    import graft.operators.Dedup
    val docs = graft.core.Tables(spark, Sf0001).documents.select("doc_id", "text")
    val idxSigs = Dedup.portableSignatures(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", n = 3, k = 32)
    val probeSigs = Dedup.portableSignatures(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", n = 3, k = 32)
    def run(index: org.apache.spark.sql.DataFrame) = {
      val (m, a) = Dedup.incrementalNearDupFromSigs(
        index, probeSigs, k = 32, bands = 8, threshold = 0.5)
      (m.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq,
        a)
    }
    val (mBare, aBare) = run(idxSigs)
    val (mBanded, aBanded) = run(Dedup.withBandHashCols(idxSigs, 32, 8, portable = true))
    assert(mBare.nonEmpty, "fixture should produce cross-half matches")
    assert(mBanded == mBare, "stored band hashes must probe identically to recomputed ones")
    // a banded index keeps itself banded: admitted deltas carry the
    // scheme-tagged bh cols (variant+k+bands ride the NAME so a mismatch
    // falls back to recompute instead of silently probing wrong)...
    val bh = (i: Int) => s"bh_md5_32_8_$i"
    assert((0 until 8).forall(b => aBanded.columns.contains(bh(b))))
    // ...with the same doc set either way, and the SAME band hash values
    // a fresh banding would produce (append-then-probe stays consistent)
    val admIds = aBanded.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(admIds == aBare.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    val rebanded = Dedup.withBandHashCols(
        aBare.select(probeSigs.columns.map(col).toSeq: _*), 32, 8, portable = true)
      .select(col("doc_id"), col(bh(0)), col(bh(7)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val stored = aBanded.select(col("doc_id"), col(bh(0)), col(bh(7)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(stored == rebanded)
    // scheme mismatch is SAFE, not silent corruption: probing the
    // md5-banded index with portable=false ignores the stored columns
    // (different scheme tag), recomputes xxh bands on both sides, and
    // returns the same match SET the bare xxh probe does
    val (mXxhOnBanded, _) = {
      val (m, a) = Dedup.incrementalNearDupFromSigs(
        Dedup.withBandHashCols(idxSigs, 32, 8, portable = true), probeSigs,
        k = 32, bands = 8, threshold = 0.5, portable = false)
      (m.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq, a)
    }
    val (mXxhBare, _) = {
      val (m, a) = Dedup.incrementalNearDupFromSigs(
        idxSigs, probeSigs, k = 32, bands = 8, threshold = 0.5, portable = false)
      (m.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq, a)
    }
    assert(mXxhOnBanded == mXxhBare,
      "a scheme-mismatched pre-banded index must recompute, never probe stored hashes")
  }

  // ---- full-depth PSL ingestion (round-12 verdict items 2 + 7) ---------

  /** A real-publicsuffix.org-SHAPED fixture: section markers, bare TLDs,
    * 2-/3-/4-/5-label literals, shallow and deep wildcards, 2- and
    * 3-label exceptions — every rule shape the downloaded list contains
    * (the env has no egress, so the shape is pinned, not the bytes). */
  private val fullListFixture = Seq(
    "// ===BEGIN ICANN DOMAINS===",
    "com", "uk", "co.uk", "us", "k12.ma.us", "pvt.k12.ma.us",
    "jp", "*.kawasaki.jp", "!city.kawasaki.jp",
    "ck", "*.ck", "!www.ck",
    "// ===END ICANN DOMAINS===",
    "// ===BEGIN PRIVATE DOMAINS===",
    "s3.dualstack.ap-northeast-1.amazonaws.com",
    "*.compute.amazonaws.com",
    "// ===END PRIVATE DOMAINS===")

  private lazy val fullSnap =
    graft.functions.PublicSuffixes.parse(fullListFixture.iterator)

  test("full-list fixture round-trips into a working snapshot") {
    assert(fullSnap.suffixesByDepth.keySet == Set(2, 3, 4, 5))
    assert(fullSnap.suffixesByDepth(5) == Seq("s3.dualstack.ap-northeast-1.amazonaws.com"))
    assert(fullSnap.wildcardBasesByDepth.keySet == Set(1, 2, 3))
    assert(fullSnap.exceptionsByDepth.keySet == Set(2, 3))
    assert(fullSnap.maxRegistrableLabels == 6)
  }

  /** PSL-algorithm expectations over the fixture — incl. the verdict's
    * adversarial 4-label case (pvt.k12.ma.us vs k12.ma.us precedence). */
  private val pslCases = Seq(
    // 4-label literal beats the 3-label one underneath it
    "https://school.pvt.k12.ma.us/p" -> "school.pvt.k12.ma.us",
    "https://a.school.pvt.k12.ma.us/p" -> "school.pvt.k12.ma.us",
    // host that IS the 4-label suffix keys to itself
    "https://pvt.k12.ma.us/p" -> "pvt.k12.ma.us",
    // sibling label under k12.ma.us only sees the 3-label rule
    "https://school.k12.ma.us/p" -> "school.k12.ma.us",
    // deep exception beats the deep wildcard (PSL absolute precedence)
    "https://a.city.kawasaki.jp/p" -> "city.kawasaki.jp",
    "https://city.kawasaki.jp/p" -> "city.kawasaki.jp",
    // deep wildcard: foo.kawasaki.jp is itself a public suffix
    "https://shop.foo.kawasaki.jp/p" -> "shop.foo.kawasaki.jp",
    // host that IS a wildcard-derived suffix SELF-KEYS (round 14: the
    // same convention literal bare suffixes follow — the round-13
    // fall-through to the wildcard base merged foo/bar.kawasaki.jp,
    // two DISTINCT public suffixes, onto one quota/dedup key)
    "https://foo.kawasaki.jp/p" -> "foo.kawasaki.jp",
    // host that merely IS a wildcard BASE has no L-label suffix under
    // the rule: the lastL<>'' guard drops it to the plain fallback
    "https://kawasaki.jp/p" -> "kawasaki.jp",
    // 3-label wildcard base from the private section -> registrable at 5
    "https://b.x.compute.amazonaws.com/p" -> "b.x.compute.amazonaws.com",
    // 5-label private literal -> registrable at 6
    "https://bucket.s3.dualstack.ap-northeast-1.amazonaws.com/p"
      -> "bucket.s3.dualstack.ap-northeast-1.amazonaws.com",
    // bare 5-label literal suffix self-keys too (round 12 fell through
    // four tiers to amazonaws.com — the same merge bug, literal shape)
    "https://s3.dualstack.ap-northeast-1.amazonaws.com/p"
      -> "s3.dualstack.ap-northeast-1.amazonaws.com",
    // the compact tiers still behave inside the full snapshot
    "https://www.ck/p" -> "www.ck",
    "https://foo.brand.ck/p" -> "foo.brand.ck",
    "https://bbc.co.uk/p" -> "bbc.co.uk",
    "https://a.b.example.com/p" -> "example.com")

  test("full-depth PSL: inline Column path implements the PSL algorithm") {
    val urls = pslCases.map(_._1).toDF("url")
    val got = urls
      .select(col("url"),
        graft.functions.UrlFunctions.registrableDomainPsl(col("url"), fullSnap).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    pslCases.foreach { case (u, want) =>
      assert(got(u) == want, s"inline: $u -> ${got(u)}, want $want") }
  }

  test("full-depth PSL: broadcast-join path agrees and never shuffles the corpus side") {
    val urls = pslCases.map(_._1).toDF("url")
    val joined = graft.functions.UrlFunctions.withRegistrableDomainFromHost(
      urls, graft.functions.UrlFunctions.urlHost(col("url")), "d", Some(fullSnap))
    val got = joined.select("url", "d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    pslCases.foreach { case (u, want) =>
      assert(got(u) == want, s"broadcast: $u -> ${got(u)}, want $want") }
    // every tier probe must be a broadcast hash join: the corpus side of
    // a 100 TB crawl never moves for bounded reference data. Count REAL
    // ShuffleExchangeExec nodes (AQE off — PlanAudit contract) instead of
    // string-matching: ShuffleExchangeExec prints as plain "Exchange",
    // which a "ShuffleExchange" token never matches (vacuous guard), and
    // a bare "Exchange" match would false-positive on the allowed
    // BroadcastExchange nodes.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val replanned = graft.functions.UrlFunctions.withRegistrableDomainFromHost(
        pslCases.map(_._1).toDF("url"),
        graft.functions.UrlFunctions.urlHost(col("url")), "d", Some(fullSnap))
      assert(PlanAudit.shuffleCount(replanned) == 0,
        s"PSL promotion must not shuffle the corpus side:\n${replanned.queryExecution.executedPlan}")
      val plan = replanned.queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => "bhj"
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => "smj"
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => "shj"
      }
      assert(joins.nonEmpty && joins.forall(_ == "bhj"),
        s"every PSL tier probe must be a BroadcastHashJoin, got $joins:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("full-depth PSL: committed-resource semantics are unchanged (both paths agree)") {
    // the FULL committed resource (round 14) must key the planted-universe
    // shapes exactly as the compact round-12 snapshot did — the broadcast
    // path reads the resource, the inline path the compact literals
    val urls = Seq("https://bbc.co.uk/p", "https://x.act.edu.au/p",
      "https://foo.brand.ck/p", "https://www.ck/p", "https://a.b.example.com/p")
      .toDF("url")
    val broadcastD = graft.functions.UrlFunctions.withRegistrableDomain(
        urls, col("url"), "d")
      .select("url", "d").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val inlineD = urls.select(col("url"),
        graft.functions.UrlFunctions.registrableDomainPsl(col("url")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = Map(
      "https://bbc.co.uk/p" -> "bbc.co.uk",
      "https://x.act.edu.au/p" -> "x.act.edu.au",
      "https://foo.brand.ck/p" -> "foo.brand.ck",
      "https://www.ck/p" -> "www.ck",
      "https://a.b.example.com/p" -> "example.com")
    assert(broadcastD == want)
    assert(inlineD == want)
  }
}
