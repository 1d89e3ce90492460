package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions
import graft.operators.{FuzzyJoin, Graph, Sampling}

/** Round-10 hygiene wave: the PSL snapshot's 3-label / wildcard /
  * exception tiers (both the Column and the broadcast-join form),
  * FuzzyJoin's scale-stable length-bucket blocking, and the new loud-fail
  * guards (hitsInt iterations, topKPerKey rank-column collision).
  */
class Wave10Spec extends SparkSpecBase {

  import spark.implicits._

  // ---- PSL tiers -----------------------------------------------------------

  test("PSL 3-label, wildcard and exception tiers: both forms agree on the pinned cases") {
    val cases = Seq(
      // 3-label tier: registration at label 4
      ("https://smith.act.edu.au/x", "smith.act.edu.au"),
      ("https://www.deep.sub.smith.act.edu.au/x", "smith.act.edu.au"),
      ("https://lincoln.k12.ma.us/x", "lincoln.k12.ma.us"),
      ("https://portal.lincoln.k12.ma.us/x", "lincoln.k12.ma.us"),
      // bare 3-label suffix host: documented fallback to the host itself
      ("https://act.edu.au/x", "act.edu.au"),
      // a 3-label host under edu.au whose state label is NOT in the
      // snapshot still promotes via the 2-label edu.au rule
      ("https://other.edu.au/x", "other.edu.au"),
      // wildcard *.ck: every 2-label name under ck is a public suffix
      ("https://shop.biz.ck/x", "shop.biz.ck"),
      ("https://a.b.shop.biz.ck/x", "shop.biz.ck"),
      // exception !www.ck: www.ck IS registrable despite the wildcard
      ("https://www.ck/x", "www.ck"),
      ("https://sub.www.ck/x", "www.ck"),
      // wildcard TLD with a bare 2-label host: fallback keeps it whole
      ("https://biz.ck/x", "biz.ck"),
      // controls: 2-label tier and bare TLD unchanged by the new tiers
      ("https://www.bbc.co.uk/news", "bbc.co.uk"),
      ("https://sub.example.com/x", "example.com")
    )
    val df = cases.map(_._1).toDF("url")
    val colForm = df.select(col("url"), UrlFunctions.registrableDomainPsl(col("url")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val joinForm = UrlFunctions.withRegistrableDomain(df, col("url"), "d")
      .select(col("url"), col("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (url, want) =>
      assert(colForm(url) == want, s"Column form: $url -> ${colForm(url)}, want $want")
      assert(joinForm(url) == want, s"join form: $url -> ${joinForm(url)}, want $want")
    }
  }

  test("PSL snapshot tiers are well-formed (label counts, no overlap with exceptions)") {
    import graft.functions.PublicSuffixes._
    assert(suffixes2.forall(_.count(_ == '.') == 1))
    assert(suffixes3.forall(_.count(_ == '.') == 2))
    assert(wildcardTlds.forall(t => !t.contains('.')))
    // an exception names a 2-label registration under a wildcard TLD
    assert(exceptions.forall(e =>
      e.count(_ == '.') == 1 && wildcardTlds.contains(e.split("\\.").last)))
    assert(suffixes2.distinct.size == suffixes2.size)
    assert(suffixes3.distinct.size == suffixes3.size)
  }

  // ---- FuzzyJoin length-bucket blocking ------------------------------------

  test("fuzzy join length bucket: same-bucket near-pairs kept, cross-bucket blocked, None restores") {
    val df = Seq(
      (1L, "abcdefg", "k", 1),     // len 7 -> bucket 0
      (2L, "abcdefgX", "k", 1),    // len 8 -> bucket 1; dist 1 from id 1 but cross-bucket
      (3L, "abcdefh", "k", 1)      // len 7 -> bucket 0; dist 1 from id 1
    ).toDF("id", "name", "noun", "sz")
    val bucketed = FuzzyJoin.blockedLevenshtein(df, "id", "name",
      Seq("noun", "sz"), maxDist = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(bucketed == Set((1L, 3L)),
      s"bucket width 8 must split len 7 vs len 8: $bucketed")
    val exhaustive = FuzzyJoin.blockedLevenshtein(df, "id", "name",
      Seq("noun", "sz"), maxDist = 3, lengthBucketWidth = None)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(exhaustive == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("d17 board entry still produces within-threshold pairs under the bucketed key") {
    val rows = SparkEntry.queries("d17_fuzzy_join")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Long]("dist") <= 3L)
      // the bucket key is part of the join: surviving pairs' name lengths
      // agree to the bucket
      assert(r.getAs[String]("name_a").length / 8 == r.getAs[String]("name_b").length / 8)
    }
  }

  // ---- t27 unicode scrub / d19 normalized dedup -----------------------------

  test("unicodeScrub: pinned transformations, idempotent, clean text untouched") {
    import graft.functions.TextFunctions
    val cases = Seq(
      ("abc", "abc"),                       // control chars dropped
      ("a​b‌c‍d﻿e­f", "abcdef"), // zero-width + soft hyphen
      ("a b", "a b"),                              // NBSP -> space
      ("  a \t b \r\n c  ", "a b c"),                   // collapse + trim
      ("already clean", "already clean"),
      ("﻿​", "")                        // nothing but invisibles
    )
    val got = cases.map(_._1).toDF("t")
      .select(col("t"), TextFunctions.unicodeScrub(col("t")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"'$in'") }
    // idempotence: scrubbing a scrubbed string is a no-op
    val twice = cases.map(_._2).toDF("t")
      .select(col("t"), TextFunctions.unicodeScrub(col("t")).as("s")).collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("t27 board entry: counts match the planted classes at sf0.001") {
    val rows = SparkEntry.queries("t27_unicode_scrub")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, scrubbed, nc, nz, changed) = (r.getLong(0), r.getString(1),
        r.getInt(2), r.getInt(3), r.getBoolean(4))
      (id % 5).toInt match {
        case 0 => assert(nz == 2 && nc == 0 && changed, s"doc $id")
        case 1 => assert(nc == 2 && nz == 0 && changed, s"doc $id")
        case 2 => assert(nc == 0 && nz == 0 && changed, s"doc $id") // NBSP+run: ws only
        case 3 => assert(nz == 1 && nc == 0 && changed, s"doc $id") // BOM is zero-width class
        case _ => assert(nc == 0 && nz == 0 && !changed, s"doc $id")
      }
      assert(!scrubbed.exists(c => c < ' ' || c == ' ' || c == '​'))
    }
  }

  test("normalizedDedupKey unifies case/punct/invisible/whitespace variants only") {
    import graft.functions.TextFunctions
    val df = Seq(
      "Hello, World!", "hello world", "HELLO WORLD", "hello  world​",
      "different text"
    ).toDF("t").select(col("t"), TextFunctions.normalizedDedupKey(col("t")).as("k"))
    val ks = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ks("Hello, World!") == ks("hello world"))
    assert(ks("hello world") == ks("HELLO WORLD"))
    assert(ks("hello world") == ks("hello  world​"))
    assert(ks("different text") != ks("hello world"))
    assert(ks.values.forall(_.matches("[0-9a-f]{32}"))) // md5 hex
  }

  test("d19 board entry: exactly the non-keeper variants per planted group at sf0.001") {
    val rows = SparkEntry.queries("d19_normalized_dedup")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val total = graft.core.Tables(spark, Sf0001).documents.count()
    // complete groups of 4 yield 3 dup rows each; keeper is the min id
    rows.foreach { r =>
      val (id, keeper) = (r.getLong(0), r.getLong(1))
      assert(keeper == (id / 4) * 4 && id != keeper, s"$id -> $keeper")
    }
    val completeGroups = total / 4
    assert(rows.length >= (completeGroups * 3 - 3).toInt && rows.length <= (completeGroups * 3).toInt)
  }

  // ---- loud-fail guards ----------------------------------------------------

  test("hitsInt rejects iterations < 1 instead of returning a frame over freed blocks") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.hitsInt(e, "src", "dst", iterations = 0)
    }
  }

  test("topKPerKey fails loudly on a rank-column collision") {
    val df = Seq((1L, "a", 5L)).toDF("k", "v", "rnk")
    intercept[IllegalArgumentException] {
      Sampling.topKPerKey(df, col("k"), 1, Seq(col("v")))
    }
  }
}
