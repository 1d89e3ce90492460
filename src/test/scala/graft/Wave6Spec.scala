package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Projection, Retrieval}

/** Round-6 retrieval wave: BM25 lexical search, reciprocal-rank fusion,
  * paragraph-granularity dedup, JL random projection. */
class Wave6Spec extends SparkSpecBase {
  import spark.implicits._

  // ---- s8 BM25 --------------------------------------------------------

  test("bm25 ranks the rare-term match above the common-term match and excludes self") {
    // "zebra" appears in exactly one corpus doc; "common" in all of them.
    // The query mentions both, so idf must rank the zebra doc first.
    val docs = Seq(
      (0L, "zebra common query words"),
      (1L, "zebra one of a kind document"),
      (2L, "common words everywhere always"),
      (3L, "common words in this one too"),
      (4L, "common filler text words")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, docs.filter($"doc_id" === 0), "doc_id", "text", k = 10)
      .orderBy("rank").collect()
    assert(out.forall(_.getLong(0) == 0L))
    assert(!out.exists(_.getLong(1) == 0L), "self-match must be excluded")
    assert(out.head.getLong(1) == 1L, s"doc 1 (unique 'zebra' hit) must rank first, got ${out.head}")
    // docs 2-4 match only the ubiquitous 'common'/'words' terms -> lower
    assert(out.map(_.getLong(1)).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("bm25 tf saturation: higher tf wins at equal dl, but sublinearly") {
    val docs = Seq(
      (0L, "target query filler words here"),
      (1L, "target target target junk1 junk2"),
      (2L, "target junk3 junk4 junk5 junk6"),
      (3L, "unrelated padding text entirely now")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, docs.filter($"doc_id" === 0), "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(1L) > out(2L), "tf=3 must outscore tf=1 for the same term and dl")
    // saturation: tripling tf must NOT triple the term's score
    assert(out(1L) < 3 * out(2L) * 1.0 + 1e-9)
    assert(!out.contains(3L), "doc sharing no query term is unscored")
  }

  // ---- s9 RRF ---------------------------------------------------------

  test("rrf fusion math is exact and both-lists beats one-list at equal ranks") {
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val sem = Seq((0L, 10L, 2), (0L, 12L, 1)).toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.rrfFuse(lex, sem, k = 10).collect()
      .map(r => r.getLong(1) -> (r.getInt(2), r.getDouble(3))).toMap
    // doc 10: 1/61 + 1/62 ; doc 11: 1/62 ; doc 12: 1/61 — exact doubles
    assert(out(10L)._2 == 1.0 / 61 + 1.0 / 62)
    assert(out(11L)._2 == 1.0 / 62)
    assert(out(12L)._2 == 1.0 / 61)
    assert(out(10L)._1 == 1, "doc in both lists must fuse to rank 1")
    assert(out(12L)._1 == 2 && out(11L)._1 == 3)
  }

  // ---- d15 paragraph dedup -------------------------------------------

  test("paragraph dedup drops the repeated chunk from the later doc only, conserves tokens") {
    val para = (1 to 16).map(i => s"p$i").mkString(" ") // one full 16-token chunk
    val docs = Seq(
      (1L, para + " " + (1 to 16).map(i => s"a$i").mkString(" ")),
      (2L, para + " " + (1 to 16).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 10).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedupStats(docs, "doc_id", "text", chunkLen = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (2L, 0L, 32L, 0L), "keeper doc keeps both chunks")
    assert(out(2L) == (2L, 1L, 16L, 16L), "later doc drops the shared paragraph only")
    assert(out(3L) == (1L, 0L, 10L, 0L))
    // conservation: kept + dropped tokens == doc token count, per doc
    assert(out.values.forall { case (_, _, kept, dropped) => kept + dropped > 0 })
  }

  test("paragraph dedup never drops chunks below the min-token floor") {
    // the 2-token tail chunk is identical across docs but under the floor
    val body1 = (1 to 16).map(i => s"x$i").mkString(" ")
    val body2 = (1 to 16).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, body1 + " shared tail"),
      (2L, body2 + " shared tail")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedupStats(docs, "doc_id", "text", chunkLen = 16, minChunkTokens = 4)
      .agg(sum("dropped_chunks")).collect().head.getLong(0)
    assert(out == 0L, "2-token duplicate tail must be kept (below minChunkTokens)")
  }

  // ---- s10 random projection -----------------------------------------

  test("sign matrix is deterministic, ±1, and balanced enough") {
    val a: Array[Double] = Projection.signMatrix(42, 64, 16).flatten
    val b: Array[Double] = Projection.signMatrix(42, 64, 16).flatten
    assert(a.sameElements(b))
    assert(a.forall(v => v == 1.0 || v == -1.0))
    val imbalance = math.abs(a.sum) / a.length
    assert(imbalance < 0.1, s"Rademacher matrix grossly unbalanced: $imbalance")
  }

  test("random projection is map-only (no exchange) and preserves pairwise geometry") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet").limit(100).cache()
    val proj = Projection.randomProject(emb, "vec_id", "embedding", dim = 64, outDim = 16)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must be a pure map:\n$plan")

    // JL check: relative pairwise squared-distance distortion is bounded
    // in aggregate. Reassemble vectors driver-side for a 30-row sample.
    val orig = emb.limit(30).collect().map { r =>
      r.getLong(r.fieldIndex("vec_id")) -> r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
    }
    val pr = proj.filter($"vec_id".isin(orig.map(_._1): _*))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    def d2(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
    val ratios = for {
      i <- orig.indices; j <- orig.indices if i < j
      do2 = d2(orig(i)._2, orig(j)._2) if do2 > 1e-9
    } yield d2(pr(orig(i)._1).toArray, pr(orig(j)._1).toArray) / do2
    val mean = ratios.sum / ratios.size
    // 1/sqrt(outDim)-scaled Rademacher projection preserves squared
    // distances in expectation (E[ratio] = 1); JL gives concentration
    assert(mean > 0.7 && mean < 1.4, s"mean distortion off: $mean")
    val within = ratios.count(r => r > 0.3 && r < 3.0).toDouble / ratios.size
    assert(within > 0.9, s"too many pairs outside the JL band: ${1 - within}")
  }
}
