package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Packing, Sampling, Similarity}
import graft.streaming.StreamingJobs

/** Round-3 wave: portable (SQL-replayable) sketch twins, sequence packing,
  * stream-stream join, IVF-PQ. */
class Wave3Spec extends SparkSpecBase {
  import spark.implicits._

  // ---- non-distinct shingles ------------------------------------------

  test("word_shingles_all keeps every occurrence; distinct variant dedups") {
    val df = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val all = df.select(graft.plans.WordShingles.word_shingles_all(col("text"), 2).as("g"))
      .head().getSeq[String](0)
    assert(all == Seq("a b", "b a", "a b", "b a"))
    val dist = df.select(graft.plans.WordShingles.word_shingles(col("text"), 2).as("g"))
      .head().getSeq[String](0)
    assert(dist == Seq("a b", "b a"))
  }

  test("word_shingles_all matches the HOF formulation on real docs") {
    val docs = Tables(spark, Sf0001).documents.limit(50)
    val native = docs.select(col("doc_id"),
      graft.plans.WordShingles.word_shingles_all(col("text"), 3).as("g"))
    val hof = docs.select(col("doc_id"),
      transform(
        sequence(lit(0), greatest(size(split(col("text"), " ", -1)) - 3, lit(0))),
        i => concat_ws(" ", slice(split(col("text"), " ", -1), i + 1, lit(3)))).as("g"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  // ---- portable minhash ------------------------------------------------

  test("portable md5-minhash finds the near-dup pair and rejects distinct docs") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 57).map(i => s"tok$i").mkString(" ") + " zzz aaa bbb"
    val distinctDoc = (100 to 160).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, distinctDoc)).toDF("doc_id", "text")
    val pairs = Dedup.minHashLshPairsPortable(docs, "doc_id", "text", n = 3, k = 32, bands = 8, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)), s"near-dup pair not found: $pairs")
    assert(pairs((1L, 2L)) > 0.5)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("portable minhash estimate is partitioning-independent") {
    val docs = Tables(spark, Sf0001).documents
    val a = Dedup.minHashLshPairsPortable(docs, "doc_id", "text").collect().toSet
    val b = Dedup.minHashLshPairsPortable(docs.repartition(7), "doc_id", "text").collect().toSet
    assert(a == b)
  }

  // ---- portable simhash -------------------------------------------------

  test("portable simhash: identical docs equal, near-dups within small hamming, distinct docs far") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val tweaked = base.replace("w40", "w40x")
    val unrelated = (200 to 280).map(i => s"q$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, tweaked), (4L, unrelated)).toDF("doc_id", "text")
    val h = Dedup.simHashPortable(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 12)
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) >= 15, "unrelated docs must be far apart")
    assert(h.values.forall(v => v >= 0 && v < (1L << 60)), "60-bit range")
  }

  // ---- portable hash split --------------------------------------------

  test("portable hash split: full coverage, stable membership, ~fractions") {
    val docs = Tables(spark, Sf0001).documents
    val split = Sampling.hashSplitPortable(docs, "doc_id", Seq("train" -> 0.8, "test" -> 0.2))
    assert(split.count() == docs.count(), "fractions summing to 1 must cover every row")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val frac = counts("train").toDouble / (counts("train") + counts("test"))
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    // membership is a pure function of the key: same rows under repartition
    val again = Sampling.hashSplitPortable(docs.repartition(13), "doc_id",
      Seq("train" -> 0.8, "test" -> 0.2))
    assert(split.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).isEmpty)
  }

  // ---- sequence packing -------------------------------------------------

  test("offset packing: bins fill to budget, overrun bounded by one doc, groups independent") {
    val docs = Seq(
      // group g1: toks 300, 300, 300, 300 -> offsets 0,300,600,900 -> bins 0,0,1,1
      ("g1", 1L, 300), ("g1", 2L, 300), ("g1", 3L, 300), ("g1", 4L, 300),
      // group g2 restarts at offset 0: 600 -> bin 0; next offset 600 -> bin 1
      ("g2", 1L, 600), ("g2", 2L, 100)
    ).toDF("grp", "doc_id", "toks")
    val packed = Packing.packSequences(docs, "grp", "doc_id", "toks", budget = 512L)
      .select("grp", "doc_id", "seq_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(packed(("g1", 1L)) == 0 && packed(("g1", 2L)) == 0)
    assert(packed(("g1", 3L)) == 1 && packed(("g1", 4L)) == 1)
    assert(packed(("g2", 1L)) == 0 && packed(("g2", 2L)) == 1)

    val summary = Packing.packedSummary(docs, "grp", "doc_id", "toks", budget = 512L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(summary(("g1", 0L)) == ((2L, 600L))) // fills past budget by < 1 doc
    assert(summary(("g2", 0L)) == ((1L, 600L)))
  }

  test("packing conserves docs and tokens at corpus scale") {
    val docs = Tables(spark, Sf0001).documents.select(
      col("source"), col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("toks"))
    val summary = Packing.packedSummary(docs, "source", "doc_id", "toks", budget = 512L)
    val (nd, nt) = summary.agg(sum("n_docs"), sum("seq_tokens")).as[(Long, Long)].head()
    val (ed, et) = docs.agg(count(lit(1)), sum("toks")).as[(Long, Long)].head()
    assert(nd == ed && nt == et)
    // every full (non-terminal) sequence must have reached the budget:
    // a doc starts bin b only because bin b-1's span was already >= budget
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val nonTerminal = summary
      .withColumn("mx", max("seq_id").over(w)).filter(col("seq_id") < col("mx"))
    assert(nonTerminal.filter(col("seq_tokens") < 512 - 99).count() == 0,
      "non-terminal bins must fill to within one doc (max doc 99 toks) of the budget")
  }

  // ---- IVF-PQ -----------------------------------------------------------

  test("IVF-PQ recalls brute-force neighbors; full-probe + heavy refine nears exhaustive") {
    val e = Tables(spark, Sf0001).embeddings
    val q = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // production shape: nprobe/nlist cell pruning + ADC shortlist + rerank
    val ivfpq = Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
      k = 5, dim = 64, nlist = 16, nprobe = 8, m = 8, ksub = 32, refine = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivfpq).size.toDouble / brute.size
    info(s"IVF-PQ recall (nprobe=8/16, refine=10): $recall")
    // bound set with margin: IVF probing at nprobe=nlist/2 caps recall; the
    // PQ shortlist + exact rerank recovers most of what the cells contain
    assert(recall >= 0.3, s"recall=$recall")

    // probing every cell removes the IVF loss; a shortlist wider than the
    // corpus removes the ADC loss -> must reproduce brute force exactly
    val full = Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
      k = 5, dim = 64, nlist = 4, nprobe = 4, m = 8, ksub = 32, refine = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute, "full-probe IVF-PQ with exhaustive refine must equal brute force")
  }

  test("IVF-PQ is partitioning-independent (deterministic training)") {
    val e = Tables(spark, Sf0001).embeddings
    val q = e.filter(col("vec_id") < 5)
    val a = Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
      k = 5, dim = 64, nlist = 8, nprobe = 4, m = 4, ksub = 16).collect().toSet
    val b = Similarity.ivfPqTopK(e.repartition(7), q, "vec_id", "embedding",
      k = 5, dim = 64, nlist = 8, nprobe = 4, m = 4, ksub = 16).collect().toSet
    assert(a == b)
  }

  // ---- stream-stream join ------------------------------------------------

  test("stream-stream attribution join equals the batch join") {
    val sfDir = Sf0001
    val streamed = StreamingJobs.purchaseClickAttribution(spark, sfDir)
      .select("purchase_id", "click_id")
    val ev = Tables(spark, sfDir).events
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("ts").as("c_ts"))
    val batch = p.join(c, col("user_id") === col("cu") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") && col("c_ts") <= col("p_ts"))
      .select("purchase_id", "click_id")
    assert(streamed.count() > 0, "join must produce matches at sf0.001")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the state-store partition scoping must restore the session conf
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "8")
  }

  // ---- unicode normalization ----------------------------------------------

  test("normalize_text: NFKC folds ligatures/fullwidth, NFC composes accents, ws collapses") {
    val rows = Seq(
      (1L, "Café STUFF"),       // e + combining acute -> é (NFC/NFKC compose)
      (2L, "ﬁne"),                    // ﬁ ligature -> "fi" under NFKC only
      (3L, "ＦＵＬＬ１２３"),               // fullwidth -> ASCII under NFKC only
      (4L, "  a \t\n b   c  ")             // whitespace runs -> single spaces, trimmed
    ).toDF("id", "t")
    val nfkc = rows.select(col("id"),
      graft.functions.TextFunctions.normalizeText(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfkc(1L) == "café stuff")
    assert(nfkc(2L) == "fine")
    assert(nfkc(3L) == "full123")
    assert(nfkc(4L) == "a b c")
    // NFC must NOT fold compatibility chars
    val nfc = rows.select(col("id"),
      graft.functions.TextFunctions.normalizeText(col("t"), form = "NFC").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfc(1L) == "café stuff")
    assert(nfc(2L) == "ﬁne")
    // and the java.text.Normalizer ground truth agrees on NFKC
    assert(nfkc(2L) == java.text.Normalizer
      .normalize("ﬁne", java.text.Normalizer.Form.NFKC).toLowerCase(java.util.Locale.ROOT))
  }

  test("normalize_text SQL registration equals the Column API") {
    val docs = Tables(spark, Sf0001).documents.limit(20)
    docs.createOrReplaceTempView("w3_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, normalize_text(text, 'NFKC', 'true', 'true') AS n FROM w3_docs")
    val viaCol = docs.select(col("doc_id"),
      graft.functions.TextFunctions.normalizeText(col("text")).as("n"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  // ---- weighted sampling ----------------------------------------------------

  test("weighted keep: rate tracks weights, membership stable under repartition") {
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("wt", when(col("id") % 2 === 0, 0.9).otherwise(0.1))
    val kept = Sampling.weightedKeepPortable(df, "id", col("wt"))
    val byW = kept.groupBy("wt").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // 2000 rows per weight class; binomial 3-sigma bands
    assert(byW(0.9) > 1700 && byW(0.9) < 1900, s"p=0.9 kept ${byW(0.9)}")
    assert(byW(0.1) > 140 && byW(0.1) < 260, s"p=0.1 kept ${byW(0.1)}")
    val again = Sampling.weightedKeepPortable(df.repartition(13), "id", col("wt"))
    assert(kept.select("id").exceptAll(again.select("id")).isEmpty)
    // weight 0 never keeps; weight 1 always keeps
    val edge = Sampling.weightedKeepPortable(
      spark.range(0, 500).toDF("id").withColumn("wt", when(col("id") < 250, 0.0).otherwise(1.0)),
      "id", col("wt"))
    assert(edge.count() == 250 && edge.filter(col("id") < 250).count() == 0)
  }

  // ---- repetition signals -------------------------------------------------

  test("repetition fractions: known 2-gram multiplicities") {
    // "x y x y x": 2-gram occurrences = [x y, y x, x y, y x] -> top2=2/4, dup=4/4
    val docs = Seq((1L, "x y x y x"), (2L, "a b c d")).toDF("doc_id", "text")
    val g2 = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.wordShinglesAll(col("text"), 2)).as("g"))
    val out = g2.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), max("c").as("mx"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((4L, 2L, 4L)))
    assert(out(2L) == ((3L, 1L, 0L)))
  }

  // ---- ingest-time decontamination ---------------------------------------

  test("streaming decontamination equals the batch screen (stream-static broadcast join)") {
    import graft.plans.VectorExpressions.{vector_dot, vector_normalize}
    val streamed = StreamingJobs.streamingDecontamination(spark, Sf0001)
    val e = Tables(spark, Sf0001).embeddings
      .select(col("vec_id"), vector_normalize(col("embedding")).as("nv"))
    val bench = e.filter(col("vec_id") % 23 === 0)
      .select(col("vec_id").as("bench_id"), col("nv").as("bv"))
    val batch = e.filter(col("vec_id") % 23 =!= 0)
      .join(bench, vector_dot(col("nv"), col("bv")) >= 0.4)
      .select("vec_id", "bench_id")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0, "screen is signal-free at sf0.001")
  }

  // ---- online SemDeDup ---------------------------------------------------

  test("streaming semantic dedup equals the batch operator on the full corpus") {
    val streamed = StreamingJobs.streamingSemanticDedup(spark, Sf0001, k = 16)
    val batch = Similarity.semanticDedup(Tables(spark, Sf0001).embeddings,
      "vec_id", "embedding", threshold = 0.4, dim = 64, k = 16)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming semantic dedup state carries across microbatches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // two batches, same cell: batch-2 duplicate of a batch-1 vector must be
    // flagged even though they never share a microbatch
    val ms = MemoryStream[(Long, Int, Seq[Double])](spark)
    def fn(cell: Int, rows: Iterator[(Long, Int, Seq[Double])],
           state: GroupState[Seq[(Long, Seq[Double])]]): Iterator[(Long, Int, Boolean)] = {
      def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
      val sorted = rows.toArray.sortBy(_._1)
      var seen = state.getOption.getOrElse(Seq.empty).toList
      val out = sorted.map { case (id, _, nv) =>
        val dup = seen.exists { case (_, sv) => dot(sv, nv) >= 0.9 }
        seen = (id, nv) :: seen
        (id, cell, dup)
      }
      state.update(seen)
      out.iterator
    }
    val flagged = ms.toDS().groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
      .toDF("vec_id", "cluster", "is_dup")
    val q = flagged.writeStream.outputMode("append").format("memory")
      .queryName("semdedup_xbatch").start()
    try {
      ms.addData((1L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(0.0, 1.0)))
      q.processAllAvailable()
      ms.addData((3L, 0, Seq(1.0, 0.0)), (4L, 1, Seq(0.5, 0.5)))
      q.processAllAvailable()
      val flags = spark.table("semdedup_xbatch").collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(flags == Map(1L -> false, 2L -> false, 3L -> true, 4L -> false))
    } finally q.stop()
  }

  // ---- ingest-time exact dedup (st11) ------------------------------------

  test("streaming exact dedup equals the batch fingerprint dedup on one microbatch") {
    val streamed = StreamingJobs.streamingExactDedup(spark, Sf0001)
    val batch = Tables(spark, Sf0001).documents
      .groupBy(md5(lower(trim(col("text")))).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming exact dedup keeper is first-seen across microbatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ms = MemoryStream[(String, Long)](spark)
    def fn(fp: String, rows: Iterator[(String, Long)],
           state: GroupState[(Long, Long)]): Iterator[(String, Long, Long)] = {
      val ids = rows.map(_._2).toArray.sorted
      val (keeper, total) = state.getOption match {
        case Some((keep, cnt)) => (keep, cnt + ids.length)
        case None              => (ids.head, ids.length.toLong)
      }
      state.update((keeper, total))
      Iterator.single((fp, keeper, total))
    }
    val deduped = ms.toDS().groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
      .toDF("fp", "keep_id", "dup_cnt")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("exactdedup_xbatch").start()
    try {
      // batch 1: ids 7 and 4 share a fingerprint -> keeper = 4 (min in batch)
      ms.addData(("A", 7L), ("A", 4L), ("B", 9L))
      q.processAllAvailable()
      // batch 2: id 1 arrives for A — LOWER than the admitted keeper, but
      // ingest already happened: keeper stays 4 (first-seen), count grows
      ms.addData(("A", 1L))
      q.processAllAvailable()
      val rows = spark.table("exactdedup_xbatch").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(("A", 4L, 2L), ("B", 9L, 1L), ("A", 4L, 3L)))
    } finally q.stop()
  }

  // ---- Bloom-filter contamination screen (d7c) ---------------------------

  test("bloom screen never misses an exact hit and over-flags within fpp bounds") {
    val docs = Tables(spark, Sf0001).documents
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val exact = Dedup.contaminationScores(train, bench, "doc_id", "text", n = 3)
      .select(col("doc_id"), col("n_sh"), col("hits").as("exact_hits"))
    val bloom = Dedup.contaminationScoresBloom(train, bench, "doc_id", "text", n = 3, fpp = 0.01)
      .select(col("doc_id"), col("hits").as("bloom_hits"))
    val j = exact.join(bloom, "doc_id").cache()
    try {
      // one-sided error: bloom hits are a superset of exact hits per doc
      assert(j.filter(col("bloom_hits") < col("exact_hits")).isEmpty,
        "bloom screen missed an exact contamination hit (false negative)")
      // over-flag rate across all probed shingles stays near the configured fpp
      val agg = j.agg(
        sum(col("bloom_hits") - col("exact_hits")).as("fp"),
        sum(col("n_sh") - col("exact_hits")).as("clean")).head()
      val fpr = agg.getLong(0).toDouble / math.max(agg.getLong(1), 1L)
      assert(fpr <= 0.05, s"false-positive rate $fpr far above configured fpp=0.01")
    } finally j.unpersist()
  }

  // ---- bigram-LM typicality (t16) ------------------------------------------

  test("bigram typicality scores deterministic continuations at 0, branching below") {
    // docs 1/2: every bigram's first token has ONE continuation -> p=1,
    // avg log p = 0. doc 3: "x" branches to "y" and "z" -> p=0.5 each
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b a b"), (3L, "x y x z")
    ).toDF("doc_id", "text")
    val r = graft.operators.LanguageModel.bigramTypicality(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) == 0.0 && r(2L) == 0.0)
    // avg_logp is rounded to 6 dp in the operator output
    assert(math.abs(r(3L) - math.log(0.5) * 2 / 3) < 1e-6)
  }

  // ---- approx curriculum sharding (x7b) ------------------------------------

  test("approx-percentile shards deviate from exact quartiles within sketch tolerance") {
    val approx = graft.queries.AdvancedQueries.queries("x7b_quantile_shards_approx")(spark, Sf0001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = Tables(spark, Sf0001).documents.count()
    assert(approx.keySet == Set(0, 1, 2, 3))
    assert(approx.values.sum == n)
    // at accuracy=10000 the rank error is ~n/10000 << 5% of a quartile
    approx.values.foreach { c =>
      assert(math.abs(c - n / 4.0) <= math.max(0.05 * n / 4.0, 2.0),
        s"shard sizes $approx deviate from quartiles of $n")
    }
  }

  // ---- document chunking (t15) -------------------------------------------

  test("chunking tiles the doc: 16-token overlap, full coverage, no contained chunks") {
    val words = (1 to 120).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" ")), (2L, (1 to 10).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = graft.queries.TextQueries.queries("t15_chunking")(spark, Sf0001) // shape only
    val q = docs.select(col("doc_id"), split(col("text"), " ", -1).as("w"))
      .select(col("doc_id"),
        posexplode(sequence(lit(0), greatest(size(col("w")) - 17, lit(0)), lit(48)))
          .as(Seq("chunk_idx", "start")), col("w"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("w"), col("start") + 1, lit(64)).as("ct"))
      .collect().groupBy(_.getLong(0))
    val d1 = q(1L).sortBy(_.getInt(1)).map(_.getSeq[String](2))
    assert(d1.map(_.length).toSeq == Seq(64, 64, 24)) // starts 0, 48, 96
    assert(d1(0).takeRight(16) == d1(1).take(16), "adjacent chunks must share the overlap")
    // stitching chunks (dropping each successor's overlap) reconstructs the doc
    val stitched = d1.head ++ d1.tail.flatMap(_.drop(16))
    assert(stitched.toSeq == words)
    assert(q(2L).map(_.getSeq[String](2)).toSeq == Seq((1 to 10).map(i => s"v$i")))
    assert(chunks.columns.toSeq ==
      Seq("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text"))
  }

  // ---- compression-ratio quality signal (t14) ----------------------------

  test("deflate_size ranks repetitive text below prose below noise") {
    val rep = "spam spam spam " * 50                      // highly repetitive
    val prose = Tables(spark, Sf0001).documents
      .orderBy("doc_id").select("text").as[String].head()
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(750)((rnd.nextInt(94) + 33).toChar).mkString
    val df = Seq((1L, rep), (2L, noise)).toDF("id", "t")
      .select(col("id"), graft.plans.DeflateSize.deflate_size(col("t")).as("c"),
        length(col("t")).as("n"))
    val m = df.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val (repC, repN) = m(1L); val (noiseC, noiseN) = m(2L)
    assert(repC.toDouble / repN < 0.05, s"repetitive text should crush: $repC/$repN")
    assert(noiseC.toDouble / noiseN > 0.8, s"noise should not compress: $noiseC/$noiseN")
    val proseC = graft.plans.DeflateSize.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(prose), 6)
    val proseRatio = proseC.toDouble / prose.length
    assert(proseRatio > repC.toDouble / repN && proseRatio < noiseC.toDouble / noiseN)
  }

  test("deflate_size matches a pinned cross-engine zlib ground-truth vector") {
    // Expected sizes computed INDEPENDENTLY with CPython's zlib
    // (compressobj(6, DEFLATED, -15) — raw deflate, level 6, nowrap: the
    // exact parameters DeflateSize pins). Both stacks wrap canonical zlib,
    // so these constants are a true cross-engine oracle for the rows-only
    // t14 entry: any drift in level, wrap flag, UTF-8 handling, or a
    // non-zlib Deflater would break them.
    val vector = Seq(
      ("a", 1, 3),
      ("ab" * 100, 200, 7),
      ("The quick brown fox jumps over the lazy dog while the storm surge " +
        "floods the coastal county road.", 97, 80),
      ("name=value;" * 40, 440, 18),
      ("q8Zr1xV7pL3mNw9K2jD5hF0sTgYbUcEiOaXe4RtM6", 41, 43),
      ("naïve café — résumé über straße 你好世界 🌊", 57, 62))
    val got = vector.zipWithIndex.map { case ((t, _, _), i) => (i.toLong, t) }
      .toDF("i", "t")
      .select(col("i"), graft.plans.DeflateSize.deflate_size(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vector.zipWithIndex.foreach { case ((t, utf8Len, expected), i) =>
      assert(t.getBytes("UTF-8").length == utf8Len, s"case $i utf8 length drifted")
      assert(got(i.toLong) == expected,
        s"case $i: deflate_size=${got(i.toLong)}, python zlib ground truth=$expected")
    }
  }

  test("deflate_size is deterministic, partitioning-independent, and SQL-registered") {
    val docs = Tables(spark, Sf0001).documents
    val a = docs.select(col("doc_id"), graft.plans.DeflateSize.deflate_size(col("text")).as("c"))
    val b = docs.repartition(7)
      .select(col("doc_id"), graft.plans.DeflateSize.deflate_size(col("text")).as("c"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    docs.createOrReplaceTempView("t14docs")
    val viaSql = spark.sql("SELECT doc_id, deflate_size(text) AS c FROM t14docs")
    assert(a.exceptAll(viaSql).isEmpty && viaSql.exceptAll(a).isEmpty)
  }

  // ---- learned BPE -------------------------------------------------------

  test("BPE trainer reproduces the classic Sennrich merge sequence") {
    // low×5, lower×2, newest×6, widest×3 — the canonical worked example:
    // pair freqs round 1 peak at 9 for (e,s),(s,t),(t,</w>); lexicographic
    // tie-break picks (e,s), then merges cascade est -> est</w> -> lo -> low
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = graft.operators.Bpe.learnFromHistogram(hist, numMerges = 5)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("BPE encode applies merges greedily by rank; unseen words fall back to chars") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    val df = Seq((1L, "lowest low zzz")).toDF("doc_id", "text")
    val pieces = df.select(graft.operators.Bpe.encode(col("text"), merges).as("p"))
      .head().getSeq[String](0)
    // lowest -> low + est</w>; low -> low + </w> ((l,o) then (lo,w) apply,
    // (low,</w>) was never learned); zzz has no learned merges -> chars + </w>
    assert(pieces == Seq("low", "est</w>", "low", "</w>", "z", "z", "z", "</w>"))
  }

  test("learned merges are partitioning-independent and compress the real corpus") {
    val docs = Tables(spark, Sf0001).documents
    val a = graft.operators.Bpe.learnMerges(docs, "text", numMerges = 50, vocabWords = 2000)
    val b = graft.operators.Bpe.learnMerges(docs.repartition(7), "text", numMerges = 50, vocabWords = 2000)
    assert(a == b, "merge table must be a pure function of the corpus")
    val enc = docs.select(
      size(graft.operators.Bpe.encode(col("text"), a)).as("learned"),
      size(graft.operators.Bpe.encode(col("text"), Seq.empty)).as("charLevel"))
    val row = enc.agg(sum("learned"), sum("charLevel")).head()
    val (learned, charLevel) = (row.getLong(0), row.getLong(1))
    // 50 learned merges must compress well past the 0-merge char baseline
    assert(learned < (charLevel * 7) / 10,
      s"weak compression: $learned pieces vs char-level $charLevel")
  }

  // ---- semantic dedup (SemDeDup) ----------------------------------------

  test("semantic dedup: flags agree with brute-force within-cell check, planted near-dups caught") {
    val emb = Tables(spark, Sf0001).embeddings
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.4, dim = 64, k = 16)
    val flags = out.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(flags.size == emb.count(), "one row per vector")
    // brute-force replica: same cells, all within-cell pairs, min-id keeper
    val cells = out.select("vec_id", "cluster")
    val vecs = emb.select(col("vec_id"),
      graft.plans.VectorExpressions.vector_normalize(col("embedding")).as("nv"))
    val byId = vecs.join(cells, "vec_id")
    val expectDup = byId.as("hi")
      .join(byId.as("lo").select(col("vec_id").as("lo_id"), col("nv").as("lo_nv"), col("cluster")), Seq("cluster"))
      .filter(col("lo_id") < col("vec_id"))
      .filter(graft.plans.VectorExpressions.vector_dot(col("nv"), col("lo_nv")) >= 0.4)
      .select("vec_id").distinct().as[Long].collect().toSet
    flags.foreach { case (id, (_, isDup)) =>
      assert(isDup == expectDup.contains(id), s"flag mismatch for vec $id")
    }
    // the testdata's planted near-dups (cos ≈ 0.9+) co-locate and get flagged
    assert(expectDup.nonEmpty, "no semantic dups found — query is signal-free")
  }

  test("semantic dedup is partitioning-independent and keeps one per dup group") {
    val emb = Tables(spark, Sf0001).embeddings
    val a = Similarity.semanticDedup(emb, "vec_id", "embedding", 0.4, dim = 64, k = 16)
    val b = Similarity.semanticDedup(emb.repartition(7), "vec_id", "embedding", 0.4, dim = 64, k = 16)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // min-id keeper rule: the lowest id of any flagged cell-group is kept
    val kept = a.filter(!col("is_dup")).count()
    assert(kept > 0 && kept < emb.count())
  }

  // ---- repeated-substring coverage (d10) -------------------------------

  test("repeatedSpanCoverage marks exactly the cross-doc repeated windows") {
    // docs 1 and 2 share the 5-gram "a b c d e" (doc 2 carries it twice);
    // doc 3 shares nothing. Window counts: doc1 = 4 (8 tokens), doc2 = 7
    // (11 tokens), doc3 = 1 (short doc -> whole-text window).
    val docs = Seq(
      (1L, "a b c d e x y z"),
      (2L, "q a b c d e a b c d e"),
      (3L, "u v w")
    ).toDF("doc_id", "text")
    val r = Dedup.repeatedSpanCoverage(docs, "doc_id", "text", k = 5)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((4L, 1L)))  // only "a b c d e" is cross-doc
    assert(r(2L) == ((7L, 2L)))  // both occurrences of the shared gram
    assert(r(3L) == ((1L, 0L)))  // short doc: one whole-text window, unique
  }

  test("repeatedSpanCoverage is partitioning-independent") {
    val docs = Tables(spark, Sf0001).documents
    val a = Dedup.repeatedSpanCoverage(docs, "doc_id", "text", k = 5)
    val b = Dedup.repeatedSpanCoverage(docs.repartition(7), "doc_id", "text", k = 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.agg(sum("dup_windows")).head().getLong(0) > 0,
      "no cross-doc repeats found at k=5 — query is signal-free")
  }

  test("longestDupSpans finds the maximal shared run, not just any window") {
    // docs 1 and 2 share the 7-token substring "a b c d e f g": three
    // consecutive dup 5-gram windows -> run 3 -> 3 + 4 = 7 tokens
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "z z a b c d e f g z"),
      (3L, "p q r")
    ).toDF("doc_id", "text")
    val r = Dedup.longestDupSpans(docs, "doc_id", "text", k = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 7L, 2L -> 7L, 3L -> 0L))
  }

  test("longestDupSpans agrees with repeatedSpanCoverage on who has dups") {
    val docs = Tables(spark, Sf0001).documents
    val spans = Dedup.longestDupSpans(docs, "doc_id", "text", k = 5)
    val cov = Dedup.repeatedSpanCoverage(docs, "doc_id", "text", k = 5)
    val joined = spans.join(cov, "doc_id")
    assert(joined.filter(
      (col("longest_dup_span_tokens") > 0) =!= (col("dup_windows") > 0)).isEmpty,
      "span detector and coverage detector disagree on dup membership")
    val b = Dedup.longestDupSpans(docs.repartition(7), "doc_id", "text", k = 5)
    assert(spans.exceptAll(b).isEmpty && b.exceptAll(spans).isEmpty)
  }

  test("leakage-safe split never separates a near-dup pair") {
    val docs = Tables(spark, Sf0001).documents
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.5)
    val cc = graft.operators.Graph.connectedComponents(
      docs.select("doc_id"), pairs, "doc_id", "id_a", "id_b")
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
    val split = Sampling.hashSplitPortable(cc, "cluster_id", Seq("train" -> 0.8, "test" -> 0.2))
      .select("doc_id", "split")
    val straddle = pairs
      .join(split.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
      .join(split.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
      .filter(col("sa") =!= col("sb"))
    assert(pairs.count() > 0, "no near-dup pairs — co-travel assertion is vacuous")
    assert(straddle.isEmpty, "a near-dup pair straddles train/test")
    // both splits are populated (cluster-level hash still realizes ~80/20)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "test") && counts("train") > counts("test"))
  }

  // ---- deterministic global shuffle (x8) -------------------------------

  test("globalShuffle gives every row a unique stable (shard, pos) address") {
    val docs = Tables(spark, Sf0001).documents
    val a = Sampling.globalShuffle(docs, "doc_id").select("doc_id", "shard", "pos")
    val b = Sampling.globalShuffle(docs.repartition(7), "doc_id")
      .select("doc_id", "shard", "pos")
    // pure function of (key, seed): identical addresses on any partitioning
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // bijection: (shard, pos) collides never; pos is 1..n_shard contiguous
    val n = docs.count()
    assert(a.select("shard", "pos").distinct().count() == n)
    val perShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
    assert(perShard.filter(col("lo") =!= 1 || col("hi") =!= col("n")).isEmpty)
    // the md5 order decorrelates from doc_id order: within any shard, the
    // doc_ids adjacent in shuffle order are far apart in id order
    val disorder = a.filter(col("shard") === "0").orderBy("pos")
      .select("doc_id").as[Long].collect().toSeq
    assert(disorder != disorder.sorted, "shuffle order tracks id order")
  }
}
