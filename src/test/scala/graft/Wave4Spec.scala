package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Layout, Quantization, Scd}

/** Round-4 operators: int8 scalar quantization, change-log SCD2 history,
  * Z-order layout, frame sampling. */
class Wave4Spec extends SparkSpecBase {
  import spark.implicits._

  // ---- scalar quantization -------------------------------------------

  test("quantization round-trip error is within half a bucket per dimension") {
    val e = Tables(spark, Sf0001).embeddings
    val (mins, maxs) = Quantization.dimStats(e, "embedding")
    assert(mins.length == 64 && maxs.length == 64)
    assert(mins.zip(maxs).forall { case (mn, mx) => mn < mx })
    // max |x̂ - x| over every (vector, dim); midpoint decode ⇒ ≤ halfBucket
    val err = e
      .select(
        Quantization.decode(
          Quantization.encode(col("embedding"), mins, maxs), mins, maxs).as("xh"),
        col("embedding").as("x"))
      .select(expr(
        "aggregate(zip_with(xh, x, (a, b) -> abs(a - CAST(b AS DOUBLE))), 0D, (acc, v) -> greatest(acc, v))").as("e"))
      .agg(max("e")).head().getDouble(0)
    val halfBucket = mins.zip(maxs).map { case (mn, mx) => (mx - mn) / 512.0 }.max
    assert(err <= halfBucket + 1e-12, s"round-trip err $err > half bucket $halfBucket")
  }

  test("quantization codes are independent of partitioning") {
    val e = Tables(spark, Sf0001).embeddings
    val a = Quantization.scalarQuantize(e, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Quantization.scalarQuantize(e.repartition(7), "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
    assert(a.values.forall(_.split(" ").forall(c => c.toInt >= 0 && c.toInt <= 255)))
  }

  test("quantized exact scan keeps high recall vs full-precision brute force") {
    import graft.operators.Similarity
    val e = Tables(spark, Sf0001).embeddings
    val q = e.filter(col("vec_id") < 10)
    val (mins, maxs) = Quantization.dimStats(e, "embedding")
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedTopK(e, q, "vec_id", "embedding", k = 5, mins, maxs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(quant.size == brute.size)
    val recall = brute.intersect(quant).size.toDouble / brute.size
    // half-a-bucket-per-dim decode error barely perturbs cosine ordering
    assert(recall >= 0.8, s"SQ8 recall $recall < 0.8")
  }

  // ---- audio decode ---------------------------------------------------

  test("audio decode recovers the synthetic square wave's closed forms") {
    import graft.operators.Multimodal
    val ids = spark.range(0, 40).toDF("doc_id")
    val feats = Multimodal.extractAudioFeatures(
      Multimodal.syntheticWavs(ids, "doc_id"), "doc_id", "payload").collect()
    assert(feats.length == 40)
    feats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = 256 + (id % 256) * 4
      val hp = 8 + id % 16
      val amp = 1000 + (id % 100) * 100
      assert(r.getAs[Boolean]("decoded"), s"id $id fell back to stub")
      assert(r.getAs[String]("codec") == "wav")
      assert(r.getAs[Int]("sample_rate") == 8000 && r.getAs[Int]("channels") == 1)
      assert(r.getAs[Long]("n_samples") == n, s"id $id n_samples")
      assert(r.getAs[Long]("sum_abs") == n * amp, s"id $id sum_abs")
      assert(r.getAs[Long]("zero_crossings") == (n - 1) / hp, s"id $id crossings")
    }
  }

  test("undecodable audio payloads fall back to the deterministic stub") {
    import graft.operators.Multimodal
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "payload")
    val r = Multimodal.extractAudioFeatures(junk, "doc_id", "payload").head()
    assert(!r.getAs[Boolean]("decoded") && r.getAs[String]("codec") == "unknown")
  }

  // ---- gopher filter --------------------------------------------------

  test("gopher filter verdict equals the rule recomputed from its metrics") {
    val q = graft.queries.TextQueries.queries("t17_gopher_filter")
    val rows = q(spark, Sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val expect = r.getAs[Long]("n_words") >= 50 && r.getAs[Long]("n_words") <= 100000 &&
        r.getAs[Double]("mean_word_len") >= 3.0 && r.getAs[Double]("mean_word_len") <= 10.0 &&
        r.getAs[Double]("alpha_word_frac") >= 0.8 && r.getAs[Int]("req_stopword_hits") >= 2
      assert(r.getAs[Boolean]("keep") == expect, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("streaming packing equals the batch packer row-for-row") {
    val batch = graft.queries.AdvancedQueries.queries("x3_pack_sequences")(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    val stream = graft.streaming.StreamingJobs.streamingPack(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("streaming quality gate equals the batch gopher filter row-for-row") {
    val batch = graft.queries.TextQueries.queries("t17_gopher_filter")(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    val stream = graft.streaming.StreamingJobs.streamingQualityGate(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("LM-quality filter drops exactly the bottom decile") {
    // 500 docs with distinct 6-dp scores: the interpolated 10th-percentile
    // cut lands strictly between s[49] and s[50], so exactly 50 docs fall
    // below it
    val rows = graft.queries.TextQueries.queries("t19_lm_quality_filter")(spark, Sf0001)
      .collect()
    assert(rows.length == 500)
    assert(rows.count(!_.getAs[Boolean]("keep")) == 50)
  }

  test("exact-quota sample keeps precisely ceil(0.25·n) docs per source") {
    val total = Tables(spark, Sf0001).documents
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = graft.queries.AdvancedQueries.queries("x11_stratified_quota")(spark, Sf0001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == total.keySet, "every stratum must be represented")
    kept.foreach { case (src, k) =>
      assert(k == math.ceil(total(src) * 0.25).toLong, s"source $src quota")
    }
  }

  test("nearest-neighbor resize is exact: solid images yield 64x the channel value") {
    // on m2's SOLID fixture every sampled pixel is identical, so the 8x8
    // thumbnail sums must be exactly 64x the per-channel formula — any
    // interpolation/averaging in the resample would break this
    val imgs = graft.operators.Multimodal.syntheticPngs(
      Tables(spark, Sf0001).documents.select("doc_id").limit(32), "doc_id")
    val rows = graft.operators.Multimodal
      .resizeThumbnail(imgs, "doc_id", "payload", 8, 8).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("decoded"))
      assert(r.getAs[Long]("sum_r") == 64L * math.floorMod(id, 256))
      assert(r.getAs[Long]("sum_g") == 64L * math.floorMod(7 * id, 256))
      assert(r.getAs[Long]("sum_b") == 64L * math.floorMod(13 * id, 256))
    }
  }

  test("repetition filter discriminates and its tie-break is deterministic") {
    val q = graft.queries.TextQueries.queries("t18_repetition_filter")
    val r1 = q(spark, Sf0001).collect().map(_.toSeq)
    val keeps = r1.map(_.last).toSet
    assert(keeps == Set(true, false), "thresholds must split the corpus")
    // max-count/max-gram tie-break must be stable run to run (the oracle
    // hash compare depends on it)
    val r2 = q(spark, Sf0001).collect().map(_.toSeq)
    assert(r1.toSet == r2.toSet)
  }

  test("gopher filter is a pure map: physical plan has no exchange") {
    val q = graft.queries.TextQueries.queries("t17_gopher_filter")
    val plan = q(spark, Sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quality pass must not shuffle:\n$plan")
  }

  // ---- change-log SCD2 history ---------------------------------------

  test("scd history collapses runs, chains intervals, one current row per key") {
    def ts(s: String) = Timestamp.valueOf(s)
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "open", 10L),
      (1L, ts("2024-01-02 00:00:00"), "open", 11L),   // same state — collapses
      (1L, ts("2024-01-03 00:00:00"), "closed", 12L), // change
      (1L, ts("2024-01-04 00:00:00"), "open", 13L),   // change back
      (2L, ts("2024-01-01 00:00:00"), "open", 20L),   // single-state key
      (3L, ts("2024-01-05 00:00:00"), "a", 30L),      // simultaneous obs:
      (3L, ts("2024-01-05 00:00:00"), "b", 31L)       //   tie-broken by id
    ).toDF("k", "t", "state", "id")
    val h = Scd.history(log, "k", "t", "state", "id")
      .orderBy("k", "version").collect()

    val k1 = h.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("open", "closed", "open"))
    assert(k1.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L))
    // intervals chain: valid_to of version n == valid_from of version n+1
    assert(k1.sliding(2).forall { case Array(a, b) =>
      a.getTimestamp(3) == b.getTimestamp(2) })
    // exactly one current row per key, and it is the last version
    val currents = h.filter(_.getBoolean(5))
    assert(currents.map(_.getLong(0)).toSeq.sorted == Seq(1L, 2L, 3L))
    assert(currents.forall(_.getTimestamp(3) == null))
    // simultaneous observations ordered by the tie column: a then b
    val k3 = h.filter(_.getLong(0) == 3L)
    assert(k3.map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("scd history is deterministic under repartitioning") {
    val ev = Tables(spark, Sf0001).events
    val a = Scd.history(ev, "user_id", "ts", "event_type", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getString(1))).toSet
    val b = Scd.history(ev.repartition(13), "user_id", "ts", "event_type", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getString(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  // ---- Z-order layout ------------------------------------------------

  test("interleave16 places a-bits even, b-bits odd") {
    val rows = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 1L), (0L, 0L))
      .toDF("a", "b")
      .select(Layout.interleave16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(0x55555555L, 0xAAAAAAAAL, 7L, 0L))
  }

  test("z-ordered files have tight bounding boxes in BOTH dimensions") {
    val ev = Tables(spark, Sf0001).events
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_s"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val nFiles = 16

    // single-dim layout: range partition + sort on user_id only
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$dir/linear")
    Layout.zorderedParquet(ev, s"$dir/zorder", col("user_id"), col("ts_s"), nFiles)

    def fileBounds(path: String): Array[(Long, Long, Long, Long)] = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("user_id"), max("user_id"), min("ts_s"), max("ts_s")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }
    // files a point query must read = files whose [min,max] contains the
    // probe; probe both dimensions at 5 quantile points each
    def filesRead(bounds: Array[(Long, Long, Long, Long)]): Int = {
      val uProbes = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(q =>
        ev.stat.approxQuantile("user_id", Array(q), 0.0).head.toLong)
      val tProbes = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(q =>
        ev.stat.approxQuantile("ts_s", Array(q), 0.0).head.toLong)
      uProbes.map(p => bounds.count(b => b._1 <= p && p <= b._2)).sum +
        tProbes.map(p => bounds.count(b => b._3 <= p && p <= b._4)).sum
    }
    val linear = filesRead(fileBounds(s"$dir/linear"))
    val zord = filesRead(fileBounds(s"$dir/zorder"))
    // linear reads ~1 file per user_id probe but EVERY file per ts probe;
    // z-order reads ~sqrt(n) per probe in either dimension
    assert(zord < linear,
      s"z-order read $zord file-probes, single-dim $linear — no pruning win")
  }

  // ---- frame sampling ------------------------------------------------

  test("sampleFrames emits every-nth frame indices from payload metadata") {
    val df = Seq((1L, "x" * 4500), (2L, "y" * 999), (3L, "z" * 2000))
      .toDF("doc_id", "payload")
    val got = graft.operators.Multimodal.sampleFrames(df, "doc_id", "payload", everyNth = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // 4500B -> 4 frames -> idx 0,2; 999B -> 0 frames -> idx 0 (floor);
    // 2000B -> 2 frames -> idx 0
    assert(got == Set((1L, 0), (1L, 2), (2L, 0), (3L, 0)))
  }
}
