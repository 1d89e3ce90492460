package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Physical-layout levers for the 100 TB posture, asserted on real plans:
  * bucketed co-located joins (no shuffle exchange) and dynamic partition
  * pruning on date-partitioned fact tables (SURVEY §4).
  */
class PhysicalLayoutSpec extends SparkSpecBase {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed tables join without a shuffle exchange") {
    // explicit table paths — warehouse.dir is static and irrelevant here
    val wh = Files.createTempDirectory("warehouse").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      val t = Tables(spark, Sf0001)
      t.orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      t.lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      joined.collect()
      // AQE plans print Final + Initial sections; audit the final one only
      val plan = physicalPlan(joined).split("== Initial Plan ==")(0)
      // both sides read pre-bucketed: the join itself needs no Exchange —
      // the single Exchange in the plan is the final aggregation by
      // o_orderpriority, which sits above the join
      assert(plan.split("Bucketed: true").length - 1 == 2, s"scans not bucketed:\n$plan")
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
        s"expected exactly one (post-join agg) exchange:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("date-partitioned fact table gets dynamic partition pruning from a dim filter") {
    val dir = Files.createTempDirectory("dpp").toString
    val t = Tables(spark, Sf0001)
    t.orders
      .withColumn("order_year", year(col("o_orderdate")))
      .write.partitionBy("order_year").parquet(s"$dir/orders_p")
    val fact = spark.read.parquet(s"$dir/orders_p")
    // dim with a selective filter on the partition key's domain
    val dim = t.customer.select(col("c_custkey"), (col("c_custkey") % 4 + 1995).cast("int").as("order_year"))
      .filter(col("c_custkey") < 50)
    val q = fact.join(dim, Seq("order_year")).groupBy("order_year").count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning") ||
      q.queryExecution.optimizedPlan.toString.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n${plan.take(2000)}")
    assert(q.count() > 0)
  }

  test("decontamination span report probes the bench set map-side (broadcast left-semi, no sort-merge)") {
    val t = Tables(spark, Sf0001)
    val docs = t.documents
    val spans = graft.operators.Dedup.contaminationSpans(
      docs.filter(col("doc_id") % 23 =!= 0), docs.filter(col("doc_id") % 23 === 0),
      "doc_id", "text", n = 8)
    val plan = physicalPlan(spans)
    // the 100 TB train side must stream against a broadcast benchmark set:
    // a sort-merge (or shuffled-hash) join here would shuffle the full
    // exploded train corpus on the shingle key
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"span probe not a broadcast left-semi:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"), s"train side shuffles on shingle:\n${plan.take(3000)}")
  }

  test("PQ rerank fetches shortlist vectors via broadcast joins (corpus never shuffles)") {
    val t = Tables(spark, Sf0001)
    val e = t.embeddings
    val topk = graft.operators.Similarity.pqTopK(
      e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, dim = 64, m = 4, ksub = 16, refine = 5)
    val plan = physicalPlan(topk)
    // ADC scan rides a broadcast nested-loop over the encoded corpus; the
    // rerank joins (shortlist ids + query vectors) must both broadcast —
    // any sort-merge join would exchange the corpus by id
    assert(plan.contains("BroadcastHashJoin"), s"rerank joins not broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled in rerank:\n${plan.take(3000)}")
  }

  test("semantic decontamination screens the corpus map-side (broadcast, train never shuffles pre-agg)") {
    val e = Tables(spark, Sf0001).embeddings
      .select(col("vec_id"), graft.plans.VectorExpressions.vector_normalize(col("embedding")).as("nv"))
    val bench = e.filter(col("vec_id") % 23 === 0)
      .select(col("vec_id").as("bench_id"), col("nv").as("bv"))
    val screened = e.filter(col("vec_id") % 23 =!= 0)
      .join(org.apache.spark.sql.functions.broadcast(bench),
        graft.plans.VectorExpressions.vector_dot(col("nv"), col("bv")) >= 0.4)
      .groupBy("vec_id").agg(count(lit(1)).as("n_bench_hits"))
    val plan = physicalPlan(screened)
    // the non-equi cosine predicate must ride a broadcast nested-loop over
    // the streaming train side; the only exchange is the final count over
    // the (tiny) contaminated set — never the corpus pre-join
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"bench set not broadcast into the scan:\n${plan.take(3000)}")
    assert(plan.split("Exchange").length - 1 <= 2,
      s"corpus shuffled before the screen:\n${plan.take(3000)}")
  }

  test("semantic dedup shuffles once on the cell id (row-local assignment, no corpus-wide exchange)") {
    val out = graft.operators.Similarity.semanticDedup(
      Tables(spark, Sf0001).embeddings, "vec_id", "embedding",
      threshold = 0.4, dim = 64, k = 16)
    val plan = physicalPlan(out)
    // cell assignment is a codegen'd expression (no join against a
    // centroid table); the within-cell self-join may hash-exchange both
    // localCheckpointed sides on `cluster`, and the final flag join is on
    // vec_id — what must NOT appear is any broadcast-materialized corpus
    // or a nested-loop pair enumeration
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs enumeration leaked into semantic dedup:\n${plan.take(3000)}")
    // bounded exchanges: pair self-join on cluster + dup-id agg + flag join
    // on vec_id (SMJ is the RIGHT default here — SemDeDup can flag a large
    // corpus fraction, so the dup side must not be assumed broadcastable;
    // AQE demotes it to broadcast at runtime when it is actually small)
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 4,
      s"unexpected extra corpus exchange:\n${plan.take(3000)}")
  }

  test("repeated-span coverage is one scan, no join, bounded exchanges (d10)") {
    val out = graft.operators.Dedup.repeatedSpanCoverage(
      Tables(spark, Sf0001).documents, "doc_id", "text", k = 5)
    val plan = physicalPlan(out)
    // the gram-level doc count is a count-over-window on the reduced
    // (doc, gram) frame — a self-join would scan+explode the corpus twice
    // and tempt a corpus-sized broadcast
    assert(!plan.contains("Join"), s"self-join leaked into d10:\n${plan.take(3000)}")
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"corpus scanned more than once:\n${plan.take(3000)}")
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 3,
      s"more than (doc,gram)->gram->doc exchanges:\n${plan.take(3000)}")
  }

  test("global shuffle sorts per shard, never in one partition (x8)") {
    val out = graft.operators.Sampling.globalShuffle(
      Tables(spark, Sf0001).documents, "doc_id")
    val plan = physicalPlan(out)
    // the rank window partitions by shard — a global-order window would
    // show Exchange SinglePartition and serialize the corpus
    assert(!plan.contains("SinglePartition"),
      s"single-partition sort leaked into x8:\n${plan.take(3000)}")
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"x8 should exchange exactly once (on shard):\n${plan.take(3000)}")
  }

  test("bloom screen probes map-side: no join, one aggregation exchange (d7c)") {
    val docs = Tables(spark, Sf0001).documents
    val out = graft.operators.Dedup.contaminationScoresBloom(
      docs.filter(col("doc_id") % 23 =!= 0), docs.filter(col("doc_id") % 23 === 0),
      "doc_id", "text", n = 3)
    val plan = physicalPlan(out)
    // the bench set rides inside the BloomMightContain expression — the
    // train side must not join or broadcast-exchange anything
    assert(!plan.contains("Join"), s"join leaked into the bloom screen:\n${plan.take(3000)}")
    assert(plan.split("Exchange").length - 1 == 1,
      s"bloom screen should exchange exactly once (doc agg):\n${plan.take(3000)}")
  }
}
