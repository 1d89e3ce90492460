package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{LanguageModel, Retention, Skew, Tenant}

/** Skew salting, tenant scoping, retention. */
class Operators2Spec extends SparkSpecBase {
  import spark.implicits._

  test("salted sum aggregates identically to plain groupBy") {
    val li = Tables(spark, Sf0001).lineitem
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("l_quantity_sum"), count(lit(1)).as("row_cnt"))
    val salted = Skew.saltedSum(li, Seq("l_returnflag"), "l_quantity", 16)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join matches plain join results") {
    val t = Tables(spark, Sf0001)
    val plain = t.orders.join(t.customer.select("c_custkey", "c_nationkey"),
      col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("cnt"))
    val salted = Skew.saltedJoin(
      t.orders.withColumnRenamed("o_custkey", "c_custkey"),
      t.customer.select("c_custkey", "c_nationkey"), "c_custkey", 8)
      .groupBy("c_nationkey").agg(count(lit(1)).as("cnt"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot-key report finds the dominant key") {
    val df = (Seq.fill(900)("CA") ++ Seq.fill(50)("CO") ++ Seq.fill(50)("TX")).toDF("state")
    val hot = Skew.hotKeys(df, "state", 0.5).collect()
    assert(hot.length == 1 && hot(0).getString(0) == "CA")
  }

  test("tenant scope filters rows and masks fields, keeping pushdown-able predicates") {
    val df = Seq(
      ("t1", "PUBLIC", "alpha-secret"),
      ("t2", "PUBLIC", "beta-secret"),
      (null, "PUBLIC", "shared"),
      ("t1", "RESTRICTED", "gamma")
    ).toDF("tenant_id", "data_classification", "note")
    val scoped = Tenant.apply(df, Tenant.Scope("t1", Seq("PUBLIC"), Seq("note")))
    val rows = scoped.collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(rows == Set(("t1", "al**********"), (null, "sh****")))
  }

  test("retention: survivors + expired partition by the policy cutoff") {
    val events = Tables(spark, Sf0001).events
    val asOf = Date.valueOf("2024-01-20")
    val keep = Retention.survivors(events, "ts", asOf, 10)
    val drop = Retention.expired(events, "ts", asOf, 10)
    assert(keep.count() + drop.count() == events.count())
    assert(keep.filter(to_date(col("ts")) < lit("2024-01-10")).count() == 0)
    assert(drop.filter(to_date(col("ts")) >= lit("2024-01-10")).count() == 0)
  }

  test("corpus typicality: common-token docs score high avg_df, rare-token docs flag OOV") {
    // "the cat" x3 makes {the, cat} the frequent vocabulary; doc 4 is junk
    val docs = Seq(
      (1L, "the cat the cat"),
      (2L, "the cat"),
      (3L, "the the the cat"),
      (4L, "zzzq qqqz")
    ).toDF("doc_id", "text")
    val got = LanguageModel.corpusTypicality(docs, "doc_id", "text", topK = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5))).toMap
    // corpus counts: the=6, cat=4, zzzq=1, qqqz=1; top-2 vocab = {the, cat}
    assert(got(1L) == ((4L, 2 * 6L + 2 * 4L, 0L, 0.0)))
    assert(got(3L) == ((4L, 3 * 6L + 4L, 0L, 0.0)))
    assert(got(4L) == ((2L, 2L, 2L, 1.0))) // every token OOV
  }

  test("unigram neg-log-prob ranks rare-token docs as less typical") {
    val docs = Seq(
      (1L, "the cat the cat the cat"),
      (2L, "zzzq qqqz xxxv")
    ).toDF("doc_id", "text")
    val got = LanguageModel.unigramNegLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(2L) > got(1L)) // junk doc is further from the corpus model
    // common-token doc: p(the)=p(cat)=3/9 -> avg -ln(1/3)
    assert(math.abs(got(1L) - math.log(3.0)) < 1e-9)
  }
}
