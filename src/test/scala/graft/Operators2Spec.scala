package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Retention, Skew, Tenant}

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
}
