package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** SCD2 snapshot-merge semantics (dbt timestamp strategy +
  * invalidate_hard_deletes). */
class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("merge: changed rows close + reopen, new keys append, unchanged pass through") {
    val b1 = Seq(
      ("d1", "Flood", ts("2024-01-01 00:00:00")),
      ("d2", "Fire", ts("2024-01-01 00:00:00"))
    ).toDF("id", "kind", "updated_at")
    val h1 = Scd2.init(b1, "updated_at")

    val b2 = Seq(
      ("d1", "Major Flood", ts("2024-02-01 00:00:00")), // changed
      ("d2", "Fire", ts("2024-01-01 00:00:00")),        // unchanged
      ("d3", "Storm", ts("2024-02-01 00:00:00"))        // new
    ).toDF("id", "kind", "updated_at")
    val h2 = Scd2.merge(h1, b2, Seq("id"), "updated_at")

    val open = h2.filter(col("is_current")).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(open == Map("d1" -> "Major Flood", "d2" -> "Fire", "d3" -> "Storm"))
    val closed = h2.filter(!col("is_current")).collect()
    assert(closed.length == 1)
    assert(closed(0).getString(1) == "Flood")
    assert(closed(0).getAs[Timestamp]("valid_to") == ts("2024-02-01 00:00:00"))

    // idempotence: merging the same batch again changes nothing
    val h3 = Scd2.merge(h2, b2, Seq("id"), "updated_at")
    assert(h3.count() == h2.count())
    assert(h3.exceptAll(h2).isEmpty)
  }

  test("merge with invalidate_hard_deletes closes vanished keys") {
    val b1 = Seq(("a", 1, ts("2024-01-01 00:00:00")), ("b", 2, ts("2024-01-01 00:00:00")))
      .toDF("id", "v", "updated_at")
    val h1 = Scd2.init(b1, "updated_at")
    val b2 = Seq(("a", 1, ts("2024-01-01 00:00:00"))).toDF("id", "v", "updated_at")
    val h2 = Scd2.merge(h1, b2, Seq("id"), "updated_at",
      invalidateHardDeletes = true, deleteTs = Some(ts("2024-03-01 00:00:00")))
    val b = h2.filter(col("id") === "b").collect()
    assert(b.length == 1 && !b(0).getAs[Boolean]("is_current"))
    assert(b(0).getAs[Timestamp]("valid_to") == ts("2024-03-01 00:00:00"))
    val a = h2.filter(col("id") === "a").collect()
    assert(a.length == 1 && a(0).getAs[Boolean]("is_current"))
  }
}
