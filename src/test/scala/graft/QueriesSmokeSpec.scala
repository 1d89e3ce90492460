package graft

/** Every declared query must run at sf0.001 and (where a result is
  * guaranteed) return rows; true value-correctness is covered by the
  * driver's DuckDB-oracle gate, locally emulated via
  * tools/check_oracle.py. */
class QueriesSmokeSpec extends SparkSpecBase {

  // queries whose correct result CAN be empty at this scale
  private val mayBeEmpty = Set("j5_anti_join", "d4_embedding_neardup", "d1_ngram_jaccard",
    "d2_minhash_lsh", "u7_except")

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, Sf0001).count()
        if (n == 0 && !mayBeEmpty(name)) Some(s"$name: 0 rows") else None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("every oracle key refers to a declared query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  test("rows-only entries are exactly the documented sketch/seeded set") {
    // every board entry must carry a DuckDB oracle EXCEPT the rows-only
    // set documented in SparkEntry.rowsOnly (each pinned by a hash-green
    // twin or ground-truth spec) and the trained-ANN entries whose
    // oracles are captured AFTER their models train (DedupQueries /
    // TextQueries inline-the-model pattern). An oracle silently going
    // missing from any other entry fails here instead of surfacing as a
    // driver-side rows-only downgrade next round.
    val documented = SparkEntry.rowsOnly.keySet
    val trainedCaptured = SparkEntry.trainedCapturedOracles
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert((missing -- trainedCaptured) == documented,
      s"undocumented rows-only entries: ${(missing -- trainedCaptured) -- documented}; " +
        s"documented-but-now-oracled (update SparkEntry.rowsOnly): ${documented -- missing}")
  }

  test("committed ROWS_ONLY.json mirrors SparkEntry.rowsOnly byte-for-byte") {
    // the machine-readable companion to the driver's correctness artifact
    // (Verify also drops the same content into its outDir): regenerate
    // with  sbt "Test/runMain graft.RowsOnlyGen"  after editing the map
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("ROWS_ONLY.json"))
    assert(committed == SparkEntry.rowsOnlyJson,
      "ROWS_ONLY.json is stale — run: sbt \"Test/runMain graft.RowsOnlyGen\"")
  }

  test("every rows-only pin that names a board twin names a REAL board entry") {
    // "twin <name>" references inside the pin strings must stay valid as
    // the board evolves — a renamed twin would otherwise leave a dangling
    // pointer in the artifact
    val names = SparkEntry.queries.keySet
    SparkEntry.rowsOnly.foreach { case (k, (_, pin)) =>
      "twin ([A-Za-z0-9_]+)".r.findAllMatchIn(pin).foreach { m =>
        assert(names.contains(m.group(1)),
          s"$k: pin references unknown twin '${m.group(1)}'")
      }
    }
  }

  test("flagship entry returns enriched rows") {
    assert(SparkEntry.entry(spark).count() == 25) // 25 nations
  }

  test("approx distinct tracks exact within the configured error") {
    val exact = SparkEntry.queries("a5_count_distinct")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("a5b_approx_distinct")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.1, s"$k: exact=$e approx=${approx(k)}")
    }
  }
}
