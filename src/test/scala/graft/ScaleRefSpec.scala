package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Staleness gate for the committed ×10 scale-leg artifact
  * (SCALE_r<N>.json, written by tools/scale_leg.sh) — the BenchRefSpec
  * pattern applied to the one regression class nothing else catches: a
  * query added to the board WITHOUT a scale-leg rerun ships with no ×10
  * ratio evidence at all (the round-7 board-addition window proved the
  * gap is real). This spec fails the suite until tools/scale_leg.sh is
  * rerun, making "batch board additions, then rerun the scale leg" a
  * hard invariant instead of builder memory.
  */
class ScaleRefSpec extends AnyFunSuite {

  /** The highest-round SCALE_r<N>.json at the repo root — the artifact
    * the next judge reads. Lexicographic max is wrong past r9 (r10 < r9),
    * so compare parsed round numbers. Plain listFiles, not Files.list —
    * the stream variant holds a directory handle until closed. */
  private lazy val latestScale: Option[(Int, String)] =
    Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .flatMap { n =>
        "^SCALE_r(\\d+)\\.json$".r.findFirstMatchIn(n).map(m => (m.group(1).toInt, n))
      }
      .sortBy(_._1).lastOption

  /** Shared accessor with the actionable message (a bare .get would fail
    * tests 2-3 with an opaque None.get on a fresh clone). */
  private def latestScaleOrFail: (Int, String) = {
    assert(latestScale.nonEmpty,
      "no SCALE_r<N>.json at the repo root — run tools/scale_leg.sh <round>")
    latestScale.get
  }

  private def scaleKeys(file: String): Set[String] = {
    val txt = Files.readString(Paths.get(file))
    // the artifact's "queries" object is a {"name": {base_sec, x10_sec,
    // ratio}} map; failed/violation lists repeat names as plain strings.
    // Keys of the queries map are exactly the quoted tokens followed by
    // ':' and an object — scan for "name": { ... } shapes.
    "\"([A-Za-z0-9_]+)\"\\s*:\\s*\\{".r.findAllMatchIn(txt).map(_.group(1)).toSet -
      "gate" - "allowlist" - "queries"
  }

  test("a SCALE_r<N>.json artifact exists (run tools/scale_leg.sh <round>)") {
    assert(latestScale.nonEmpty, "no SCALE_r<N>.json at the repo root")
  }

  test("the latest scale artifact covers every timed board query (rerun tools/scale_leg.sh)") {
    val (round, file) = latestScaleOrFail
    val timed = SparkEntry.queries.keySet -- Bench.TwinEntries
    val missing = timed -- scaleKeys(file)
    assert(missing.isEmpty,
      s"$file (round $round) is stale — a board entry shipped without a ×10 scale ratio; " +
        s"run tools/scale_leg.sh; missing: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("the latest scale artifact carries no entries outside the timed board") {
    val (round, file) = latestScaleOrFail
    val timed = SparkEntry.queries.keySet -- Bench.TwinEntries
    // negative controls (toy_quadratic) live only in SCALE_selftest.json,
    // never in the round artifact
    val dead = scaleKeys(file) -- timed
    assert(dead.isEmpty,
      s"$file (round $round) names queries outside the timed board — rerun " +
        s"tools/scale_leg.sh; dead: ${dead.toSeq.sorted.mkString(", ")}")
  }
}
