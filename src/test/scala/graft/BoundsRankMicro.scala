package graft

/** Micro-bench for the BoundsRank bucket probe vs the O(B) linear scan it
  * replaced, across boundary-array sizes B (= shuffle-partition count):
  *   sbt "Test/runMain graft.BoundsRankMicro"
  * The point: the probe runs once per input ROW, so its cost must stay
  * flat as a cluster raises B from the test 32 to 2048+.
  */
object BoundsRankMicro {
  def main(args: Array[String]): Unit = {
    val n = 10000000
    val rnd = new scala.util.Random(7)
    val values = Array.fill(n)(rnd.nextDouble() * 1e6)
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val acc = f; (acc, (System.nanoTime() - t0) / 1e9)
    }
    for (b <- Seq(32, 256, 2048)) {
      val bounds = Array.tabulate(b - 1)(i => (i + 1) * 1e6 / b)
      // warmup both paths
      var w = 0L; var i = 0
      while (i < 1000000) { w += graft.plans.BoundsRank.compute(values(i), bounds); i += 1 }
      i = 0; while (i < 1000000) { var c = 0; var j = 0; while (j < bounds.length && bounds(j) <= values(i)) { c += 1; j += 1 }; w += c; i += 1 }
      val (a1, tBin) = time {
        var acc = 0L; var i = 0
        while (i < n) { acc += graft.plans.BoundsRank.compute(values(i), bounds); i += 1 }
        acc
      }
      val (a2, tLin) = time {
        var acc = 0L; var i = 0
        while (i < n) {
          var c = 0; var j = 0
          while (j < bounds.length && bounds(j) <= values(i)) { c += 1; j += 1 }
          acc += c; i += 1
        }
        acc
      }
      require(a1 == a2, s"paths disagree at B=$b")
      println(f"B=$b%5d  binary=$tBin%6.3f s  linear=$tLin%6.3f s  (${n / 1e6}%.0fM probes)")
    }
  }
}
