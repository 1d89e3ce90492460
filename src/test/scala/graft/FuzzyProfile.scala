package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Wall-time + candidate-growth attribution for d17_fuzzy_join — the
  * round-14 verdict's worst gated scale leg (6.98 of 10; base 0.66 s →
  * ×10 6.98 s, raw 10.53). Splits the operator the EmProfile way into its
  * three physical stages (mirroring FuzzyJoin.blockedLevenshtein's plan,
  * stage for stage) and, separately, counts the CANDIDATE PAIRS each
  * blocking key admits — the quantity that decides whether the leg is a
  * linear predicate floor or super-linear pair growth:
  *
  *   base     part scan + blocking-key projection (noun, p_size, _len_b)
  *   census   + the maxBlock window-count guard (one shuffle on the key)
  *   pairs    + the self equi-join and id_a < id_b (candidate generation,
  *            NO distance predicate) — counted, not just timed
  *   pred     the full board entry (join + banded-Ukkonen ≤ 3 filter)
  *
  * Run at both SFs; pair counts at sf0.01 vs sf0.1 give the growth
  * exponent directly (the blocking key's value space is FIXED — dbgen's
  * 92-word p_name vocabulary × p_size × the length tier — so block
  * occupancy rises linearly with the corpus and within-block pairs grow
  * ~quadratically once occupancy passes 1):
  *
  *   sbt "Test/runMain graft.FuzzyProfile [sfDir] [passes] [blockKey]"
  *
  * blockKey: `noun` (the pre-round-15 board key) or `noun2` (round 15's
  * tightened two-token key) — both measured so the fix's pair-count win
  * is recorded from the same harness.
  */
object FuzzyProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = math.max(1, args.lift(1).flatMap(_.toIntOption).getOrElse(2))
    val twoTok = args.lift(2).contains("noun2")
    val spark = graft.core.SparkSessionFactory.local("graft-bench")

    // the board entry's input projection (EventGraphQueries d17)
    def p0 = {
      val base = Tables(spark, sfDir).part
        .select(col("p_partkey"), col("p_name"),
          element_at(split(col("p_name"), " "), 2).as("noun"), col("p_size"))
      if (twoTok) base.withColumn("noun2", element_at(split(col("p_name"), " "), 3))
      else base
    }
    val blockCols = if (twoTok) Seq("noun", "noun2", "p_size") else Seq("noun", "p_size")

    // FuzzyJoin.blockedLevenshtein's stages, mirrored 1:1 (maxDist 3,
    // maxBlock 1000, length tier div 8)
    def keyed = p0
      .withColumn("_len_b", expr("length(p_name) div 8"))
      .select((col("p_partkey").as("id") +: col("p_name").as("name") +:
        (blockCols :+ "_len_b").map(col)): _*)
    val allBlock = blockCols :+ "_len_b"
    def capped = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(allBlock.map(col): _*)
      keyed.withColumn("_bn", count(lit(1)).over(w)).filter(col("_bn") <= 1000).drop("_bn")
    }
    def candidates = {
      val b = capped
      val l = b.select((col("id").as("id_a") +: col("name").as("name_a") +: allBlock.map(col)): _*)
      val r = b.select((col("id").as("id_b") +: col("name").as("name_b") +: allBlock.map(col)): _*)
      l.join(r, allBlock).filter(col("id_a") < col("id_b"))
    }
    def full = graft.operators.FuzzyJoin.blockedLevenshtein(
      p0, "p_partkey", "p_name", blockCols, maxDist = 3, maxBlock = Some(1000))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(df: DataFrame): Unit = { df.queryExecution.toRdd.count(): Unit }

    val stages: Seq[(String, () => Unit)] = Seq(
      "base" -> (() => force(keyed)),
      "census" -> (() => force(capped)),
      "pairs" -> (() => force(candidates)),
      "pred" -> (() => force(full)))

    stages.foreach { case (_, f) => f() } // warmup, mirroring Bench
    val rows = (1 to passes).map { p =>
      p -> stages.map { case (name, f) => name -> time(f()) }
    }
    println(f"${"pass"}%-6s" + stages.map(s => f"${s._1}%11s").mkString)
    rows.foreach { case (p, ts) =>
      println(f"$p%-6d" + ts.map(t => f"${t._2}%11.2f").mkString)
    }
    val mins = stages.map { case (name, _) =>
      name -> rows.map(_._2.toMap.apply(name)).min }
    println(f"${"min"}%-6s" + mins.map(t => f"${t._2}%11.2f").mkString)

    // growth observables: corpus rows, distinct blocks, occupancy
    // distribution, candidate pairs, matched pairs
    val n = keyed.count()
    val occ = keyed.groupBy(allBlock.map(col): _*).count()
      .agg(count(lit(1)).as("blocks"), max("count").as("max_occ"),
        sum(expr("count * (count - 1) / 2")).as("pairs_theoretical"))
      .collect()(0)
    val cand = candidates.count()
    val matched = full.count()
    println(s"key=${if (twoTok) "noun2" else "noun"} rows=$n blocks=${occ.getLong(0)} " +
      s"max_occ=${occ.getLong(1)} pairs_theoretical=${occ.getDouble(2).toLong} " +
      s"candidates=$cand matched=$matched")
    spark.stop()
  }
}
