package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Wall-time attribution for t18_repetition_filter — the leg the round-12
  * verdict flagged as closest to the ×10 scale ceiling (gated 8.47 on a
  * 1.50 s base). Rebuilds the ROUND-12 plan shape (explode → wide
  * (doc_id, n, gram) exchange → two keyed reductions → join back) and
  * forces successive plan prefixes so the deltas attribute the wall:
  *
  *   scan      documents scan + split(text) projection
  *   explode   + 2-gram/3-gram struct explode (map-side, pre-shuffle)
  *   count     + the wide groupBy(doc_id, n_chars, n, g) count — the ONE
  *             shuffle whose volume is ~2 rows per corpus word
  *   top       + per-(doc, n) struct-max reduction (second exchange)
  *   full_old  + pivot + left-join-back (the complete round-12 query)
  *
  * and times the replacement beside it:
  *
  *   full_new  the round-13 zero-shuffle plans/TopRepeatedGram map
  *             (one boundary scan + hash count + max scan per document)
  *
  * Each stage is forced via queryExecution.toRdd.count() — every output
  * column materializes (a .count() would let Catalyst prune the gram
  * strings), nothing is retained. Stage times are cumulative by
  * construction; attribute by delta. Run both tables into BASELINE.md:
  *
  *   sbt "Test/runMain graft.T18Profile [sfDir] [passes]"
  *     (sf0.1 default; pass /tmp/graft_sf1_r9 for the ×10 attribution)
  */
object T18Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = math.max(1, args.lift(1).flatMap(_.toIntOption).getOrElse(2))
    val spark = graft.core.SparkSessionFactory.local("graft-bench")

    // ---- the round-12 shape, stage by stage (kept verbatim here so the
    // attribution survives the production rewrite) ----------------------
    def gramsOf(n: Int) =
      when(size(col("w")) >= n,
        transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("w"), i + k)): _*)))
        .otherwise(array().cast("array<string>"))
    def base = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("w"))
    def exploded = base
      .select(col("doc_id"), col("n_chars"),
        explode(concat(
          transform(gramsOf(2), g => struct(lit(2).as("n"), g.as("g"))),
          transform(gramsOf(3), g => struct(lit(3).as("n"), g.as("g"))))).as("ng"))
    def counted = exploded
      .groupBy(col("doc_id"), col("n_chars"), col("ng.n").as("n"), col("ng.g").as("g"))
      .agg(count(lit(1)).as("cnt"))
    def top = counted
      .groupBy("doc_id", "n_chars", "n")
      .agg(max(struct(col("cnt"), col("g"))).as("t"))
      .select(col("doc_id"), col("n"), col("t.g").as("g"),
        (col("t.cnt") * length(col("t.g")).cast("double") / col("n_chars")).as("frac"))
    def fullOld = {
      val pivoted = top.groupBy("doc_id").agg(
        max(when(col("n") === 2, col("g"))).as("top_2gram"),
        max(when(col("n") === 2, col("frac"))).as("top_2gram_char_frac"),
        max(when(col("n") === 3, col("g"))).as("top_3gram"),
        max(when(col("n") === 3, col("frac"))).as("top_3gram_char_frac"))
      Tables(spark, sfDir).documents.select(col("doc_id"))
        .join(pivoted, Seq("doc_id"), "left")
        .select(col("doc_id"), col("top_2gram"), col("top_2gram_char_frac"),
          col("top_3gram"), col("top_3gram_char_frac"),
          (coalesce(col("top_2gram_char_frac") <= 0.20, lit(true)) &&
            coalesce(col("top_3gram_char_frac") <= 0.18, lit(true))).as("keep"))
    }
    def fullNew = graft.queries.TextQueries.queries("t18_repetition_filter")(spark, sfDir)

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "scan" -> (() => base),
      "explode" -> (() => exploded),
      "count" -> (() => counted),
      "top" -> (() => top),
      "full_old" -> (() => fullOld),
      "full_new" -> (() => fullNew))

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count(): Unit
      (System.nanoTime() - t0) / 1e9
    }

    // warmup pass (untimed), mirroring Bench
    stages.foreach { case (_, f) => time(f()): Unit }
    val rows = (1 to passes).map { p =>
      p -> stages.map { case (name, f) => name -> time(f()) }
    }
    println(f"${"pass"}%-6s" + stages.map(s => f"${s._1}%10s").mkString)
    rows.foreach { case (p, ts) =>
      println(f"$p%-6d" + ts.map(t => f"${t._2}%10.2f").mkString)
    }
    // per-stage MIN across passes (steal-burst discipline), plus deltas
    val mins = stages.map { case (name, _) =>
      name -> rows.map(_._2.toMap.apply(name)).min }
    println(f"${"min"}%-6s" + mins.map(t => f"${t._2}%10.2f").mkString)
    val deltas = mins.sliding(2).collect {
      case Seq((_, a), (n, b)) if n != "full_new" => n -> (b - a) }.toSeq
    println("deltas (cumulative-stage attribution): "
      + deltas.map { case (n, d) => f"$n=+$d%.2fs" }.mkString(", ")
      + f"; full_new=${mins.toMap.apply("full_new")}%.2fs vs full_old=${mins.toMap.apply("full_old")}%.2fs")
    spark.stop()
  }
}
