package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (builder-side quick
    // iteration — the driver always runs the full board)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    // int64-micros parquet timestamps (factory default) matter here: the
    // driver's DuckDB/pyarrow read must see exactly what DuckDB's SQL produces
    val spark = graft.core.SparkSessionFactory.local("graft-verify", defaultCpus = 4)
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ListBuffer.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // self-explaining correctness artifact: the rows-only dozen with their
    // pinning evidence rides along, so a reader of the driver's artifact
    // never needs the COVERAGE.md cross-reference (same content as the
    // committed ROWS_ONLY.json, spec-enforced in sync)
    Files.writeString(Paths.get(s"$outDir/rows_only.json"), SparkEntry.rowsOnlyJson)
    // Loud failures: a query that errors must not silently vanish from the
    // round's correctness artifact (round 4 lost 4 entries that way). The
    // driver ignores unknown files, so this is purely additive signal.
    val failedJson = failed
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failed.json"), failedJson)
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} FAILED: ${failed.map(_._1).mkString(", ")}")
    spark.stop()
  }
}
