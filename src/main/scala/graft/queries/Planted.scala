package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** A planted-fixture expression built ONCE for both engines: the Spark
  * Column and its DuckDB-SQL rendering travel together, so a fixture's
  * construction can never desynchronize between a board query and its
  * oracle — the release checklist's shared-builder rule (the
  * plantedUrl/pslUrl precedent), generalized past pure concat shapes
  * (CASE-per-residue-class, upper, replace-all) so t26/t27/d19-class
  * fixtures have exactly one construction site.
  *
  * Rendering contracts both engines share: `||` concat, `chr()` for the
  * code points the Scala side plants as `\u` literals, replace-all via
  * regexp_replace (Spark default / DuckDB 'g' flag), `doc_id div n` ==
  * `doc_id // n` on non-negative ids, CASE evaluation order. Combinators
  * reject inputs that would break the SQL rendering (quotes in
  * literals/patterns) loudly.
  */
final case class Planted(col: Column, sql: String) {

  /** Concat — both sides. */
  def ||(o: Planted): Planted =
    Planted(F.concat(col, o.col), s"$sql || ${o.sql}")
}

object Planted {

  private def checkSqlSafe(s: String, what: String): Unit =
    require(!s.contains("'") && !s.contains("\\"),
      s"$what must not contain quotes/backslashes (SQL rendering): '$s'")

  /** A visible string literal. Invisible/control characters must go
    * through [[chr]] — a raw invisible here would silently render as an
    * editor-hostile literal inside the oracle SQL. */
  def lit(s: String): Planted = {
    checkSqlSafe(s, "planted literal")
    require(s.forall(c => c >= ' ' && c <= '~'),
      s"non-ASCII/control char in planted literal — use Planted.chr: '$s'")
    Planted(F.lit(s), s"'$s'")
  }

  val empty: Planted = Planted(F.lit(""), "''")

  /** One code point: a `\u`-style literal on the Spark side, `chr()` in
    * SQL (the t27 precedent — BOM 65279, ZWSP 8203, NBSP 160, ...). */
  def chr(codePoint: Int): Planted =
    Planted(F.lit(new String(Character.toChars(codePoint))), s"chr($codePoint)")

  /** CAST(doc_id AS VARCHAR). */
  val idStr: Planted =
    Planted(F.col("doc_id").cast("string"), "CAST(doc_id AS VARCHAR)")

  /** CAST(doc_id div n AS VARCHAR) — `//` in DuckDB; identical on the
    * non-negative ids the testdata carries. */
  def idDivStr(n: Int): Planted = Planted(
    F.expr(s"doc_id div $n").cast("string"),
    s"CAST(doc_id // $n AS VARCHAR)")

  /** CASE WHEN doc_id % m = r THEN t ELSE e END. */
  def whenMod(m: Int, r: Int)(t: Planted, e: Planted): Planted = Planted(
    F.when(F.col("doc_id") % m === r, t.col).otherwise(e.col),
    s"(CASE WHEN doc_id % $m = $r THEN ${t.sql} ELSE ${e.sql} END)")

  /** CASE doc_id % m WHEN r1 THEN p1 ... ELSE default END. */
  def caseMod(m: Int)(branches: (Int, Planted)*)(default: Planted): Planted = {
    require(branches.nonEmpty)
    val c = branches.tail
      .foldLeft(F.when(F.col("doc_id") % m === branches.head._1, branches.head._2.col)) {
        case (acc, (r, p)) => acc.when(F.col("doc_id") % m === r, p.col)
      }
      .otherwise(default.col)
    val sqlBranches = branches.map { case (r, p) => s"WHEN $r THEN ${p.sql}" }.mkString(" ")
    Planted(c, s"(CASE doc_id % $m $sqlBranches ELSE ${default.sql} END)")
  }

  def upper(p: Planted): Planted =
    Planted(F.upper(p.col), s"upper(${p.sql})")

  /** Replace EVERY match (Spark's regexp_replace default; DuckDB needs
    * the explicit 'g' flag — the round-10 gotcha this builder pins). The
    * replacement is itself a [[Planted]], so `chr()` replacements render
    * correctly on both sides. Pattern must sit in the RE2∩Java subset
    * like every other oracle pattern. */
  def replaceAll(p: Planted, pattern: String, rep: Planted): Planted = {
    checkSqlSafe(pattern, "planted replace pattern")
    Planted(
      F.regexp_replace(p.col, F.lit(pattern), rep.col),
      s"regexp_replace(${p.sql}, '$pattern', ${rep.sql}, 'g')")
  }
}
