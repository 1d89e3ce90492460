package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation: the dedup key for a
  * crawled corpus is the CANONICAL url — case-folded scheme/host,
  * default ports and fragments stripped, tracking params dropped — not
  * the raw string (the same page arrives under thousands of utm-tagged
  * spellings). Pure regexp/higher-order-function Columns: zero shuffles,
  * fully codegen'd, and every piece is replayable in a SQL-engine oracle
  * (Spark's own `parse_url` would be idiomatic but has no DuckDB
  * counterpart — the regexes below are the portable equivalent for
  * scheme://host[:port][/path][?query][#fragment] shapes).
  *
  * Dialect note: patterns stay in the RE2∩Java subset (anchors, character
  * classes, a single capture group) — the [[TextFunctions.PiiPatterns]]
  * contract.
  */
object UrlFunctions {

  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Authority minus userinfo: `user:pass@host:port` → `host:port`.
    * Credentials are client state, not page identity — keeping them would
    * split one page across per-credential dedup keys (and leak secrets
    * into the canonical url). The optional non-capturing `[^/?#]*@` is
    * greedy, so a malformed multi-`@` authority drops through the LAST
    * `@` (pinned in the Wave9 sweep). IPv6 bracket literals (`[::1]`)
    * flow through intact: `[` and `]` are not in the exclusion class. */
  private def hostPort(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#]+)", 1)

  /** Case-folded host, port stripped, leading `www.` runs stripped
    * (`(www\.)+` — real crawls stack them, and a single-strip would break
    * [[canonicalizeUrl]]'s idempotence contract on `www.www.` hosts).
    * The strip is BOUNDED, not all-or-nothing: when stripping every
    * `www.` would leave a single label, one `www.` is kept — so a host
    * that IS a www-prefixed registrable name survives (`www.com` stays
    * `www.com` instead of collapsing onto the TLD) AND its stacked
    * spellings converge onto it (`www.www.com` → `www.com`, the same
    * site under the stacked-www premise; an all-or-nothing guard would
    * leave those two as different dedup keys). A lookahead would express
    * this in one pattern but is outside the RE2∩Java contract (the
    * oracle replays these in an RE2 engine), hence the CASE. The port
    * strip's `:\d+$` anchor leaves portless IPv6 literals (`[::1]`)
    * untouched — their inner colons are never followed by trailing
    * digits-only. */
  def urlHost(url: Column): Column = {
    val noPort = lower(regexp_replace(hostPort(url), ":\\d+$", ""))
    val stripped = regexp_replace(noPort, "^(www\\.)+", "")
    when(stripped.contains("."), stripped)
      .when(noPort.startsWith("www."), concat(lit("www."), stripped))
      .otherwise(noPort)
  }

  /** Explicit port digits, empty string when absent. */
  def urlPort(url: Column): Column =
    regexp_extract(hostPort(url), ":(\\d+)$", 1)

  def urlPath(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Raw query string (no '?'), empty when absent; the fragment never
    * participates — it is client-side state, dropped by canonicalization.
    * The lazy pre-fragment anchor matters: a bare `\?([^#]*)` would match
    * a '?' INSIDE the fragment (`/page#sec?a=1`) and resurrect fragment
    * content as a query. */
  def urlQuery(url: Column): Column =
    regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)

  /** Query with tracking params removed (prefix list — utm_* is the
    * ubiquitous one), remaining params in original order: param order is
    * application-defined, so canonicalization must not re-sort it. */
  def cleanQuery(url: Column, trackingPrefix: String = "utm_"): Column =
    array_join(
      filter(split(urlQuery(url), "&"), p => !p.startsWith(trackingPrefix)),
      "&")

  /** Count of dropped tracking params (audit column for the scrub). */
  def trackingParamCount(url: Column, trackingPrefix: String = "utm_"): Column =
    size(filter(split(urlQuery(url), "&"), p => p.startsWith(trackingPrefix)))

  /** Last two dot-labels of the canonical host — a registrable-domain
    * approximation, kept as the list-free fallback. It is WRONG for
    * hosts under 2-label public suffixes (`bbc.co.uk` → `co.uk`, merging
    * every .co.uk site); use [[registrableDomainPsl]] /
    * [[withRegistrableDomain]] on real crawls. */
  def registrableDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)

  /** PSL-aware registrable domain as a pure Column — longest-match over
    * all four snapshot tiers, most specific first:
    *
    *   1. exception rule (`!www.ck`): the name a wildcard would swallow
    *      IS registrable — any host ending there keys to it (last2);
    *   2. 3-label suffix ([[PublicSuffixes.suffixes3]], `act.edu.au` /
    *      `k12.ma.us`-class) with a 4th label present → last FOUR labels;
    *   3. 2-label suffix ([[PublicSuffixes.suffixes2]]) OR wildcard TLD
    *      ([[PublicSuffixes.wildcardTlds]], `*.ck`-class — every 2-label
    *      name under the TLD is a public suffix) with a 3rd label
    *      present → last THREE labels;
    *   4. fallback: last two labels (every bare TLD is implicitly a
    *      public suffix).
    *
    * A host that IS a bare public suffix (`co.uk`, `act.edu.au` itself)
    * falls through to the next-shorter form rather than returning '' —
    * such hosts don't occur as page hosts on a real crawl, and '' would
    * silently merge them all.
    *
    * The suffix tests compile to `IN` lists over the snapshot —
    * map-side O(1), fine at this snapshot size. For the FULL 9k-entry
    * PSL, prefer [[withRegistrableDomain]]: broadcast joins keep the
    * lists out of the generated code and off every task's expression
    * tree. */
  def registrableDomainPsl(url: Column): Column = {
    val host = urlHost(url)
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val last4 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$", 1)
    val tld = regexp_extract(host, "([^.]+)$", 1)
    when(last2.isin(PublicSuffixes.exceptions: _*), last2)
      .when(last4 =!= "" && last3.isin(PublicSuffixes.suffixes3: _*), last4)
      .when(last3 =!= "" && (last2.isin(PublicSuffixes.suffixes2: _*) ||
        tld.isin(PublicSuffixes.wildcardTlds: _*)), last3)
      .otherwise(last2)
  }

  /** PSL-aware registrable domain via the scale-correct broadcast join:
    * the suffix snapshot becomes a seed frame (S9 pattern), the host's
    * last-2-labels key LEFT-joins it broadcast (suffix universe is
    * bounded; the corpus side never moves), and a hit promotes the
    * registrable domain to the last three labels. Same semantics as
    * [[registrableDomainPsl]]; this form is the one that holds with the
    * full public list at 100 TB. */
  def withRegistrableDomain(
      df: org.apache.spark.sql.DataFrame,
      urlCol: Column,
      out: String = "domain"): org.apache.spark.sql.DataFrame =
    withRegistrableDomainFromHost(df, urlHost(urlCol), out)

  /** [[withRegistrableDomain]] over an already-extracted host Column:
    * callers that also project the host (t24's shape) compute the
    * urlHost regexp chain ONCE and feed it here, instead of paying it
    * again inside the join projection — codegen cannot eliminate the
    * common subexpression across the join boundary. */
  def withRegistrableDomainFromHost(
      df: org.apache.spark.sql.DataFrame,
      hostCol: Column,
      out: String = "domain"): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // RESOURCE-driven snapshot (src/main/resources/public_suffixes.txt):
    // the production path's suffix universe is a committed data file, so
    // full-PSL growth never edits Scala literals. Spec-pinned equal to
    // the literal fallback the oracles splice (UrlFunctionsSpec).
    val snap = PublicSuffixes.fromResource
    // the two list-shaped tiers are broadcast seed frames (they grow with
    // the full PSL); the wildcard-TLD and exception tiers stay inline IN
    // lists — single-digit entries even on the full list
    val psl2 = snap.suffixes2.toDF("psl_suffix")
    val psl3 = snap.suffixes3.toDF("psl3_suffix")
    df.withColumn("__rd_last2", regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1))
      .withColumn("__rd_last3", regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .withColumn("__rd_last4",
        regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$", 1))
      .withColumn("__rd_tld", regexp_extract(hostCol, "([^.]+)$", 1))
      .join(broadcast(psl2), col("__rd_last2") === col("psl_suffix"), "left")
      .join(broadcast(psl3), col("__rd_last3") === col("psl3_suffix"), "left")
      .withColumn(out,
        when(col("__rd_last2").isin(snap.exceptions: _*), col("__rd_last2"))
          .when(col("psl3_suffix").isNotNull && col("__rd_last4") =!= "",
            col("__rd_last4"))
          .when((col("psl_suffix").isNotNull ||
              col("__rd_tld").isin(snap.wildcardTlds: _*)) &&
              col("__rd_last3") =!= "",
            col("__rd_last3"))
          .otherwise(col("__rd_last2")))
      .drop("__rd_last2", "__rd_last3", "__rd_last4", "__rd_tld",
        "psl_suffix", "psl3_suffix")
  }

  /** Domain-blocklist scrub (the C4/Dolma curation rule: drop every
    * document whose registrable domain is on a curated blocklist). The
    * blocklist is bounded reference data (even the big public ones are
    * ~10⁵ rows), so this is a broadcast LEFT ANTI join on the domain key
    * — the corpus side never shuffles and survivors stream through
    * map-side. Match on the REGISTRABLE domain, not the raw host:
    * blocklists name sites, and a per-host match would let
    * `evil.example.com` through when `example.com` is listed. */
  def filterBlockedDomains(
      df: org.apache.spark.sql.DataFrame,
      domainCol: Column,
      blocklist: Seq[String]): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val block = blocklist.toDF("blocked_domain")
    // dataset-qualified key: an unqualified col("blocked_domain") would be
    // ambiguous (or silently self-compare) if the caller's frame already
    // carries a column of that name
    df.join(broadcast(block), domainCol === block("blocked_domain"), "left_anti")
  }

  /** The canonical url: lowercased scheme and host, `www.`, userinfo and
    * fragment dropped, scheme-default port stripped (https:443 / http:80
    * — an explicit NON-default port is load-bearing and survives),
    * tracking params removed, trailing '?' elided when the query empties.
    * Percent-encoding case is PRESERVED (`%2F` ≠ `%2f` as dedup keys):
    * case-normalizing triplets needs a per-match transform no RE2∩Java
    * regexp_replace expresses, and over-merging is the costlier failure —
    * pinned in the Wave9 sweep rather than silently half-normalized.
    *
    * A string with no `scheme://` prefix passes through UNCHANGED: the
    * extractors all return '' on it, and assembling from empty parts
    * would collapse every malformed url onto shared garbage keys like
    * `"://"` — false dedup merges. Identity keeps malformed inputs
    * distinct and preserves idempotence (canon(u) = u there). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val port = urlPort(url)
    val keepPort = port =!= "" &&
      !((scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"))
    val q = cleanQuery(url)
    when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), urlHost(url),
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      urlPath(url),
      when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }
}
