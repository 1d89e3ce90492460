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

  private def hostPort(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)

  /** Case-folded host, port and leading `www.` runs stripped (`(www\.)+`
    * — real crawls stack them, and a single-strip would break
    * [[canonicalizeUrl]]'s idempotence contract on `www.www.` hosts). */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_replace(hostPort(url), ":\\d+$", "")), "^(www\\.)+", "")

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
    * approximation (a real public-suffix list is a broadcast lookup
    * joined on the host suffix; out of scope for the synthetic corpus). */
  def registrableDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)

  /** The canonical url: lowercased scheme and host, `www.` and fragment
    * dropped, scheme-default port stripped (https:443 / http:80 — an
    * explicit NON-default port is load-bearing and survives), tracking
    * params removed, trailing '?' elided when the query empties.
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
