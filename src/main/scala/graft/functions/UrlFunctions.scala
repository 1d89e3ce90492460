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

  /** PSL-aware registrable domain as a pure Column — the publicsuffix.org
    * algorithm over a depth-keyed [[PublicSuffixes.Snapshot]] (since
    * round 13 EVERY rule depth the real list contains), most specific
    * rule first:
    *
    *   1. exception rules (`!www.ck`, `!city.kawasaki.jp`), deepest
    *      first — absolute precedence per the PSL algorithm: a name a
    *      wildcard would otherwise swallow IS registrable, and any host
    *      ending there keys to the exception name itself;
    *   2. for each rule depth L from deepest down to 2: a host whose
    *      last L labels are a literal suffix (`co.uk` at L=2,
    *      `act.edu.au` at L=3, `pvt.k12.ma.us` at L=4, ...) OR whose
    *      last L−1 labels are a wildcard base (`*.ck` at L=2,
    *      `*.kawasaki.jp` at L=3) registers one label deeper → last L+1
    *      labels, when present;
    *   3. fallback: last two labels (every bare TLD is implicitly a
    *      public suffix).
    *
    * A host that IS a bare public suffix (`co.uk`, `act.edu.au`,
    * `foo.kawasaki.jp` under `*.kawasaki.jp`) keys to ITSELF rather than
    * returning '' (the official algorithm's "no registrable domain") —
    * such hosts don't occur as page hosts on a real crawl, and '' would
    * silently merge them all. Since round 14 the self-key is explicit in
    * the tier branch (a hit with no deeper label present keys to the
    * matched suffix), closing the round-13 advice finding where a
    * wildcard-DERIVED bare suffix fell through to the wildcard base
    * (merging foo/bar.kawasaki.jp) while literal-suffix hosts self-keyed
    * — one convention for every rule shape now.
    *
    * The suffix tests compile to `IN` lists over the snapshot —
    * map-side O(1), fine at the committed snapshot size. For the FULL
    * ~9k-entry PSL, prefer [[withRegistrableDomain]]: broadcast joins
    * keep the lists out of the generated code and off every task's
    * expression tree. */
  def registrableDomainPsl(
      url: Column,
      snap: PublicSuffixes.Snapshot = PublicSuffixes.literalSnapshot): Column = {
    val host = urlHost(url)
    val last = (1 to snap.maxRegistrableLabels).map(k => k -> lastLabels(host, k)).toMap
    // exceptions carry absolute precedence (PSL algorithm), deepest first
    val excWhens = snap.exceptionsByDepth.toSeq.sortBy(-_._1).collect {
      case (k, names) if names.nonEmpty => (last(k).isin(names: _*), last(k))
    }
    // tier L = "the host's last L labels are a public suffix": literal
    // L-label rule, or wildcard base at L-1 (*.base makes every L-label
    // name under it a suffix). A hit registers one label deeper.
    val maxRuleDepth = (snap.suffixesByDepth.keySet ++
      snap.wildcardBasesByDepth.keySet.map(_ + 1) + 2).max
    val tierWhens = (maxRuleDepth to 2 by -1).flatMap { l =>
      val lit = snap.suffixesByDepth.getOrElse(l, Nil)
      val wild = snap.wildcardBasesByDepth.getOrElse(l - 1, Nil)
      val hit = (Option.when(lit.nonEmpty)(last(l).isin(lit: _*)) ++
        Option.when(wild.nonEmpty)(last(l - 1).isin(wild: _*)))
        .reduceOption(_ || _)
      // `last(l) =!= ""` guards the wildcard arm: a host that merely IS
      // the wildcard base (kawasaki.jp itself, L-1 labels) matches the
      // base test but has no L-label suffix — it must fall through, not
      // self-key to ''. A literal hit implies last(l) nonempty already.
      // A hit with no deeper label means the host IS the public suffix:
      // key it to itself (same convention every rule shape).
      hit.map(h => (last(l) =!= "" && h,
        when(last(l + 1) =!= "", last(l + 1)).otherwise(last(l))))
    }
    (excWhens ++ tierWhens)
      .foldRight(last(2)) { case ((cond, value), rest) => when(cond, value).otherwise(rest) }
  }

  /** Last k dot-labels of a host as a Column ('' when the host has fewer
    * than k labels or ends in a dot) — the probe key every PSL tier
    * matches on. */
  private[functions] def lastLabels(host: Column, k: Int): Column =
    regexp_extract(host, "(" + Seq.fill(k)("[^.]+").mkString("\\.") + ")$", 1)

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
      out: String = "domain",
      snapshot: Option[PublicSuffixes.Snapshot] = None): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // RESOURCE-driven snapshot (src/main/resources/public_suffixes.txt)
    // by default: the production path's suffix universe is a committed
    // data file, so full-PSL growth never edits Scala literals.
    // Spec-pinned equal to the literal fallback the oracles splice
    // (Wave11Spec); Wave12Spec drives a full-list-shaped snapshot with
    // 4-/5-label literals and deep wildcards through this same path.
    val snap = snapshot.getOrElse(PublicSuffixes.fromResource)
    // list-shaped tiers (literal suffixes at every depth, wildcard bases
    // of >= 2 labels — hundreds of amazonaws/JP-city entries on the full
    // list) are broadcast seed frames: the corpus side never moves, each
    // probe is a map-side hash lookup. The wildcard-TLD and exception
    // tiers stay inline IN lists — single digits even on the full list.
    val maxLabels = snap.maxRegistrableLabels
    def lastCol(k: Int) = s"__rd_last$k"
    var cur = (1 to maxLabels).foldLeft(df) { (d, k) =>
      d.withColumn(lastCol(k), lastLabels(hostCol, k))
    }
    def markCol(kind: String, depth: Int) = s"__rd_${kind}_$depth"
    val litDepths = snap.suffixesByDepth.collect { case (k, v) if v.nonEmpty => k }.toSeq.sorted
    val wildDepths = snap.wildcardBasesByDepth
      .collect { case (b, v) if b >= 2 && v.nonEmpty => b }.toSeq.sorted
    for (k <- litDepths) {
      val seed = snap.suffixesByDepth(k).toDF(markCol("sfx", k))
      cur = cur.join(broadcast(seed), col(lastCol(k)) === col(markCol("sfx", k)), "left")
    }
    for (b <- wildDepths) {
      val seed = snap.wildcardBasesByDepth(b).toDF(markCol("wc", b))
      cur = cur.join(broadcast(seed), col(lastCol(b)) === col(markCol("wc", b)), "left")
    }
    // verdict CASE mirrors registrableDomainPsl: exceptions (deepest
    // first), then tier L from deepest down, then the last2 fallback
    val excWhens = snap.exceptionsByDepth.toSeq.sortBy(-_._1).collect {
      case (k, names) if names.nonEmpty =>
        (col(lastCol(k)).isin(names: _*), col(lastCol(k)))
    }
    val maxRuleDepth = (snap.suffixesByDepth.keySet ++
      snap.wildcardBasesByDepth.keySet.map(_ + 1) + 2).max
    val tierWhens = (maxRuleDepth to 2 by -1).flatMap { l =>
      val lit = Option.when(litDepths.contains(l))(col(markCol("sfx", l)).isNotNull)
      val wcDeep = Option.when(wildDepths.contains(l - 1))(col(markCol("wc", l - 1)).isNotNull)
      val wc1 = Option.when(l == 2 && snap.wildcardTlds.nonEmpty)(
        col(lastCol(1)).isin(snap.wildcardTlds: _*))
      // same tier branch as registrableDomainPsl: `lastCol(l) =!= ""`
      // guards a host that merely IS a wildcard base (no L-label suffix
      // exists); a hit with no deeper label self-keys — the host IS the
      // public suffix, one convention for every rule shape (round 14)
      (lit ++ wcDeep ++ wc1).reduceOption(_ || _)
        .map(h => (col(lastCol(l)) =!= "" && h,
          when(col(lastCol(l + 1)) =!= "", col(lastCol(l + 1))).otherwise(col(lastCol(l)))))
    }
    val verdict = (excWhens ++ tierWhens)
      .foldRight(col(lastCol(2))) { case ((cond, value), rest) => when(cond, value).otherwise(rest) }
    cur.withColumn(out, verdict)
      .drop((1 to maxLabels).map(lastCol) ++
        litDepths.map(markCol("sfx", _)) ++ wildDepths.map(markCol("wc", _)): _*)
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
