package graft.functions

/** Compact public-suffix snapshot (S9 seed pattern: versioned reference
  * data shipped with the library, not fetched at runtime).
  *
  * Source: the public suffix list (publicsuffix.org, Mozilla-maintained,
  * MPL) — the public registry of suffixes under which names are
  * registered one label deeper, so `bbc.co.uk` and `itv.co.uk` are
  * DIFFERENT registrable domains while `a.example.com` and
  * `b.example.com` share one. A last-two-labels rule merges every
  * `.co.uk` site into one "domain" — the wrong key for per-domain quotas
  * (x18) and crawl dedup on any real corpus.
  *
  * Two snapshots ship:
  *
  *   - the RESOURCE ([[fromResource]], `public_suffixes.txt`): since
  *     round 14 the verbatim FULL publicsuffix.org list (~9.5k rules —
  *     literals at depths 2-5, wildcard bases at depths 1-4, exceptions
  *     at 2-3). The production broadcast-join path and the t24/t25 SQL
  *     oracles both derive from it.
  *   - the LITERAL Seqs below ([[literalSnapshot]]): the compact curated
  *     subset (high-crawl-share ccTLD tiers + the wildcard/exception
  *     shapes), kept as the inline-`IN`-list default of
  *     [[UrlFunctions.registrableDomainPsl]] — the full list belongs in
  *     broadcast seed frames, not in every task's expression tree — and
  *     as the fixture vocabulary of the planted url universes.
  *
  * [[parse]] and both promotion paths handle EVERY rule depth the real
  * list contains (round 13). Every 1-label TLD is implicitly a public
  * suffix — that is the 2-label fallback rule, not a list entry.
  */
object PublicSuffixes {

  /** 2-label public suffixes: registration happens at label 3. */
  val suffixes2: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz", "geek.nz",
    // Japan
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    // South Korea
    "co.kr", "or.kr", "ne.kr", "re.kr", "pe.kr", "go.kr", "ac.kr", "hs.kr", "ms.kr",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br", "eco.br",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // Taiwan / Hong Kong / Singapore / Malaysia
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    // Indonesia / Thailand / Vietnam / Philippines
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "net.id", "my.id",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th", "mi.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "ac.vn", "biz.vn", "info.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph",
    // South Africa / Kenya / Nigeria / Egypt
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
    "com.ng", "org.ng", "gov.ng", "edu.ng", "net.ng", "sch.ng",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg",
    // Middle East
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "sch.sa",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "av.tr", "bel.tr", "k12.tr",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "gok.pk", "gop.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd", "mil.bd",
    // Latin America
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co", "mil.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "nom.pe", "mil.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "web.ve", "info.ve",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "fin.ec", "med.ec",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "sld.do", "web.do",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt",
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "coop.py", "mil.py",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo",
    "co.cr", "or.cr", "ac.cr", "fi.cr", "go.cr", "ed.cr", "sa.cr",
    // Europe (ccTLDs with active second-level registries)
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "waw.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "publ.pt",
    "com.ro", "org.ro", "nom.ro", "info.ro", "rec.ro", "store.ro",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu"
  )

  /** 3-label public suffixes: registration happens at label 4. Australian
    * state second-level domains under edu.au/gov.au, and the US
    * locality pattern `k12/cc/lib.<state>.us` for the most populous
    * states (same compact-snapshot scope rule as [[suffixes2]]). */
  val suffixes3: Seq[String] = {
    val auStates = Seq("act", "nsw", "nt", "qld", "sa", "tas", "vic", "wa")
    val usStates = Seq("ca", "tx", "fl", "ny", "pa", "il", "oh", "ga", "nc",
      "mi", "nj", "va", "wa", "az", "ma", "tn", "in", "mo", "md", "wi")
    auStates.flatMap(s => Seq(s"$s.edu.au", s"$s.gov.au")) ++
      usStates.flatMap(s => Seq(s"k12.$s.us", s"cc.$s.us", s"lib.$s.us"))
  }

  /** Wildcard TLD rules (`*.<tld>`): every 2-label name directly under
    * the TLD is itself a public suffix, so registration happens at label
    * 3 even though no explicit 2-label entry exists. */
  val wildcardTlds: Seq[String] = Seq("bd", "ck", "er", "fk", "jm", "np", "pg")

  /** Exception rules (`!name` in the source list): names a wildcard rule
    * would otherwise swallow that ARE registrable. */
  val exceptions: Seq[String] = Seq("www.ck")

  /** A parsed suffix snapshot in the GENERAL form (round 13): rules keyed
    * by depth, so the promotion machinery
    * ([[graft.functions.UrlFunctions.withRegistrableDomainFromHost]] /
    * [[graft.functions.UrlFunctions.registrableDomainPsl]]) handles every
    * rule shape the real publicsuffix.org list contains — 4-/5-label
    * literals (`pvt.k12.ma.us`, `s3.cn-north-1.amazonaws.com.cn`-class),
    * deep wildcards (`*.kawasaki.jp`) and deep exceptions
    * (`!city.kawasaki.jp`) — not just the compact snapshot's tiers.
    *
    *   - `suffixesByDepth(k)`: literal rules with k labels (k ≥ 2) —
    *     a matching host registers one label deeper (last k+1 labels);
    *   - `wildcardBasesByDepth(b)`: bases of `*.base` rules with b labels
    *     (b ≥ 1; `*.ck` → base "ck" at b=1) — every (b+1)-label name
    *     under the base is a public suffix, so a matching host registers
    *     at the last b+2 labels;
    *   - `exceptionsByDepth(k)`: `!name` rules with k labels — the PSL
    *     algorithm gives exceptions absolute precedence, and a matching
    *     host keys to the exception name itself (last k labels).
    *
    * The named accessors keep the compact-snapshot call sites and the
    * SQL-oracle splices (t24/t25 inline them as IN lists) stable. */
  final case class Snapshot(
      suffixesByDepth: Map[Int, Seq[String]],
      wildcardBasesByDepth: Map[Int, Seq[String]],
      exceptionsByDepth: Map[Int, Seq[String]]) {
    def suffixes2: Seq[String] = suffixesByDepth.getOrElse(2, Nil)
    def suffixes3: Seq[String] = suffixesByDepth.getOrElse(3, Nil)
    def wildcardTlds: Seq[String] = wildcardBasesByDepth.getOrElse(1, Nil)
    def exceptions: Seq[String] =
      exceptionsByDepth.toSeq.sortBy(_._1).flatMap(_._2)
    /** Deepest label count any rule can promote a host to (the longest
      * registrable domain this snapshot can produce). ≥ 3 even when empty
      * (the 2-label suffix fallback promotes to 3). */
    def maxRegistrableLabels: Int =
      ((suffixesByDepth.keysIterator.map(_ + 1) ++
        wildcardBasesByDepth.keysIterator.map(_ + 2) ++
        exceptionsByDepth.keysIterator ++ Iterator(3)).max)
  }

  /** The literal fallback Seqs above as a [[Snapshot]] — the form the
    * SQL-oracle splices (t24/t25 inline these as VALUES/IN lists) and the
    * inline-Column path ([[UrlFunctions.registrableDomainPsl]]) compiles. */
  def literalSnapshot: Snapshot = Snapshot(
    Map(2 -> suffixes2, 3 -> suffixes3),
    Map(1 -> wildcardTlds),
    Map(2 -> exceptions))

  /** Parse public-suffix SOURCE-LIST format (publicsuffix.org syntax:
    * one rule per line read up to the first whitespace, `//` comments,
    * `*.base` wildcards, `!name` exceptions) into depth-keyed tiers.
    * Since round 13 EVERY rule depth the real list contains is accepted
    * — the full downloaded publicsuffix.org snapshot round-trips as-is.
    * Malformed shapes the PSL grammar itself forbids still fail loudly:
    *
    *   - 1-label rules are SKIPPED: every bare TLD is implicitly a public
    *     suffix (the 2-label fallback), so listing them adds nothing;
    *   - wildcards must be a single LEADING `*.` (the list has never
    *     contained mid-rule or multi-star forms; accepting one silently
    *     would mis-key every host under it);
    *   - exceptions must carry ≥ 2 labels and no '*'. */
  def parse(lines: Iterator[String]): Snapshot = {
    import scala.collection.mutable
    val sfx, wild, exc = mutable.SortedMap.empty[Int, mutable.Builder[String, Seq[String]]]
    def add(m: mutable.SortedMap[Int, mutable.Builder[String, Seq[String]]],
        depth: Int, rule: String): Unit =
      m.getOrElseUpdate(depth, Seq.newBuilder[String]) += rule
    // a rule line ends at the first whitespace (official list format —
    // some mirrors carry trailing annotations)
    lines.map(_.trim.takeWhile(!_.isWhitespace)).filter(l => l.nonEmpty && !l.startsWith("//")).foreach { l =>
      if (l.startsWith("!")) {
        val name = l.substring(1)
        require(name.count(_ == '.') >= 1 && !name.contains('*'),
          s"malformed exception rule (need >= 2 labels, no '*'): '$l'")
        add(exc, name.count(_ == '.') + 1, name)
      } else if (l.startsWith("*.")) {
        val base = l.substring(2)
        require(base.nonEmpty && !base.contains('*'),
          s"malformed wildcard rule (single leading '*.' only): '$l'")
        add(wild, base.count(_ == '.') + 1, base)
      } else {
        require(!l.contains('*'), s"malformed rule (mid-rule '*'): '$l'")
        l.count(_ == '.') match {
          case 0 => () // bare TLD: covered by the implicit 2-label fallback
          case n => add(sfx, n + 1, l)
        }
      }
    }
    // .distinct per tier: the contract is "swap in the full downloaded
    // list as-is", and a duplicated rule line would otherwise become
    // duplicate seed-frame rows whose broadcast left-joins silently
    // MULTIPLY matching corpus rows (round-13 advice finding)
    def freeze(m: mutable.SortedMap[Int, mutable.Builder[String, Seq[String]]]) =
      m.iterator.map { case (k, b) => k -> b.result().distinct }.toMap
    Snapshot(freeze(sfx), freeze(wild), freeze(exc))
  }

  /** The COMMITTED resource snapshot (`src/main/resources/public_suffixes.txt`)
    * — since round 14 the VERBATIM full publicsuffix.org list (the
    * round-13 parser generality made the swap a data-file edit; this
    * copy is the Debian `publicsuffix` package's
    * `/usr/share/publicsuffix/public_suffix_list.dat`, MPL-2.0, header
    * retained in the file). It is the production input of the
    * broadcast-join path AND the single source the t24/t25 SQL oracles
    * replay from (TextQueries dumps the parsed tiers to a parquet
    * fixture the DuckDB side joins — both engines read one snapshot, so
    * they can never desynchronize silently; Wave11Spec pins the
    * full-list shape and the compact [[literalSnapshot]]'s planted-
    * universe tiers being present). */
  lazy val fromResource: Snapshot = {
    val in = Option(getClass.getResourceAsStream("/public_suffixes.txt"))
      .getOrElse(throw new IllegalStateException(
        "public_suffixes.txt missing from the classpath — the broadcast " +
          "registrable-domain path has no suffix snapshot"))
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try parse(src.getLines()) finally src.close()
    } finally in.close()
  }
}
