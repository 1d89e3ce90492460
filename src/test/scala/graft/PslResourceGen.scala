package graft

import java.nio.file.{Files, Paths}

import graft.functions.PublicSuffixes

/** Regenerates `src/main/resources/public_suffixes.txt` from the literal
  * fallback Seqs in [[PublicSuffixes]] — the committed resource the
  * broadcast registrable-domain path loads. Run after editing the
  * snapshot Seqs (or replace the file with a filtered full
  * publicsuffix.org list — same source-list syntax; the parser enforces
  * the supported rule shapes loudly). UrlFunctionsSpec pins
  * resource == literals, so a desync fails the build either way.
  *
  * Run: sbt "Test/runMain graft.PslResourceGen"
  */
object PslResourceGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/public_suffixes.txt")
    val s = PublicSuffixes.literalSnapshot
    val body = new StringBuilder
    body ++= "// graft public-suffix snapshot (publicsuffix.org source-list syntax:\n"
    body ++= "// one rule per line, '//' comments, '*.tld' wildcards, '!name' exceptions).\n"
    body ++= "// Compact crawl-volume subset — see PublicSuffixes.scala scope note.\n"
    body ++= "// REGENERATE from the literal Seqs:  sbt \"Test/runMain graft.PslResourceGen\"\n"
    body ++= "// or swap in the FULL downloaded publicsuffix.org list as-is (since\n"
    body ++= "// round 13 the parser and both promotion paths accept every rule depth\n"
    body ++= "// the real list contains). Wave11Spec pins this file == the literal Seqs.\n"
    body ++= "\n// --- 2-label public suffixes ---\n"
    s.suffixes2.foreach(r => body ++= s"$r\n")
    body ++= "\n// --- 3-label public suffixes ---\n"
    s.suffixes3.foreach(r => body ++= s"$r\n")
    body ++= "\n// --- wildcard TLD rules ---\n"
    s.wildcardTlds.foreach(t => body ++= s"*.$t\n")
    body ++= "\n// --- exception rules ---\n"
    s.exceptions.foreach(e => body ++= s"!$e\n")
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), body.toString)
    println(s"[psl] wrote $out (${s.suffixes2.size} 2-label, ${s.suffixes3.size} 3-label, " +
      s"${s.wildcardTlds.size} wildcard, ${s.exceptions.size} exception rules)")
  }
}
