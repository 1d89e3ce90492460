#!/usr/bin/env python3
"""Conservative changed-query detector for incremental round-closing legs.

Given the commit a previous (green) artifact was generated at, decide
which board queries could have changed behavior or cost since:

  FULL          any change outside the per-query layer — build config,
                core/plans/sources/functions/operators/streaming/em
                packages, top-level mains (Bench/Verify/SparkEntry), test
                resources — or a queries/ helper file that defines no
                board entries (e.g. Planted.scala: shared by many
                entries). Library-level changes can shift ANY plan, so
                everything re-runs.
  <name,list>   only files under src/main/scala/graft/queries/ that
                define board entries changed: re-run exactly the entries
                those files define (whole file, not a finer diff — a
                file-local helper edit must re-run its neighbors).
  (empty line)  no src/main change at all: a pure re-stamp round.

Prints one line: FULL, a comma-separated query list, or an empty line.
Exit 0 always (the caller branches on the output, not the code).

Usage: changed_queries.py <since_commit>
"""
import re
import subprocess
import sys


def sh(*cmd):
    return subprocess.check_output(cmd).decode()


def main():
    if len(sys.argv) != 2:
        sys.exit("usage: changed_queries.py <since_commit>")
    since = sys.argv[1]
    changed = set()
    # committed changes since the artifact's tree...
    changed.update(sh("git", "diff", "--name-only", since, "HEAD").split())
    # ...plus anything dirty in the working tree right now
    for line in sh("git", "status", "--porcelain", "--untracked-files=no").splitlines():
        changed.add(line[3:].split(" -> ")[-1])

    src = {c for c in changed if c.startswith("src/main/") or c == "build.sbt"
           or c.startswith("project/")}
    if not src:
        print("")
        return
    queries_files = {c for c in src if c.startswith("src/main/scala/graft/queries/")}
    if src - queries_files:
        print("FULL")
        return

    # Queries files splice each other's helpers (d19's oracle uses
    # TextQueries.unicodeScrubSql, st22's uses DedupQueries.minhashSigCtes),
    # so an edit must also re-run every file that REFERENCES the edited
    # file's object, transitively — otherwise the incremental legs carry
    # stale results for queries whose oracle/plan actually changed.
    import glob
    import os
    all_files = sorted(glob.glob("src/main/scala/graft/queries/*.scala"))
    texts = {f: open(f).read() for f in all_files}
    # index every top-level object/class/trait name a file defines, and
    # match BARE-word references, not just dotted ones: a class imported
    # bare (`import graft.queries.Helper` then `extends Helper`) or an
    # object renamed at import (`{TextQueries => TQ}`) never appears as
    # `Name.`, so the dotted-only closure carried stale results for
    # genuinely affected queries. Bare-word matching over-approximates
    # (a name in a comment re-runs a neighbor) — over-running is the
    # conservative direction for this detector.
    # definitions are extracted from STRING- then COMMENT-stripped code
    # with the keyword anchored at a declaration position — Scaladoc prose
    # like "the object is" otherwise yields junk names ("is", "with") that
    # make every file affected, and a '/*' INSIDE a string literal (a glob
    # like "SCALE_r*/*.json", a '/*+ ...' SQL hint in an oracle) would
    # otherwise swallow every declaration up to the next '*/', dropping
    # real dependencies from the closure. Strings go first: triple-quoted
    # blocks (the oracle SQL), then ordinary literals.
    def strip_comments(txt):
        txt = re.sub(r'"""[\s\S]*?"""', '""', txt)
        txt = re.sub(r'"(?:\\.|[^"\\\n])*"', '""', txt)
        return re.sub(r"//.*", "", re.sub(r"/\*.*?\*/", "", txt, flags=re.S))
    decl = re.compile(
        r"^\s*(?:(?:private|protected|final|case|abstract|sealed|implicit)"
        r"(?:\[\w+\])?\s+)*(?:object|class|trait)\s+(\w+)", re.M)
    obj_of = {}          # file -> top-level type/object names it defines
    for f, txt in texts.items():
        obj_of[f] = set(decl.findall(strip_comments(txt)))
    affected = set(queries_files)
    grew = True
    while grew:
        grew = False
        for f, txt in texts.items():
            if f in affected:
                continue
            for dep in list(affected):
                deleted_objs = obj_of.get(dep)
                if deleted_objs is None and dep in changed:
                    continue  # deleted file: nothing can reference it anymore
                if any(re.search(r"\b" + re.escape(o) + r"\b", txt)
                       for o in (deleted_objs or set())):
                    affected.add(f)
                    grew = True
                    break

    names = set()
    for f in sorted(affected):
        txt = texts.get(f)
        if txt is None:             # deleted file: its entries left the board
            continue
        # every '"name" ->' binding in the file: query entries AND their
        # oracle rows share the query's name, so the union is the file's
        # board surface; the caller intersects with the timed board
        defined = re.findall(r'"([a-z][a-z0-9_]*)"\s*->', txt)
        if not defined:
            # a queries/ file with no board entries is a shared helper
            # (Planted.scala class): any entry may splice it
            print("FULL")
            return
        names.update(defined)
    print(",".join(sorted(names)))


if __name__ == "__main__":
    main()
