#!/usr/bin/env python3
"""Selftest for the tree-identity stamp contract (tools/git_commit.py).

Builds a scratch git repo and asserts the dirt probe's behavior class by
class — this is the test that would have caught the round-12 bug where
the scala twin's fixed-width porcelain parse mis-read the first status
line (run() trimmed the leading status space) and artifact-only dirt
stamped '+dirty'. The python helper is the contract; Bench.scala's twin
mirrors it (whitespace-robust path parse, same artifact regex).

Run: python3 tools/selftest_stamp.py   (exit 0 = green)
"""
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from git_commit import commit_stamp  # noqa: E402


def sh(*cmd, cwd):
    subprocess.run(cmd, cwd=cwd, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def main():
    failures = []
    with tempfile.TemporaryDirectory() as repo:
        sh("git", "init", "-q", cwd=repo)
        sh("git", "config", "user.email", "t@t", cwd=repo)
        sh("git", "config", "user.name", "t", cwd=repo)
        tracked = ["code.scala", "SCALE_r12.json", "SCALE_selftest.json",
                   "BENCH_r11.json", "LEAKCHECK.json", "ROWS_ONLY.json",
                   "bench_ref_sf0.01.json"]
        for f in tracked:
            open(os.path.join(repo, f), "w").write("v1\n")
        sh("git", "add", "-A", cwd=repo)
        sh("git", "commit", "-q", "-m", "base", cwd=repo)

        cwd0 = os.getcwd()
        os.chdir(repo)
        try:
            def check(label, want_dirty):
                got = commit_stamp()
                ok = got.endswith("+dirty") == want_dirty and got != "unknown"
                print(f"{'OK  ' if ok else 'FAIL'} {label}: {got}")
                if not ok:
                    failures.append(label)

            check("clean tree", want_dirty=False)

            # generated-artifact dirt (modified AND first-in-status) is
            # NOT dirt — the exact round-12 closing-sweep scenario
            open("SCALE_r12.json", "w").write("v2\n")
            open("SCALE_selftest.json", "w").write("v2\n")
            open("BENCH_r11.json", "w").write("v2\n")
            open("LEAKCHECK.json", "w").write("v2\n")
            check("artifact-only dirt", want_dirty=False)

            # untracked files never count (probe uses --untracked-files=no)
            open("EM100_r12.json", "w").write("v1\n")
            open("scratch.txt", "w").write("v1\n")
            check("plus untracked files", want_dirty=False)

            # code dirt IS dirt, even alongside artifact dirt
            open("code.scala", "w").write("v2\n")
            check("code + artifact dirt", want_dirty=True)
            sh("git", "checkout", "--", "code.scala", cwd=repo)

            # spec/ceiling INPUTS are dirt: ROWS_ONLY + bench_ref
            open("ROWS_ONLY.json", "w").write("v2\n")
            check("ROWS_ONLY.json dirt", want_dirty=True)
            sh("git", "checkout", "--", "ROWS_ONLY.json", cwd=repo)
            open("bench_ref_sf0.01.json", "w").write("v2\n")
            check("bench_ref dirt", want_dirty=True)
        finally:
            os.chdir(cwd0)

    if failures:
        sys.exit(f"[stamp-selftest] FAILED: {failures}")
    print("[stamp-selftest] all green")


if __name__ == "__main__":
    main()
