#!/usr/bin/env python3
"""Selftest for check_scale.py's retry-merge and merge-base-cleanliness
semantics (the round-12 ADVICE findings).

A retry can only IMPROVE a query's standing:
  1. a main-run base crash (-1) exonerated by a green isolated retry must
     clear failed_at_base — otherwise a transient crash keeps the round
     red and defeats the retry loop entirely;
  2. a query with a valid main-run x10 time must NOT become failed_at_x10
     because the isolated retry happened to crash (the main run is the
     measurement of record);
  3. a query that crashed in BOTH the main run and the retry stays failed.

And --merge-base must refuse a previous artifact that is not git-clean:
its timings and commit field are INPUTS to the new artifact, so an
uncommitted edit to it would smuggle tampered carried numbers past the
stamp contract.

Run: python3 tools/selftest_retry.py   (exit 0 = green)
"""
import json
import os
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))


def dump(path, queries):
    with open(path, "w") as f:
        json.dump({"metric": "total_full", "queries": queries}, f)


def run_gate(d, extra, base, x10, retry_base=None, retry_x10=None, cwd=None):
    b, t = os.path.join(d, "b.json"), os.path.join(d, "t.json")
    out = os.path.join(d, "out.json")
    dump(b, base)
    dump(t, x10)
    cmd = [sys.executable, os.path.join(TOOLS, "check_scale.py"),
           b, t, "--json", out, "--round", "0"]
    if retry_base:
        p = os.path.join(d, "rb.json")
        dump(p, retry_base)
        cmd += ["--retry-base", p]
    if retry_x10:
        p = os.path.join(d, "rt.json")
        dump(p, retry_x10)
        cmd += ["--retry-x10", p]
    cmd += extra
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=cwd)
    art = None
    if os.path.exists(out):
        with open(out) as f:
            art = json.load(f)
        os.remove(out)
    return r, art


def main():
    checks = []
    with tempfile.TemporaryDirectory() as d:
        # 1) transient base crash exonerated by a green retry -> gate green
        r, art = run_gate(d, [], {"q_ok": 1.0, "q_flaky": -1.0},
                          {"q_ok": 2.0, "q_flaky": 2.0},
                          retry_base={"q_flaky": 1.1})
        checks.append(("green retry clears failed_at_base",
                       r.returncode == 0 and art["failed_at_base"] == []
                       and art["queries"]["q_flaky"]["base_sec"] == 1.1))

        # 2) retry-only x10 crash never poisons a valid main-run time
        r, art = run_gate(d, [], {"q_ok": 1.0}, {"q_ok": 2.0},
                          retry_x10={"q_ok": -1.0})
        checks.append(("retry-only x10 crash ignored",
                       r.returncode == 0 and art["failed_at_x10"] == []
                       and art["queries"]["q_ok"]["x10_sec"] == 2.0))

        # 3) crashed in both runs -> stays failed
        r, art = run_gate(d, [], {"q_bad": 1.0}, {"q_bad": -1.0},
                          retry_x10={"q_bad": -1.0})
        checks.append(("double crash stays failed_at_x10",
                       r.returncode != 0 and art["failed_at_x10"] == ["q_bad"]))

    # 4) --merge-base refuses a dirty previous artifact (scratch git repo)
    with tempfile.TemporaryDirectory() as repo:
        env = dict(os.environ, GIT_AUTHOR_NAME="t", GIT_AUTHOR_EMAIL="t@t",
                   GIT_COMMITTER_NAME="t", GIT_COMMITTER_EMAIL="t@t")
        def git(*a):
            subprocess.run(["git", *a], cwd=repo, env=env, check=True,
                           capture_output=True)
        git("init", "-q")
        prev = os.path.join(repo, "SCALE_prev.json")
        green = {"round": 0, "commit": "x", "violations": [],
                 "failed_at_base": [], "failed_at_x10": [],
                 "queries": {"q_old": {"base_sec": 1.0, "x10_sec": 2.0}}}
        with open(prev, "w") as f:
            json.dump(green, f)
        git("add", "SCALE_prev.json")
        git("commit", "-qm", "prev artifact")

        # clean -> carry works
        r, art = run_gate(repo, ["--merge-base", "SCALE_prev.json"],
                          {"q_new": 1.0}, {"q_new": 2.0}, cwd=repo)
        checks.append(("clean merge-base carries",
                       r.returncode == 0 and art is not None
                       and art["queries"].get("q_old", {}).get("carried") is True))

        # dirty -> refused before any carry
        green["queries"]["q_old"]["x10_sec"] = 0.01   # "tampered" edit
        with open(prev, "w") as f:
            json.dump(green, f)
        r, art = run_gate(repo, ["--merge-base", "SCALE_prev.json"],
                          {"q_new": 1.0}, {"q_new": 2.0}, cwd=repo)
        checks.append(("dirty merge-base refused",
                       r.returncode != 0 and art is None
                       and "not git-clean" in (r.stderr + r.stdout)))

    failed = [label for label, ok in checks if not ok]
    for label, ok in checks:
        print(("OK  " if ok else "FAIL"), label)
    if failed:
        sys.exit(f"[retry-selftest] FAILED: {failed}")
    print("[retry-selftest] all green")


if __name__ == "__main__":
    main()
