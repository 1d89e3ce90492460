#!/usr/bin/env python3
"""Selftest for check_scale.py's secondary raw-ratio gate.

The primary gate floors the denominator at 1 s (sub-second bases are
overhead-dominated), which by itself is blind to an early-stage
quadratic on a fast leg: base 0.3 s -> x10 9 s is raw 30x but gated
9/1.0 = 9 < 10. The raw gate (default 30x, evaluated only when the x10
leg clears the floor) must catch exactly that shape while a plain
linear fast leg (base 0.3 -> x10 3.2, raw ~10.7) and a floored slow leg
(base 2 -> x10 16, raw 8) still pass.

Run: python3 tools/selftest_rawgate.py   (exit 0 = green)
"""
import json
import os
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run_gate(base, x10, out):
    def dump(path, queries):
        with open(path, "w") as f:
            json.dump({"metric": "total_full", "queries": queries}, f)
    with tempfile.TemporaryDirectory() as d:
        b, t = os.path.join(d, "b.json"), os.path.join(d, "t.json")
        dump(b, base)
        dump(t, x10)
        p = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "check_scale.py"),
             b, t, "--json", out, "--round", "0"],
            capture_output=True, text=True)
    with open(out) as f:
        return p.returncode, json.load(f)


def main():
    base = {"fast_quadratic": 0.3, "fast_linear": 0.3, "slow_floored": 2.0}
    # 9.3/0.3 = raw 31 (strictly over the 30x ceiling — the gate is
    # strictly-greater, matching the primary gate's convention)
    x10 = {"fast_quadratic": 9.3, "fast_linear": 3.2, "slow_floored": 16.0}
    out = os.path.join(tempfile.gettempdir(), "SCALE_rawgate_selftest.json")
    rc, art = run_gate(base, x10, out)

    vio = {v["query"]: v for v in art["violations"]}
    checks = [
        ("gate exits nonzero", rc != 0),
        ("fast_quadratic flagged", "fast_quadratic" in vio),
        ("flagged as raw_ratio", vio.get("fast_quadratic", {}).get("kind") == "raw_ratio"),
        ("fast_linear passes", "fast_linear" not in vio),
        ("slow_floored passes", "slow_floored" not in vio),
        ("gate records raw ceiling", art["gate"].get("raw_ratio_ceiling") == 30.0),
    ]
    failed = [label for label, ok in checks if not ok]
    for label, ok in checks:
        print(("OK  " if ok else "FAIL"), label)
    if failed:
        sys.exit(f"[rawgate-selftest] FAILED: {failed}")
    print("[rawgate-selftest] all green")


if __name__ == "__main__":
    main()
