#!/usr/bin/env python3
"""Adversarial-skew gate: compare two SkewBench runs (clean sf0.1 vs the
skew fixture) and FAIL if the guards stop bounding the candidate volume.

The gate reads the DETERMINISTIC census numbers, not wall-clock: each
evidence line carries the UNCAPPED candidate-pair count (what an
unguarded self-join would shuffle) and the CAPPED count (what the
operator's default guard admits — shingle df<=100, LSH bucket<=200,
SemDeDup cell<=200). Two conditions, per evidence family:

 1. GUARD HOLDS: capped pairs on the skew corpus <= --capped-ratio x
    capped pairs on the clean corpus (guards make the admitted shuffle
    volume skew-insensitive). A guard regression (cap removed, cap
    constant silently raised, census filter broken) fails here.
 2. FIXTURE IS ADVERSARIAL: uncapped pairs on the skew corpus >= each
    family's baked-in minimum blowup (about half the round-4 measured
    values; else the fixture degraded and condition 1 passes vacuously).

Wall-clock legs are recorded as evidence only (single-pass numbers on a
steal-prone host gate nothing).

Usage:
  check_skew.py CLEAN_JSONL SKEW_JSONL --json OUT.json [--round N]
      [--capped-ratio 3.0] [--min-blowup 1.0]
Exit 0 = gate green; 1 = violations.
"""
import argparse

from git_commit import commit_stamp
import json
import sys

# family -> (uncapped-count key, minimum adversarial blowup). The minima
# sit at ~half the round-4 measured values (x305 / x7.5 / x3.5) so a
# degraded fixture fails while normal census jitter doesn't; --min-blowup
# scales all three.
FAMILIES = {
    "shingle_df": ("candidate_pairs", 50.0),
    "lsh_buckets": ("candidate_pairs", 3.5),
    "semdedup_cells": ("within_cell_pairs", 1.8),
}


def load(path):
    ev, legs = {}, {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if "evidence" in d:
                ev[d["evidence"]] = d
            elif "leg" in d:
                legs[d["leg"]] = {"sec": d["sec"], "rows": d["rows"]}
    return ev, legs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("clean")
    ap.add_argument("skew")
    ap.add_argument("--json", required=True)
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--capped-ratio", type=float, default=3.0)
    ap.add_argument("--min-blowup", type=float, default=1.0,
                    help="multiplier on each family's baked-in minimum blowup")
    args = ap.parse_args()

    cev, clegs = load(args.clean)
    sev, slegs = load(args.skew)
    violations, families = [], {}
    for fam, (uncapped_key, fam_min) in FAMILIES.items():
        c, s = cev[fam], sev[fam]
        cap_c, cap_s = c["pairs_capped"], s["pairs_capped"]
        un_c, un_s = c[uncapped_key], s[uncapped_key]
        capped_ratio = round(cap_s / max(cap_c, 1), 2)
        blowup = round(un_s / max(un_c, 1), 2)
        min_blowup = fam_min * args.min_blowup
        families[fam] = {
            "clean_uncapped": un_c, "skew_uncapped": un_s, "uncapped_blowup": blowup,
            "min_blowup": min_blowup,
            "clean_capped": cap_c, "skew_capped": cap_s, "capped_ratio": capped_ratio,
        }
        if capped_ratio > args.capped_ratio:
            violations.append({"family": fam, "kind": "guard_no_longer_bounds",
                               "capped_ratio": capped_ratio, "ceiling": args.capped_ratio})
        if blowup < min_blowup:
            violations.append({"family": fam, "kind": "fixture_not_adversarial",
                               "uncapped_blowup": blowup, "min": min_blowup})

    out = {
        "round": args.round,
        "commit": commit_stamp(),
        "gate": {"capped_ratio_ceiling": args.capped_ratio,
                 "min_blowup_multiplier": args.min_blowup},
        "families": families,
        "violations": violations,
        "legs_clean_sec": clegs,
        "legs_skew_sec": slegs,
        "note": "gate reads deterministic candidate-pair census; wall-clock "
                "legs are evidence only",
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)

    for fam, v in families.items():
        print(f"[skew] {fam}: uncapped blowup x{v['uncapped_blowup']}, "
              f"capped ratio x{v['capped_ratio']}")
    if violations:
        print(f"[skew] GATE FAILED: {violations}")
        return 1
    print("[skew] gate green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
