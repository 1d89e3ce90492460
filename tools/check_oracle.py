#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir with an entry in oracle_sql.json:
run the SQL in DuckDB over the raw testdata tables, read the Spark result
parquet, canonicalize both (columns sorted by name, rows sorted by all
columns), and compare values exactly. Reports per-query status.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

# optional: --json <path> appends a CORRECTNESS-style JSON artifact
# ({query: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
# err}}) alongside the human-readable report — used by the x100 EM leg
# (tools/em100_leg.sh) to commit a per-round machine-readable record.
args = [a for a in sys.argv[1:]]
json_out = None
if "--json" in args:
    i = args.index("--json")
    if i + 1 >= len(args):
        sys.exit("usage: check_oracle.py <sfDir> <verifyOutDir> [--json <path>]")
    json_out = args[i + 1]; del args[i:i + 2]
if len(args) < 2:
    sys.exit("usage: check_oracle.py <sfDir> <verifyOutDir> [--json <path>]")
sfdir, outdir = args[0], args[1]
results = {}

def record(q, rows_match, schema_match, hash_match, spark_rows, oracle_rows, err=None):
    results[q] = {"rows_match": rows_match, "schema_match": schema_match,
                  "hash_match": hash_match, "spark_rows": spark_rows,
                  "oracle_rows": oracle_rows, "err": err}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list/array cells to tuples so sorting works
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list,)) else v)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b): return True
    except (TypeError, ValueError): pass
    return a == b

fails = 0
for name in sorted(glob.glob(f"{outdir}/*/")):
    q = name.rstrip("/").split("/")[-1]
    spark_files = glob.glob(f"{name}/*.parquet")
    if not spark_files: continue
    got = pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True)
    if q not in oracle:
        print(f"{q:28s} ROWS-ONLY rows={len(got)}")
        record(q, len(got) > 0, None, None, len(got), None, "no_oracle")
        continue
    try:
        exp = con.execute(oracle[q]).df()
    except Exception as e:
        print(f"{q:28s} ORACLE-SQL-ERROR {e}")
        record(q, False, False, False, len(got), None, f"oracle sql error: {e}")
        fails += 1
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"{q:28s} COLS-MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
        record(q, len(g) == len(e), False, False, len(g), len(e), "column mismatch")
        fails += 1; continue
    # Driver's hash compare is value-representation-sensitive: an int64 7500
    # and a float64 7500.0 hash differently. Emulate that by failing on
    # int-vs-float dtype kind divergence (the DuckDB sum(BIGINT)->HUGEINT->
    # float64 class). 'i' vs 'u' and width differences are fine (same repr).
    kind_bad = None
    for c in g.columns:
        gk, ek = g[c].dtype.kind, e[c].dtype.kind
        norm = lambda k: "i" if k in "iu" else k
        if norm(gk) != norm(ek) and {norm(gk), norm(ek)} <= {"i", "f"}:
            kind_bad = (c, g[c].dtype, e[c].dtype); break
    if kind_bad:
        c, gd, ed = kind_bad
        print(f"{q:28s} DTYPE-MISMATCH col={c} spark={gd} duck={ed} (driver hash would differ)")
        record(q, len(g) == len(e), False, False, len(g), len(e), f"dtype mismatch {c}")
        fails += 1; continue
    if len(g) != len(e):
        print(f"{q:28s} ROWCOUNT spark={len(g)} duck={len(e)}")
        record(q, False, True, False, len(g), len(e), "rowcount mismatch")
        fails += 1; continue
    bad = None
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (x, y) in enumerate(zip(gv, ev)):
            if not cells_equal(x, y):
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        c, i, x, y = bad
        print(f"{q:28s} VALUE-MISMATCH col={c} row={i} spark={x!r} ({type(x).__name__}) duck={y!r} ({type(y).__name__})")
        record(q, True, True, False, len(g), len(e), f"value mismatch col={c} row={i}")
        fails += 1
    else:
        print(f"{q:28s} OK rows={len(g)}")
        record(q, True, True, True, len(g), len(e))
if json_out:
    # "_meta" sorts first and carries no per-query fields, so artifact
    # consumers iterating query records can skip it by name; the commit
    # stamp makes "artifact measured THIS tree" mechanically checkable
    from git_commit import commit_stamp
    results["_meta"] = {"commit": commit_stamp()}
    with open(json_out, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
print(f"\n{fails} failing")
sys.exit(1 if fails else 0)
