#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB (fixture
parquets registered as bare-named views), and compares: columns sorted by
name, rows as written, exact value equality (floats are expected to be
canonicalized via round() on both sides).

Dev-only tooling — NOT part of the shipped Scala library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    # A query that threw inside Verify writes NO output dir — that must be
    # a failure here, not a silent skip. The queries.json manifest covers
    # rows-only queries that have no oracle entry.
    declared = set(oracle)
    manifest = f"{out_dir}/queries.json"
    if os.path.exists(manifest):
        declared |= set(json.load(open(manifest)))
    for missing in sorted(declared - set(names)):
        if not only or missing in only:
            print(f"[FAIL] {missing}: declared but no output written")
            n_fail += 1
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            # An aborted write leaves the dir present but empty: that's a
            # failed query, not a missing one.
            print(f"[FAIL] {name}: output dir exists but contains no parquet (query threw?)")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                try:
                    eq = (g.fillna("\0NULL") == e.fillna("\0NULL")) if g.dtype == object \
                        else ((g == e) | (g.isna() & e.isna()))
                except Exception:
                    eq = g.astype(str) == e.astype(str)
                if not eq.all():
                    bad = (~eq).idxmax()
                    print(f"[FAIL] {name}: col {c} differs at row {bad}: "
                          f"spark={g[bad]!r} oracle={e[bad]!r} "
                          f"(dtype {g.dtype} vs {e.dtype}, {int((~eq).sum())} rows differ)")
                    ok = False
                    break
            if ok and [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
                print(f"[warn] {name}: dtype drift {list(map(str, got.dtypes))} vs {list(map(str, exp.dtypes))}")
        if ok:
            print(f"[ok] {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} ok, {n_fail} FAIL, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
