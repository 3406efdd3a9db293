#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> [sf_dir]

Reads each <out>/<name>/ parquet written by graft.Verify, runs the matching
SQL from <out>/oracle_sql.json in DuckDB against the sf parquet tables,
sorts columns by name and rows by value, and exact-compares. This is the
strictest plausible interpretation of the driver's hash compare: if this
passes, any sort-then-hash scheme passes too.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total order incl. None/NaN/lists
    key = df.astype(str)
    df = df.loc[key.sort_values(by=list(df.columns)).index].reset_index(drop=True)
    return df


def cell_eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if pd.isna(a) and pd.isna(b):
            return True
        return a == b  # exact: our stabilization should make bits match
    if (a is None or (isinstance(a, float) and pd.isna(a))) and \
       (b is None or (isinstance(b, float) and pd.isna(b))):
        return True
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    return a == b


def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):   # Spark-written table (GenScale replicas)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out)
                   if os.path.isdir(os.path.join(out, d)))
    n_pass = n_fail = n_weak = 0
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            status = "WEAK " if len(got) > 0 else "FAIL "
            print(f"{status} {name}: rows={len(got)} (no oracle)")
            n_weak += len(got) > 0
            n_fail += len(got) == 0
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        bad = []
        for ci, c in enumerate(g.columns):
            gv, ev = g[c].tolist(), e[c].tolist()
            for ri in range(len(gv)):
                if not cell_eq(gv[ri], ev[ri]):
                    bad.append((ri, c, gv[ri], ev[ri]))
                    if len(bad) > 3:
                        break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL  {name}: {len(bad)}+ cell diffs, e.g. {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(g)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail "
          f"of {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
