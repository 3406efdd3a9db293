#!/usr/bin/env python3
"""Sharded DuckDB oracle for the per-user recurrence lanes at the fifth
decade (driver-side tooling, like compare.py — not part of the library).

`q_events_ewma` and `q_holt_linear` carry sequential list-fold oracles
(per-user list_reduce recurrences — the correct oracle statement of an
EWMA/Holt fold). DuckDB cannot evaluate that construction over 100M
events in one process (list_reduce OOMs at x10000), which is why the
r15-r17 fifth-decade gate carried them only at x1000. But the lanes are
per-user embarrassingly parallel: restricting the EVENTS INPUT to a
user-id residue class and concatenating the shard outputs is exactly the
full oracle, because every group key (user_id), every ORDER BY ts within
a group, and every fold stays entirely inside one shard.

This tool re-runs each lane's oracle SQL once per shard with the
`events` view redefined as `... WHERE user_id % SHARDS = k` (a fresh
DuckDB connection per shard, so list memory is returned to the OS
between shards), concatenates, and exact-compares against the Spark
output parquet with compare.py's own canon/cell_eq — the same strictest
interpretation of the driver's hash compare.

Usage:
  python3 tools/compare_sharded.py <verify_out_dir> <sf_dir> [shards] [lanes...]
Defaults: shards=16, lanes=q_events_ewma,q_holt_linear.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import canon, cell_eq  # noqa: E402


def events_view_sql(sf_dir: str, shards: int, k: int) -> str:
    p = f"{sf_dir}/events.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    return (f"CREATE VIEW events AS SELECT * FROM {src} "
            f"WHERE user_id % {shards} = {k}")


def run_sharded(sql: str, sf_dir: str, shards: int) -> pd.DataFrame:
    parts = []
    for k in range(shards):
        con = duckdb.connect()  # fresh process-local memory per shard
        con.execute(events_view_sql(sf_dir, shards, k))
        parts.append(con.execute(sql).fetchdf())
        con.close()
        sys.stderr.write(f"[shard {k}] {len(parts[-1])} rows\n")
    return pd.concat(parts, ignore_index=True)


def main():
    out = sys.argv[1]
    sf_dir = sys.argv[2]
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    lanes = sys.argv[4:] or ["q_events_ewma", "q_holt_linear"]
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_fail = 0
    for name in lanes:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = run_sharded(oracle[name], sf_dir, shards)
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
        for c in g.columns:
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
            print(f"PASS  {name}: rows={len(g)} ({shards} oracle shards)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
