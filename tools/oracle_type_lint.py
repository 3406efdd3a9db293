#!/usr/bin/env python3
"""Mechanical guard for the HUGEINT oracle-dtype trap.

DuckDB's SUM over any integer type returns HUGEINT (plain AND windowed),
which pandas surfaces as float64 while Spark emits BIGINT — a guaranteed
hash mismatch in the driver's compare even when every value is identical.
The trap has produced a red CORRECTNESS row three times across two rounds
(d_pack_sequences r6; q_eager_agg + q_xpath_scalars r7) despite written
discipline, so it is now checked mechanically: this lint BINDS every
oracle statement in DuckDB against the sf tables (bind only — no
execution, so sf size is irrelevant) and fails on any result column whose
type is HUGEINT/UHUGEINT, and on any statement DuckDB cannot bind at all
(a bind error here would be a FAIL row in the driver's gate too).

A second trap class joined in r8: a LIST/STRUCT/MAP-typed oracle column
(q_props_map_agg's `m['purchase']`) binds cleanly and executes, but the
driver's pandas sort chokes on the unhashable ndarray it becomes — the
query is silently never hash-verified (err row). So the lint also fails on
any NESTED result column unless the query is explicitly allowlisted for
nested output (render nested data through to_json instead; VARCHAR is
always hashable).

Usage: python3 tools/oracle_type_lint.py <oracle_sql.json> [sf_dir]
Exit 1 on any finding; prints one "LINT <query>.<col>: <TYPE>" per hit.
Run by OracleTypeLintSpec in `sbt test` (skipped where duckdb is absent).
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries deliberately returning nested columns the driver is known to
# hash successfully. Keep EMPTY unless a query demonstrably round-trips:
# the safe rendering for nested data is to_json(...) (VARCHAR).
NESTED_OK = set()


def lint(oracle, con):
    findings = []
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            cols, types = rel.columns, [str(t).upper() for t in rel.types]
        except Exception as e:
            findings.append(f"LINT {name}: bind error: {e}")
            continue
        for c, t in zip(cols, types):
            if "HUGEINT" in t:
                findings.append(
                    f"LINT {name}.{c}: {t} — wrap the integral aggregate "
                    f"in CAST(... AS BIGINT) (see Tables.scala scaladoc)")
            elif name not in NESTED_OK and (
                    "[]" in t or t.startswith(("STRUCT", "MAP", "UNION"))):
                findings.append(
                    f"LINT {name}.{c}: {t} — nested oracle columns are "
                    f"driver-unhashable (pandas ndarray); render through "
                    f"to_json(...) or extract a scalar")
    return findings


def main():
    path = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(path))
    findings = lint(oracle, con)
    for f in findings:
        print(f)
    print(f"{len(findings)} findings over {len(oracle)} oracle statements")
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
