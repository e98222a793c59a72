#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each SparkEntry query result (parquet written by graft.Verify) and the
corresponding oracle SQL from oracle_sql.json, runs the oracle in DuckDB with
the sf parquet tables registered as views, and compares: column names
(sorted), per-column result TYPES, row count, and the full sorted value
multiset.

The type comparison exists because the driver's hash is type-sensitive: a
DuckDB HUGEINT (int128, what DuckDB widens integer SUMs to) hashes differently
from Spark's int64 even when every value is identical — that mismatch kept
`events_running_totals` red for three rounds while this gate said PASS. Both
sides are described through DuckDB here, so the type names are comparable
as-is; any difference is a FAIL.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            got_types = [str(d[1]) for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
            exp_types = [str(d[1]) for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        # None-safe ordering: (is_none, type_name, value) per cell so rows
        # mixing NULL and non-NULL values sort instead of raising TypeError.
        def key(row):
            return tuple((v is None, type(v).__name__, v) for v in row)
        g = sorted((tuple(norm(r[i]) for i in gi) for r in got), key=key)
        e = sorted((tuple(norm(r[i]) for i in ei) for r in exp), key=key)
        g_sig = sorted(zip(got_cols, got_types))
        e_sig = sorted(zip(exp_cols, exp_types))
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
        elif g_sig != e_sig:
            diff = [(gc, gt, et) for (gc, gt), (_, et) in zip(g_sig, e_sig)
                    if gt != et]
            print(f"FAIL {name}: type mismatch (col, spark, oracle): {diff}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
        elif g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
