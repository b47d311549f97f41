#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: check_local.py <verify_out_dir> <sf_dir>

Reads oracle_sql.json + per-query parquet dumps written by graft.Verify,
runs each oracle SQL in DuckDB against the sf parquet tables, and compares
(sort columns by name, sort rows, exact value equality incl. float bits).
"""
import duckdb
import glob
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("num", float(v), "int")
    if isinstance(v, float):
        if math.isnan(v):
            return ("num", "nan", "float")
        return ("num", v, "float")
    if isinstance(v, (list, tuple)):
        return ("list", tuple(canon(x) for x in v))
    return (type(v).__name__, str(v))


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    return [cols[i] for i in order], sorted(
        tuple(canon(r[i]) for i in order) for r in data)


def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        try:
            ecols, exp = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        gcols, got = rows_of(con.sql(
            f"SELECT * FROM read_parquet({files!r})"))
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
        if bad:
            i, g, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(exp)} rows differ; first @{i}:")
            print(f"   spark : {g}")
            print(f"   oracle: {e}")
            continue
        print(f"PASS {name} ({len(exp)} rows)")
        n_pass += 1
    print(f"== {n_pass}/{len(oracle)} pass ==")
    sys.exit(0 if n_pass == len(oracle) else 1)


if __name__ == "__main__":
    main()
