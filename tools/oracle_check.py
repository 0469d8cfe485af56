#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<query>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[query] in DuckDB against the parquet tables
in <sfDir>. Compares like the driver: sort columns by name, sort rows by
all columns, hash values. Exit non-zero when any checked query mismatches.
"""
import decimal
import json
import math
import sys

import duckdb
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)  # engines disagree on int-vs-decimal inference; the
        # driver's own compare is type-tolerant (q16/q33 precedents)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value hashing: repr of float is exact enough; round
        # to 9 significant digits to absorb float64 formatting differences
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_fingerprint(tbl):
    cols = sorted(tbl.column_names)
    rows = []
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    for i in range(n):
        rows.append(tuple(norm_cell(data[c][i]) for c in cols))
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            spark_tbl = pads.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        sc, sr = frame_fingerprint(spark_tbl)
        dc, dr = frame_fingerprint(duck_tbl)
        status = []
        if len(sr) != len(dr):
            status.append(f"rows {len(sr)} vs {len(dr)}")
        if sc != dc:
            status.append(f"schema {sc} vs {dc}")
        if not status and sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            status.append(f"hash row[{bad}] {sr[bad]} vs {dr[bad]}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name} ({len(sr)} rows)")
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nall green")


if __name__ == "__main__":
    main()
