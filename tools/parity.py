#!/usr/bin/env python3
"""Local oracle-parity check, mirroring the driver's DuckDB compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
parquet tables of <sfDir> registered as views, loads the Spark result
parquet from <verifyOutDir>/<name>/, then compares: columns sorted by
name, rows sorted, exact value equality. Prints PASS/FAIL per query.
"""
import json
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(repr(v) for v in r))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark result at {spark_dir}")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetch_arrow_table().to_pandas()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table().to_pandas()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"[FAIL] {name}: columns differ oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        orows = norm(odf[ocols].itertuples(index=False, name=None))
        srows = norm(sdf[scols].itertuples(index=False, name=None))
        if orows == srows:
            print(f"[PASS] {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            print(f"[FAIL] {name}: oracle {len(orows)} rows vs spark {len(srows)} rows")
            for i, (a, b) in enumerate(zip(orows, srows)):
                if a != b:
                    print(f"    first diff at sorted row {i}:\n      oracle: {a}\n      spark : {b}")
                    break
            else:
                k = min(len(orows), len(srows))
                print(f"    rows equal up to {k}; extra on "
                      f"{'oracle' if len(orows) > k else 'spark'} side: "
                      f"{(orows[k:] or srows[k:])[:2]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
