#!/usr/bin/env python3
"""Scale the DIMENSION tables (customer/part/supplier) 10x into the sf1
bench dir — the r10-verdict gap: the recorded sf1 composition held dims at
sf0.1 size, so every broadcast-size-gated operator had only ever seen
small dims at every measured scale.

Same replica-with-offset-keys method as gen_sf1_tpch.py: 10 disjoint
copies with offset primary keys. Original keys survive verbatim, so every
fact->dim join keeps its matches; the 9 offset replicas are join-miss dim
rows — exactly what a 10x-wider customer/part universe looks like when the
fact window covers a tenth of it. nation/region stay fixed (25/5 rows at
EVERY TPC-H scale factor by spec).

Also emits customer_x100.parquet (100 replicas) — the broadcast-flip
probe: at x10 the dims are still far under the 64 MB broadcast threshold
(broadcasting them IS the right plan), so the regime flip is demonstrated
at the size where it actually happens.

Usage: python3 tools/gen_sf1_dims.py [outDir=/tmp/sf1]
Tooling only (driver-side python/duckdb) — not part of the library.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
OFFSET = 1_000_000  # > every dim key at sf0.1


def replicate(con, table, key, cols, reps, dest):
    select = ", ".join(
        [f"{key} + r.i * {OFFSET} AS {key}"] +
        [c for c in cols if c != key])
    con.execute(f"""
        COPY (
          SELECT {select}
          FROM read_parquet('{SRC}/{table}.parquet'), range({reps}) r(i)
          ORDER BY {key}
        ) TO '{dest}' (FORMAT PARQUET)""")
    n, = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dest}')").fetchone()
    print(f"{table} x{reps}: {n} rows -> {dest}")


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    dims = {
        "customer": ("c_custkey",
                     ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                      "c_mktsegment"]),
        "part": ("p_partkey",
                 ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                  "p_retailprice"]),
        "supplier": ("s_suppkey",
                     ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
    }
    for table, (key, cols) in dims.items():
        replicate(con, table, key, cols, 10, f"{OUT}/{table}.parquet")
    replicate(con, "customer", *dims["customer"], 100,
              f"{OUT}/customer_x100.parquet")


if __name__ == "__main__":
    main()
