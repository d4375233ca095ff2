#!/usr/bin/env python3
"""Generate 10x lineitem/orders at /tmp/sf1 as 10 disjoint replicas of
sf0.1 with offset order keys — the partition-friendly growth path TPC-H
itself models (new orders), the same method PERF.md uses for the
jaccard/triangles scale factors. Value distributions (price, quantity,
dates, part/supp keys) repeat per replica, so per-operator statistical
work (quantiles, correlations, basket supports) scales with row count
the way a real 10x corpus would.

Round 17 (r16 verdict #1): order replicas now also offset o_custkey by
the SAME replica stride, attaching replica i's orders to replica i's
customers in the gen_sf1_dims.py customer dim (identical OFFSET). The
previous version kept o_custkey verbatim, so the 15k original customers
absorbed 10x orders each while the 135k replica customers held zero —
every per-customer statistic measured at sf1 (CEM quantile cells,
cohort LTV, RFM, CUPED, jackknife blocks, Gini/Lorenz on spend) was
reading that fixture artifact, not the operator. With the reassignment,
orders-per-customer stays constant across scales — what a real 10x
corpus (more customers, same behavior each) looks like.

Usage: python3 tools/gen_sf1_tpch.py [outDir=/tmp/sf1]
Tooling only (driver-side python/duckdb) — not part of the library.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
OFFSET = 1_000_000  # > max(o_orderkey) at sf0.1 (149,999)


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT l_orderkey + r.i * {OFFSET} AS l_orderkey, l_partkey,
                 l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet'),
               range(10) r(i)
          ORDER BY l_orderkey, l_linenumber
        ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT o_orderkey + r.i * {OFFSET} AS o_orderkey,
                 o_custkey + r.i * {OFFSET} AS o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{SRC}/orders.parquet'),
               range(10) r(i)
          ORDER BY o_orderkey
        ) TO '{OUT}/orders.parquet' (FORMAT PARQUET)""")
    for t in ("lineitem", "orders"):
        n, = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows -> {OUT}/{t}.parquet")


if __name__ == "__main__":
    main()
