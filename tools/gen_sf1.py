#!/usr/bin/env python3
"""Generate a 10x (sf1) slice of `documents` and `events` at /tmp/sf1.

The driver ships sf0.001/0.01/0.1 only; the sf1 scaling data point
(PERF.md) needs a corpus one decade up. This resamples the EMPIRICAL
sf0.1 distributions (vocab, token-count, lang/source mix, event type/props
mix, value quantiles) with a fixed seed, scaling row counts and the event
user universe 10x while keeping per-user event density and the time window
constant — so per-operator work scales the way a real 10x corpus would,
not the way 10 verbatim copies would (verbatim copies turn every doc into
a 10-way near-dup clique and explode LSH pair counts ~100x).

Usage: python3 tools/gen_sf1.py [outDir=/tmp/sf1]
Tooling only (driver-side python/duckdb) — not part of the library.
"""
import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
SEED = 4242
N_DOCS = 50_000
N_EVENTS = 1_000_000
N_USERS = 15_000


def main():
    os.makedirs(OUT, exist_ok=True)
    rnd = random.Random(SEED)
    con = duckdb.connect()

    # ---- documents: empirical vocab / lengths / (lang, source) mix ----
    vocab = [w for (w,) in con.execute(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) FROM "
        f"read_parquet('{SRC}/documents.parquet') ORDER BY 1").fetchall()]
    lengths = [n for (n,) in con.execute(
        f"SELECT len(string_split(text, ' ')) FROM "
        f"read_parquet('{SRC}/documents.parquet')").fetchall()]
    mixes = con.execute(
        f"SELECT lang, source FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchall()

    docs = []
    for doc_id in range(N_DOCS):
        n_tok = rnd.choice(lengths)
        text = " ".join(rnd.choice(vocab) for _ in range(n_tok))
        lang, source = rnd.choice(mixes)
        docs.append((doc_id, text, lang, source, len(text)))
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?, ?)", docs)
    con.execute(f"COPY docs TO '{OUT}/documents.parquet' (FORMAT PARQUET)")

    # ---- events: 10x rows, 10x users, same 30-day window ----
    # Generated set-at-a-time in SQL (a python executemany of 1M rows binds
    # row-by-row and takes tens of minutes): every pseudo-random draw is a
    # hash of the row index, so the slice is deterministic across runs and
    # machines without any RNG state. Types/value/props resample the
    # EMPIRICAL sf0.1 rows by hashed index.
    # The driver corpus stores ALL timestamps tz-naive (Spark reads them
    # as TIMESTAMP_NTZ): a TIMESTAMPTZ here would make sf1's events.ts
    # infer as TimestampType while every other corpus is NTZ, and typed
    # gates fail to decode (round 14 — the earlier TIMESTAMPTZ comment
    # reflected a pre-round-12 driver corpus). Bare make_timestamp under
    # a UTC session = the same naive instants at every scale.
    con.execute("SET TimeZone = 'UTC'")
    (t0, t1) = con.execute(
        f"SELECT epoch_us(MIN(ts)), epoch_us(MAX(ts)) FROM "
        f"read_parquet('{SRC}/events.parquet')").fetchone()
    con.execute(
        f"CREATE TABLE src_ev AS SELECT event_type, value, props, "
        f"row_number() OVER () - 1 AS rn "
        f"FROM read_parquet('{SRC}/events.parquet')")
    (n_src,) = con.execute("SELECT COUNT(*) FROM src_ev").fetchone()
    con.execute(f"""
        COPY (
          SELECT g.i AS event_id,
                 make_timestamp(CAST({t0} + hash(g.i * 7 + 1) %
                   ({t1} - {t0} + 1) AS BIGINT)) AS ts,
                 CAST(hash(g.i * 7 + 2) % {N_USERS} AS BIGINT) AS user_id,
                 s.event_type,
                 v.value,
                 s.props
          FROM range({N_EVENTS}) g(i)
          JOIN src_ev s ON s.rn = hash(g.i * 7 + 3) % {n_src}
          JOIN src_ev v ON v.rn = hash(g.i * 7 + 4) % {n_src}
          ORDER BY event_id
        ) TO '{OUT}/events.parquet' (FORMAT PARQUET)""")

    for t in ("documents", "events"):
        n, = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows -> {OUT}/{t}.parquet")


if __name__ == "__main__":
    main()
