#!/usr/bin/env python3
"""Scale the `embeddings` table 10x into the sf1 bench dir (round 17,
r16 verdict #2): the driver fixture pins embeddings at 2,000 rows at
EVERY scale, so the whole embedding family (IVF probe/recall, semdedup,
silhouette, Gram, MMD, embed-drift) had zero measured 10x behavior.

Method — in-cluster interpolation, not verbatim replicas: the original
2,000 vectors survive verbatim (vec_id 0..1999, so fixed probes like
q_retrieval_eval's vec_id < 5 keep their identity); each of the 18,000
new vectors (vec_id 2000..19999) is normalize(w*A + (1-w)*B + eps*g)
for two SAME-LABEL source vectors A, B, mixing weight w ~ U[0.3, 0.7]
and a small Gaussian jitter (sigma = 0.05 per dim) — a genuinely new
point on the label cluster's manifold. Verbatim (or tiny-perturbation)
copies would hand every original a 10-way near-dup clique and explode
semdedup pair counts ~100x, the same reason gen_sf1.py resamples
documents instead of copying them. Label mix follows the original
distribution (new row i inherits the label of original i mod 2000).
Seeded numpy Generator => deterministic across runs and machines.

Usage: python3 tools/gen_sf1_embed.py [outDir=/tmp/sf1]
Tooling only (driver-side python/numpy/pyarrow) — not part of the library.
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
SEED = 4243
N_TOTAL = 20_000
SIGMA = 0.05


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    n_src = len(rows)
    dim = len(rows[0][1])
    src = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows], dtype=np.int32)
    by_label = {l: np.flatnonzero(labels == l) for l in set(labels.tolist())}

    rng = np.random.default_rng(SEED)
    out_vecs = [src[i] for i in range(n_src)]
    out_labels = list(labels.tolist())
    for new_id in range(n_src, N_TOTAL):
        lab = int(labels[new_id % n_src])
        ia, ib = rng.choice(by_label[lab], size=2, replace=False)
        w = rng.uniform(0.3, 0.7)
        v = w * src[ia] + (1.0 - w) * src[ib] + \
            SIGMA * rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        out_vecs.append(v)
        out_labels.append(lab)

    table = pa.table({
        "vec_id": pa.array(range(N_TOTAL), type=pa.int64()),
        "embedding": pa.array(
            [np.asarray(v, dtype=np.float32) for v in out_vecs],
            type=pa.list_(pa.float32())),
        "label": pa.array(out_labels, type=pa.int32()),
    })
    dest = f"{OUT}/embeddings.parquet"
    if os.path.exists(dest) and not os.access(dest, os.W_OK):
        os.chmod(dest, 0o644)  # the old copy of the driver file is r--
    pq.write_table(table, dest)
    n, = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dest}')").fetchone()
    print(f"embeddings x10: {n} rows ({dim}-dim, "
          f"{len(by_label)} labels) -> {dest}")


if __name__ == "__main__":
    main()
