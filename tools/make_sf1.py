#!/usr/bin/env python
"""Synthesize an sf1-scale (10x sf0.1) corpus under /tmp/sf1 for the
scale probe (VERDICT r3 item #5): every fact table tiles 10 replicas of
the sf0.1 testdata with consistent key offsets (region/nation stay as
the fixed dimensions), so foreign keys remain valid while row counts
grow 10x. Content columns are perturbed deterministically per replica
so dedup/similarity operators see realistic growth instead of
pathological 10-cliques of exact copies:

  - documents.text: words permuted by a per-(replica, doc) seeded
    shuffle (kills cross-replica shingle overlap);
  - embeddings: small seeded Gaussian perturbation per replica;
  - events.ts: +replica seconds jitter (avoids 10-way exact-tie
    inflation at identical timestamps).

Pure pyarrow/numpy, no Ray. Deterministic (seed=replica index).
Usage: python tools/make_sf1.py [out_dir] [reps]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

OFFSETS = {
    # column -> per-replica offset base (> max key in sf0.1)
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "l_partkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "s_suppkey": 1_000_000,
}


def _shuffle_words(texts: list[str], rep: int) -> list[str]:
    rng = np.random.RandomState(1_000 + rep)
    out = []
    for t in texts:
        ws = t.split()
        rng.shuffle(ws)
        out.append(" ".join(ws))
    return out


def _tile(table: pa.Table, rep: int, name: str) -> pa.Table:
    cols = {}
    for f in table.schema:
        col = table[f.name]
        if rep and f.name in OFFSETS:
            cols[f.name] = pa.array(
                col.to_numpy(zero_copy_only=False) + rep * OFFSETS[f.name],
                f.type,
            )
        elif rep and name == "documents" and f.name == "text":
            cols[f.name] = pa.array(
                _shuffle_words(col.to_pylist(), rep), pa.string()
            )
        elif rep and name == "embeddings" and f.name == "embedding":
            flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
            n = len(col)
            d = len(flat) // n
            rng = np.random.RandomState(2_000 + rep)
            pert = (flat.reshape(n, d) + rng.normal(0, 0.05, (n, d))).astype(
                np.float32
            )
            cols[f.name] = pa.array(list(pert), pa.list_(pa.float32()))
        elif rep and name == "events" and f.name == "ts":
            us = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            cols[f.name] = pa.array(us + rep * 1_000_000, pa.int64()).cast(
                pa.timestamp("us")
            )
        else:
            cols[f.name] = col
    return pa.table(cols)


def main(out_dir: str = "/tmp/sf1", reps: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation"):
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"), f"{out_dir}/{name}.parquet"
        )
    for name in (
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        src = pq.read_table(f"{SRC}/{name}.parquet")
        parts = [_tile(src, rep, name) for rep in range(reps)]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{out_dir}/{name}.parquet", row_group_size=131072)
        print(name, out.num_rows, flush=True)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
    )
