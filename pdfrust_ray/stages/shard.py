"""Coarse-shard reduce primitives for packed int64 keys.

ray 2.49's hash `groupby(key).aggregate(...)` measured ~10-70x slower
than a coarse-shard `map_groups` reduce at high key cardinality (87 s
vs 1.2 s summing 300k pair rows — see SURVEY §9), and multi-key
aggregate outputs break downstream `Dataset.join` (schemaless empty
blocks — see cohort_retention). The engine therefore packs compound
keys into ONE int64 and reduces inside a fixed number of coarse
shards: every key lands whole in `key % n_shards`, each shard reduces
vectorized (numpy/pandas), and the exchange carries one row per
distinct key, never per input row.

These two primitives cover the mechanical cases; operators with a
fused finish (butterflies' C(k,2), the dedup verifies) keep their
inline shard reduce where the fusion is the point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

N_SHARDS = 64


def _with_shard(ds: "rd.Dataset", key_col: str, n_shards: int) -> "rd.Dataset":
    def add(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy()
        return t.append_column(
            "_shard", pa.array((k % n_shards).astype(np.int32), pa.int32())
        )

    return ds.map_batches(add, batch_format="pyarrow")


def shard_distinct(
    ds: "rd.Dataset", key_col: str = "key", n_shards: int = N_SHARDS
) -> "rd.Dataset":
    """Global DISTINCT over an int64 key column. Pre-collapse duplicates
    per batch BEFORE calling this when batches repeat keys heavily —
    the exchange then carries per-batch-distinct rows."""

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {key_col: pd.Series(np.unique(g[key_col].to_numpy()), dtype="int64")}
        )

    return (
        _with_shard(ds.select_columns([key_col]), key_col, n_shards)
        .groupby("_shard")
        .map_groups(distinct, batch_format="pandas")
    )


def shard_sum(
    ds: "rd.Dataset",
    key_col: str,
    val_col: str,
    n_shards: int = N_SHARDS,
) -> "rd.Dataset":
    """Global per-key int64 SUM over (key, value) rows."""

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(key_col, sort=False)[val_col].sum()
        return pd.DataFrame(
            {
                key_col: pd.Series(s.index.to_numpy(), dtype="int64"),
                val_col: pd.Series(s.to_numpy(), dtype="int64"),
            }
        )

    return (
        _with_shard(ds.select_columns([key_col, val_col]), key_col, n_shards)
        .groupby("_shard")
        .map_groups(reduce, batch_format="pandas")
    )
