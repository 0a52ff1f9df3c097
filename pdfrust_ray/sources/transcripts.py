"""Transcript Parquet source.

Reads the graft input table (conv_id, turn_idx, role, text, tool, ts)
with column pruning at the read: the extraction pipeline only ever
needs (conv_id, turn_idx, text), so role/tool/ts never leave storage
(S1 in SURVEY §2.1; "prune at the read").
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

EXTRACT_COLUMNS = ["conv_id", "turn_idx", "text"]


def list_shards(path: str) -> list[str]:
    """Deterministic sorted shard list for a file, dir, or glob."""
    if os.path.isdir(path):
        inner = os.path.join(path, "shards")
        if os.path.isdir(inner):
            path = inner
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    elif os.path.isfile(path):
        files = [path]
    else:
        files = sorted(glob.glob(path))
    if not files:
        raise FileNotFoundError(f"no parquet shards under {path!r}")
    return files


def read_transcripts(paths, columns=None, **kwargs) -> "rd.Dataset":
    if isinstance(paths, str):
        paths = list_shards(paths)
    return rd.read_parquet(paths, columns=columns or EXTRACT_COLUMNS, **kwargs)
