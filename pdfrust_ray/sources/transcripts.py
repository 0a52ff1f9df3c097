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


def read_transcripts_jsonl(paths, columns=None, **kwargs) -> "rd.Dataset":
    """Newline-delimited-JSON transcript source — same logical table
    as the Parquet path (S1), for pipelines whose upstream emits JSONL
    crawl shards. Ray's read_json (pyarrow.json under the hood)
    streams blocks exactly like read_parquet; the cast stage pins the
    canonical schema (turn_idx arrives int64 from JSON) and drops
    unrequested columns AFTER parse (JSON has no column pruning at
    storage — parquet remains the preferred format at scale, this is
    an ingest-compat path)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = columns or EXTRACT_COLUMNS
    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(glob.glob(os.path.join(paths, "*.jsonl")))
        elif not os.path.isfile(paths):
            paths = sorted(glob.glob(paths))
    ds = rd.read_json(paths, **kwargs)

    _TYPES = {
        "conv_id": pa.string(),
        "turn_idx": pa.int32(),
        "role": pa.string(),
        "text": pa.string(),
        "tool": pa.string(),
        "ts": pa.timestamp("us"),
    }

    def canonical(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            arr = t[c]
            want = _TYPES.get(c)
            if want is not None and arr.type != want:
                # ISO-8601 strings cast directly (arrow strptime has
                # no %f support; cast does fractional seconds)
                arr = pc.cast(arr, want)
            out[c] = arr
        return pa.table(out)

    return ds.map_batches(canonical, batch_format="pyarrow")
