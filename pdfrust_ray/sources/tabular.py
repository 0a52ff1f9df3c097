"""CSV ingest path for the relational tables.

Parquet is the scale format (column pruning, row-group pushdown,
typed); CSV is the ingest-compatibility format real pipelines still
receive. `read_events_csv` streams CSV shards through
`ray.data.read_csv` with an EXPLICIT arrow schema (no type inference
drift between runs) and a canonical-cast stage, so every downstream
operator sees the same Arrow schema the parquet source produces —
the same contract `sources/transcripts.py` gives the JSONL path.

The fixture CSV shards are converted once from the driver-provided
parquet (cached under /tmp keyed by scale); timestamps are written as
ISO-8601 microseconds, the round-trippable interchange form.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

import ray.data as rd

_EVENTS_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)


def ensure_events_csv(sf_dir: str, n_shards: int = 8) -> str:
    """Convert events.parquet into n_shards CSV files (idempotent,
    cached by scale dir). Returns the shard directory."""
    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_csv_{scale}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/events.parquet")
    n = t.num_rows
    step = max(1, (n + n_shards - 1) // n_shards)
    for i, off in enumerate(range(0, n, step)):
        pacsv.write_csv(
            t.slice(off, step),
            os.path.join(out_dir, f"events_{i:04d}.csv"),
            write_options=pacsv.WriteOptions(quoting_style="needed"),
        )
    open(marker, "w").close()
    return out_dir


def read_events_csv(sf_dir: str) -> "rd.Dataset":
    """events as a Dataset via the CSV path, schema-pinned."""
    shard_dir = ensure_events_csv(sf_dir)
    convert = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in _EVENTS_SCHEMA}
    )
    return rd.read_csv(shard_dir, convert_options=convert, file_extensions=["csv"])


# ---------------------------------------------------------------------------
# ORC ingest (columnar interchange format beside parquet)
# ---------------------------------------------------------------------------

_DOCS_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def ensure_documents_orc(sf_dir: str, n_shards: int = 4) -> str:
    """Convert documents.parquet into n_shards ORC files (idempotent,
    cached by scale dir). Returns the shard directory."""
    import pyarrow.orc as paorc

    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_orc_{scale}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    n = t.num_rows
    step = max(1, (n + n_shards - 1) // n_shards)
    for i, off in enumerate(range(0, n, step)):
        paorc.write_table(t.slice(off, step), os.path.join(out_dir, f"documents_{i:04d}.orc"))
    open(marker, "w").close()
    return out_dir


def read_documents_orc(sf_dir: str) -> "rd.Dataset":
    """documents as a Dataset via the ORC path.

    Ray Data has no native ORC reader; the scalable shape is the same
    one a custom datasource uses — a Dataset of file paths fanned out
    to tasks that each decode one ORC shard with pyarrow.orc into
    Arrow batches. Decode happens on workers (never the driver) and
    shards stream independently, so the pattern holds at any shard
    count."""
    import pyarrow.orc as paorc

    shard_dir = ensure_documents_orc(sf_dir)
    paths = sorted(
        os.path.join(shard_dir, f) for f in os.listdir(shard_dir) if f.endswith(".orc")
    )
    ds = rd.from_items([{"path": p} for p in paths])

    def decode(t: pa.Table) -> "pa.Table":
        tables = [paorc.read_table(p, columns=_DOCS_COLS) for p in t["path"].to_pylist()]
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow", batch_size=1)
