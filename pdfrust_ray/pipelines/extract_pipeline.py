"""The flagship pipeline: transcript shards -> extracted turns.

Shape (SURVEY §3.4):

  read_parquet(shards, columns=[conv_id, turn_idx, text])   # pruned read
    -> map_batches(add_payload_len)                         # stateless size probe
    -> [skew split] filter small / big by payload bytes     # repartition-by-bytes
    -> map_batches(ExtractTurns, concurrency=pool,
                   batch_size=B, batch_format="pyarrow")    # actor pools
       (big rows go to a dedicated pool with tiny batches)
    -> union
    -> sort(conv_id, turn_idx)                              # THE ordering shuffle
    -> write_parquet(group dir)                             # resumable partitions

At 100 TB the only all-to-all exchange is the final sort; everything
upstream is embarrassingly parallel per block. The skew split keeps a
single giant PDF from stalling a whole 8k-row batch behind one actor.

Never calls ray.init(); callers own the session.
"""

from __future__ import annotations

import os
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.transcripts import list_shards, read_transcripts
from ..stages.extractors import ExtractTurns, add_payload_len
from ..state import manifest

# payloads above this many (string) bytes route to the big-row pool
BIG_PAYLOAD_BYTES = 256 * 1024
ENGINE_VERSION = "0.1.0"


def _default_sort_partitions() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, min(cpus, 64))


# bound on sort partitions: Ray's range shuffle creates partitions^2
# intermediate objects, so 512 caps the sort's metadata footprint at
# ~262k objects regardless of input volume
MAX_SORT_PARTITIONS = 512


def _bytes_based_sort_partitions(input_bytes: int | None) -> int:
    """Sort partition count from DATA VOLUME, not CPU count: one
    partition per target_max_block_size of input, floored at the
    cluster CPU count (small inputs still use every core) and capped at
    MAX_SORT_PARTITIONS. On a 100x-scale multi-node run this keeps sort
    blocks near the configured block size instead of producing
    cpu_count giant partitions; when the input size is unknown it falls
    back to the CPU heuristic."""
    cpu_based = _default_sort_partitions()
    if not input_bytes or input_bytes <= 0:
        return cpu_based
    from ray.data.context import DataContext

    tgt = DataContext.get_current().target_max_block_size or (128 << 20)
    by_bytes = (int(input_bytes) + tgt - 1) // tgt
    return int(max(4, min(max(by_bytes, cpu_based), MAX_SORT_PARTITIONS)))


def build_extraction(
    ds,
    mode: str = "text",
    batch_size: int = 512,
    concurrency=None,
    big_concurrency: int | None = None,
    skew_split: bool = False,
    order: bool = True,
    sort_partitions: int | None = None,
    spec_mode: bool = False,
):
    """Attach the extraction stages to a transcript Dataset.

    skew_split: when False (default) a single actor pool handles all
    payload sizes — the streaming executor's size-based block splitting
    plus sub-second per-document cost bounds head-of-line blocking, and
    the input is scanned once. When True, rows above BIG_PAYLOAD_BYTES
    route to a dedicated small-batch pool (explicit repartition-by-bytes)
    at the cost of a second input scan — the right call when single
    documents reach hundreds of MB and must not share a pool with the
    small-row stream.

    sort_partitions: block count entering the ordering sort. Ray's range
    shuffle creates partitions^2 intermediate objects, so many tiny
    blocks make the sort object-store-metadata-bound (measured 14s ->
    0.4s on 100k rows by coalescing 128 -> 16 blocks first). Default =
    max(input_bytes / target_max_block_size, cluster CPU count) capped
    at MAX_SORT_PARTITIONS — the bytes term is what scales on a
    multi-node run (the input size probe is metadata-only on a fresh
    parquet read).
    """
    input_bytes = None
    if order and sort_partitions is None:
        try:
            # metadata-cheap on the raw read (no stages attached yet)
            input_bytes = ds.size_bytes()
        except Exception:
            input_bytes = None
    # zero_copy_batch: these stages never mutate the input table
    # (append_column / filter build new tables), so skip Ray Data's
    # defensive copy and read the object-store block in place
    ds = ds.map_batches(add_payload_len, batch_format="pyarrow", zero_copy_batch=True)
    if big_concurrency is None:
        # size the big-payload pool with the cluster: oversized docs cost
        # seconds each, so a fixed tiny pool serializes the skewed tail
        big_concurrency = max(2, _default_sort_partitions() // 2)
    # autoscaling pools (min, max): fixed-size pools on a union plan can
    # deadlock when branch pools + sort tasks oversubscribe the CPUs; a
    # non-trivial min pre-warms the pool so ramp-up doesn't serialize
    pool = (
        # high floor: pool ramp-up measurably costs ~10% of bench wall
        # (autoscaling still backs off when idle; 2 cpus stay free for
        # read/shuffle tasks so fixed-pool starvation can't occur)
        (max(1, concurrency - 2), concurrency)
        if isinstance(concurrency, int)
        else concurrency
    )
    if skew_split:
        small = ds.map_batches(
            lambda t: t.filter(pc.less_equal(t["payload_len"], BIG_PAYLOAD_BYTES)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            ExtractTurns,
            fn_constructor_kwargs={"mode": mode, "spec_mode": spec_mode},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=pool,
        )
        big = ds.map_batches(
            lambda t: t.filter(pc.greater(t["payload_len"], BIG_PAYLOAD_BYTES)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            ExtractTurns,
            fn_constructor_kwargs={"mode": mode, "spec_mode": spec_mode},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4,  # bytes-capped batching for oversized payloads
            concurrency=(max(1, big_concurrency // 2), big_concurrency),
        )
        out = small.union(big)
    else:
        out = ds.map_batches(
            ExtractTurns,
            fn_constructor_kwargs={"mode": mode, "spec_mode": spec_mode},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=pool,
        )
    if order:
        npart = sort_partitions or _bytes_based_sort_partitions(input_bytes)
        out = out.repartition(npart).sort(["conv_id", "turn_idx"])
    return out


def _group_metrics(group_path: str) -> dict:
    """Cheap columnar readback of counters for the manifest."""
    t = pq.read_table(group_path, columns=["parse_status", "bytes_decoded"])
    status = t["parse_status"]
    ok = pc.sum(pc.cast(pc.equal(status, "ok"), "int64")).as_py() or 0
    return {
        "rows": t.num_rows,
        "rows_ok": ok,
        "rows_error": t.num_rows - ok,
        "bytes_decoded": pc.sum(t["bytes_decoded"]).as_py() or 0,
    }


def run_extraction(
    input_path: str,
    out_dir: str,
    mode: str = "text",
    group_size: int = 16,
    batch_size: int = 512,
    concurrency=None,
    resume: bool = True,
    skew_split: bool = False,
    override_num_blocks: int | None = None,
    spec_mode: bool = False,
) -> dict:
    """Checkpoint-resumable run: shard groups -> partitioned output.

    Returns overall metrics {rows, bytes_decoded, turns_per_sec, ...}.
    """
    shards = list_shards(input_path)
    groups = [shards[i : i + group_size] for i in range(0, len(shards), group_size)]
    done = manifest.completed_groups(out_dir) if resume else set()
    os.makedirs(out_dir, exist_ok=True)

    t_start = time.perf_counter()
    skipped = 0
    for gid, files in enumerate(groups):
        if gid in done:
            skipped += 1
            continue
        g0 = time.perf_counter()
        read_kwargs = {}
        if override_num_blocks:
            read_kwargs["override_num_blocks"] = override_num_blocks
        ds = read_transcripts(files, **read_kwargs)
        out = build_extraction(
            ds,
            mode=mode,
            batch_size=batch_size,
            concurrency=concurrency,
            skew_split=skew_split,
            spec_mode=spec_mode,
        )
        tmp = manifest.group_dir(out_dir, gid) + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        out.write_parquet(tmp)
        metrics = _group_metrics(tmp)
        manifest.commit_group(
            out_dir,
            gid,
            tmp,
            {
                "inputs": files,
                "mode": mode,
                "engine_version": ENGINE_VERSION,
                "duration_sec": round(time.perf_counter() - g0, 3),
                **metrics,
            },
        )
    wall = time.perf_counter() - t_start

    all_m = manifest.read_all(out_dir)
    rows = sum(m["rows"] for m in all_m)
    processed_rows = sum(m["rows"] for m in all_m if m["group_id"] not in done)
    return {
        "rows": rows,
        "rows_ok": sum(m["rows_ok"] for m in all_m),
        "rows_error": sum(m["rows_error"] for m in all_m),
        "bytes_decoded": sum(m["bytes_decoded"] for m in all_m),
        "groups": len(groups),
        "groups_skipped_resume": skipped,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(processed_rows / wall, 1) if wall > 0 and processed_rows else 0.0,
    }
