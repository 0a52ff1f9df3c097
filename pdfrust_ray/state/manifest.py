"""Per-partition lineage manifests for checkpoint-resumable runs.

Protocol (SURVEY §7.6 "manifest-last write"):
  - output is partitioned by input shard group: out_dir/group=NNNN/
  - each group's data files are written first (to a temp dir, renamed
    into place), THEN its manifest out_dir/_manifests/group-NNNN.json
    is written. A crash between the two leaves data without manifest;
    resume trusts only manifests, so the group is redone (idempotent:
    the rename replaces the partial dir).
  - the manifest records lineage (exact input files), row counts,
    metric counters, and the engine version — enough to audit any
    partition back to its inputs.
"""

from __future__ import annotations

import json
import os
import shutil


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def manifest_path(out_dir: str, group_id: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"group-{group_id:04d}.json")


def group_dir(out_dir: str, group_id: int) -> str:
    return os.path.join(out_dir, f"group={group_id:04d}")


def completed_groups(out_dir: str) -> set[int]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    done = set()
    for name in os.listdir(d):
        if name.startswith("group-") and name.endswith(".json"):
            try:
                with open(os.path.join(d, name)) as f:
                    m = json.load(f)
                done.add(int(m["group_id"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue  # unreadable manifest -> treat group as incomplete
    return done


def commit_group(out_dir: str, group_id: int, tmp_dir: str, meta: dict) -> None:
    """Atomically move the group's data into place, then write its manifest."""
    final = group_dir(out_dir, group_id)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp_dir, final)
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = manifest_path(out_dir, group_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"group_id": group_id, **meta}, f, indent=1)
    os.replace(tmp, path)


def read_all(out_dir: str) -> list[dict]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out
