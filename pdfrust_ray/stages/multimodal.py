"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow `binary` columns with a
metadata struct; decode / feature-extract run as actor-pool map_batches
stages with SMALL batch sizes (payload bytes dominate block size).

The actual codecs are not available in this environment, so the decode
step is STUBBED: `RealImageDecoder` raises NotImplementedError (the
documented integration point), and `FakeImageDecoder` produces a
deterministic feature vector from the bytes so the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and
tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),  # typed metadata (0 when unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (binary payloads of varied size)."""
    rng = np.random.RandomState(seed)
    rows = {
        "media_id": [],
        "kind": [],
        "payload": [],
        "width": [],
        "height": [],
        "duration_ms": [],
    }
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.randint(512, 65536))
        payload = rng.bytes(size)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(int(rng.randint(16, 4096)) if kind != "audio" else 0)
        rows["height"].append(int(rng.randint(16, 4096)) if kind != "audio" else 0)
        rows["duration_ms"].append(int(rng.randint(100, 600000)) if kind != "image" else 0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class RealImageDecoder:
    """The production integration point: decode bytes -> pixels.

    The image/audio libraries are not in this container; wire a real
    codec here (PIL / torchvision / ffmpeg) when deploying.
    """

    def __init__(self):
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "use FakeImageDecoder for plumbing tests"
        )


class FakeImageDecoder:
    """Deterministic stand-in decoder: bytes -> FEATURE_DIM float32
    feature vector (a keyed digest), + byte-length 'pixel' count."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim

    def _features(self, payload: bytes) -> np.ndarray:
        out = np.empty(self.feature_dim, dtype=np.float32)
        for i in range(self.feature_dim):
            h = hashlib.blake2b(payload, digest_size=8, key=i.to_bytes(2, "little")).digest()
            out[i] = int.from_bytes(h[:4], "little") / 2**32
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array([len(p) for p in batch["payload"].to_pylist()], pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32(), self.feature_dim)
                ),
            }
        )


def media_features(media_path_or_table, batch_size: int = 8) -> "rd.Dataset":
    """Decode/feature-extract pipeline over a media table.

    batch_size is deliberately tiny: payload bytes x batch x concurrency
    must fit the worker heap (binary columns dominate)."""
    if isinstance(media_path_or_table, pa.Table):
        ds = rd.from_arrow(media_path_or_table)
    else:
        ds = rd.read_parquet(media_path_or_table)
    return ds.map_batches(
        FakeImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 2),
    )
