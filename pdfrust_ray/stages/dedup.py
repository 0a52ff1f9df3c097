"""Deduplication pipelines over a documents table.

All pipelines follow the scale discipline: per-batch vectorized
signature computation (actor pools hold the hasher state), hash-keyed
`groupby` for the single wide exchange, and candidate verification
before reporting — never an O(n^2) driver loop.

  - exact_dedup: content-hash partition + per-group min — the groupby
    key is md5(text) (never the full text), so the shuffle moves 32-byte
    keys, not documents.
  - minhash_lsh_dedup: shingle -> 64-perm MinHash -> LSH bands ->
    groupby(band_id, band_hash) -> candidate pairs -> exact Jaccard
    verify on the pair texts.
  - simhash_dedup: 64-bit simhash, banded into 4x16-bit chunks for
    candidate generation, verified by Hamming distance.
  - embedding_dedup: cosine near-duplicates over an embedding column
    via normalized blockwise matmul (broadcast one side with ray.put).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..functions.minhash import MinHasher, char_shingles, hamming64, jaccard, simhash64


def _docs(sf_dir: str, columns=("doc_id", "text")) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def add_md5(batch: pa.Table) -> pa.Table:
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
    return batch.append_column("text_hash", pa.array(h, pa.string()))


def exact_dedup(sf_dir: str) -> "rd.Dataset":
    """One row per distinct text: (text_hash, doc_id=min, dup_count)."""
    ds = _docs(sf_dir).map_batches(add_md5, batch_format="pyarrow")
    ds = ds.select_columns(["text_hash", "doc_id"])  # drop text before the shuffle
    return ds.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="dup_count"),
    )


class MinHashStage:
    """Actor: doc -> (band_id, band_hash, doc_id) rows."""

    def __init__(self, n_perm: int = 64, n_bands: int = 8, k: int = 5):
        self.mh = MinHasher(n_perm=n_perm)
        self.n_bands = n_bands
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = self.mh.signature(char_shingles(text, self.k))
            for b, bh in enumerate(self.mh.bands(sig, self.n_bands)):
                doc_ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(hashlib.blake2b(bh, digest_size=8).hexdigest())
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
            }
        )


def minhash_candidates(sf_dir: str, n_bands: int = 8) -> "rd.Dataset":
    """Candidate duplicate pairs from LSH bucket collisions."""
    ds = _docs(sf_dir).map_batches(
        MinHashStage,
        fn_constructor_kwargs={"n_bands": n_bands},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand = ds.groupby(["band_id", "band_hash"]).map_groups(pairs_of_bucket, batch_format="pandas")
    return cand


def minhash_lsh_dedup(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """Verified near-duplicate pairs (doc_a, doc_b, jaccard >= threshold).

    The candidate set is small by construction (band collisions), so the
    verify step pulls just the candidate texts and checks exact Jaccard.
    Scale note: at 10^12 docs the verify step becomes a hash-partitioned
    join of the (small) candidate-pair set against the documents table
    on doc_id (broadcast the pair-id set as a filter, then pair up in a
    bucketed map_groups) — the candidate generation above is already
    all-shuffle-shaped and unchanged.
    """
    cand = minhash_candidates(sf_dir).to_pandas()
    if len(cand):
        cand = cand.drop_duplicates(["doc_a", "doc_b"])
    if not len(cand):
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "jaccard": pd.Series([], dtype="float64")}
        )
    needed = set(cand["doc_a"]) | set(cand["doc_b"])
    texts = {}
    for b in _docs(sf_dir).iter_batches(batch_size=4096, batch_format="pyarrow"):
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if d in needed:
                texts[d] = t
    rows = []
    for a, b2 in zip(cand["doc_a"], cand["doc_b"]):
        j = jaccard(char_shingles(texts[a]), char_shingles(texts[b2]))
        if j >= threshold:
            rows.append((int(a), int(b2), round(j, 6)))
    rows.sort()
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]) if rows else pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "jaccard": pd.Series([], dtype="float64")}
    )


class SimHashStage:
    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [simhash64(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                # store as hex so uint64 never overflows int64 columns
                "simhash": pa.array([f"{h:016x}" for h in hashes], pa.string()),
            }
        )


def simhash_signatures(sf_dir: str) -> "rd.Dataset":
    return _docs(sf_dir).map_batches(SimHashStage, batch_format="pyarrow", concurrency=(1, 2))


class SimHashBandStage:
    """Actor: doc -> 4 x (chunk_id, chunk_value, doc_id, simhash) band rows.

    A pair within Hamming distance <= 3 of a 64-bit simhash shares at
    least one identical 16-bit chunk (pigeonhole), so banding by chunk
    is a complete candidate generator for max_hamming <= 3."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, chunk_vals, sims = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            h = simhash64(text)
            hx = f"{h:016x}"
            for c in range(4):
                doc_ids.append(doc_id)
                chunk_ids.append(c)
                chunk_vals.append((h >> (16 * c)) & 0xFFFF)
                sims.append(hx)
        return pa.table(
            {
                "chunk_id": pa.array(chunk_ids, pa.int32()),
                "chunk_value": pa.array(chunk_vals, pa.int32()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "simhash": pa.array(sims, pa.string()),
            }
        )


def simhash_dedup(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by simhash banding (4 x 16-bit chunks) + Hamming
    verify.

    Scale shape: band rows shuffle by (chunk_id, chunk_value) — a
    16-byte-keyed groupby, never the documents — and pairs are generated
    and Hamming-verified inside each bucket's map_groups; only verified
    pairs reach the driver (cross-bucket duplicate pairs are dropped by
    a final drop_duplicates on the small pair set)."""

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        members = sorted(set(zip(g["doc_id"], g["simhash"])))
        out = []
        for i in range(len(members)):
            a, ha = members[i]
            for j in range(i + 1, len(members)):
                b, hb = members[j]
                d = hamming64(int(ha, 16), int(hb, 16))
                if d <= max_hamming:
                    out.append((min(a, b), max(a, b), d))
        if not out:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "hamming": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    bands = _docs(sf_dir).map_batches(SimHashBandStage, batch_format="pyarrow", concurrency=(1, 2))
    pairs = (
        bands.groupby(["chunk_id", "chunk_value"])
        .map_groups(pairs_of_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(pairs):
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "hamming": pd.Series([], dtype="int64")}
        )
    pairs = pairs.drop_duplicates(["doc_a", "doc_b"]).astype("int64")
    return pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def embedding_dedup(sf_dir: str, threshold: float = 0.95) -> pd.DataFrame:
    """Cosine near-duplicate pairs over the embeddings table.

    Broadcasts the (normalized) full matrix once with ray.put and scans
    it blockwise inside map_batches — each batch computes a [batch, N]
    similarity block; only above-threshold pairs leave the task.
    Scale note: the broadcast side is O(N x D); beyond what fits in the
    object store, assign IVF buckets (stages/similarity.py::AssignBucket)
    and compare within-bucket only via groupby(bucket).map_groups — the
    standard approximate near-dup trade.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    ref = ray.put((ids, mat))

    class CosineBlock:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            v = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            v = v / n
            sims = v @ self.mat.T  # [batch, N]
            ai, bj = np.nonzero(sims >= threshold)
            rows_a, rows_b, vals = [], [], []
            for i, j in zip(ai, bj):
                a, b = int(vid[i]), int(self.ids[j])
                if a < b:  # strict upper triangle, dedup across batches
                    rows_a.append(a)
                    rows_b.append(b)
                    vals.append(round(float(sims[i, j]), 6))
            return pa.table(
                {
                    "vec_a": pa.array(rows_a, pa.int64()),
                    "vec_b": pa.array(rows_b, pa.int64()),
                    "cosine": pa.array(vals, pa.float64()),
                }
            )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = ds.map_batches(CosineBlock, batch_format="pyarrow", batch_size=256, concurrency=(1, 2)).to_pandas()
    if out.empty:  # zero pairs -> typed empty frame (to_pandas loses columns)
        return pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def dedup_clusters(sf_dir: str, threshold: float = 0.8, max_rounds: int = 10) -> pd.DataFrame:
    """Near-duplicate clusters: connected components over the verified
    MinHash-LSH pair graph via min-label propagation.

    Each round is a (node -> min neighbor label) propagation over the
    edge list; rounds are bounded by the component diameter (near-dup
    clusters are tiny, so a handful of rounds converges). The pair graph
    is orders of magnitude smaller than the corpus (only verified
    near-dups), so rounds run on the driver here; at 10^12-doc scale
    each round is the same computation expressed as
    edges.groupby(node).min() joined back — all shuffle-shaped. Returns
    (doc_id, cluster_id) for every document with at least one
    near-duplicate, cluster_id = min doc_id of its component.
    """
    pairs = minhash_lsh_dedup(sf_dir, threshold=threshold)
    if not len(pairs):
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "cluster_id": pd.Series([], dtype="int64")}
        )
    # adjacency as a (node, neighbor) edge list in both directions
    edges = pd.concat(
        [
            pairs.rename(columns={"doc_a": "node", "doc_b": "nbr"})[["node", "nbr"]],
            pairs.rename(columns={"doc_b": "node", "doc_a": "nbr"})[["node", "nbr"]],
        ]
    )
    label = {n: n for n in set(edges["node"])}
    for _ in range(max_rounds):
        changed = False
        # propagate: label[node] = min(label[node], min(label[nbr]))
        nbr_min = (
            edges.assign(nl=edges["nbr"].map(label))
            .groupby("node")["nl"]
            .min()
        )
        for node, nl in nbr_min.items():
            if nl < label[node]:
                label[node] = nl
                changed = True
        if not changed:
            break
    out = pd.DataFrame(
        {"doc_id": list(label.keys()), "cluster_id": [label[n] for n in label]}
    ).astype("int64")
    return out.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
