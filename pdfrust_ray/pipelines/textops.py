"""Text-analysis pipelines over the documents table (actor-pool stages)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.textstats import (
    BPE_PATTERN,
    bpe_token_count,
    lang_id,
    md5_fingerprint,
    quality_score,
    rolling_fingerprint,
    token_count,
)


class TextStats:
    """One actor-held stage computing all per-doc text statistics.

    State (compiled regexes / stopword tables) is module-level and
    loaded at import inside the actor; __call__ is a tight per-row loop
    over the batch columns.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "token_count": pa.array([token_count(t) for t in texts], pa.int64()),
                "bpe_token_count": pa.array([bpe_token_count(t) for t in texts], pa.int64()),
                "lang_pred": pa.array([lang_id(t) for t in texts], pa.string()),
                "quality": pa.array([quality_score(t) for t in texts], pa.float64()),
                "fp_md5": pa.array([md5_fingerprint(t) for t in texts], pa.string()),
                "fp_rolling": pa.array([str(rolling_fingerprint(t)) for t in texts], pa.string()),
            }
        )


def text_stats(sf_dir: str) -> "rd.Dataset":
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TextStats, batch_format="pyarrow", batch_size=1024, concurrency=(1, 2))


def token_counts(sf_dir: str) -> pd.DataFrame:
    out = text_stats(sf_dir).select_columns(["doc_id", "token_count"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def token_counts_sql() -> str:
    # string_split_regex counts empty leading/trailing fields exactly like
    # the engine's re.split(r"\s+") (parity pinned in tests)
    return r"""
        SELECT doc_id,
               CAST(length(string_split_regex(text, '\s+')) AS BIGINT) AS token_count
        FROM documents
        ORDER BY doc_id
    """


def bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    out = text_stats(sf_dir).select_columns(["doc_id", "bpe_token_count"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def bpe_token_counts_sql() -> str:
    return f"""
        SELECT doc_id,
               CAST(length(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
                   AS bpe_token_count
        FROM documents
        ORDER BY doc_id
    """


def fingerprints(sf_dir: str) -> pd.DataFrame:
    out = text_stats(sf_dir).select_columns(["doc_id", "fp_md5"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def fingerprints_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp_md5 FROM documents ORDER BY doc_id"


def language_profile(sf_dir: str) -> pd.DataFrame:
    """lang-ID heuristic rollup (rows-only check; the heuristic has no
    SQL equivalent)."""
    out = text_stats(sf_dir).select_columns(["doc_id", "lang_pred", "quality"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _byte_masks(batch: pa.Table) -> pa.Table:
    """Per-doc 256-bit byte-set bitmask (32 packed bytes) — the charset
    signature DuckDB's jaccard() compares (it operates on UTF-8 BYTE
    sets, verified empirically: 'héllo' vs 'hello' -> 0.5)."""
    import numpy as np

    masks = []
    for t in batch["text"].to_pylist():
        bits = np.zeros(256, dtype=np.uint8)
        bits[np.frombuffer(t.encode("utf-8"), dtype=np.uint8)] = 1
        masks.append(np.packbits(bits).tobytes())
    return pa.table({"doc_id": batch["doc_id"], "mask": pa.array(masks, pa.binary())})


def charset_best_match(sf_dir: str) -> pd.DataFrame:
    """For every document, the most byte-set-similar OTHER document
    (Jaccard over UTF-8 byte sets; ties by match doc_id ascending).

    Two phases: (1) distributed signature pass — each doc reduces to a
    32-byte bitmask (the only thing collected: N x 32 bytes, not the
    corpus); (2) broadcast the unpacked [N, 256] matrix with ray.put
    and scan blockwise — each batch computes its [batch, N]
    intersection block with one BLAS sgemm. The similarity is an
    exact int/int double division, so values hash-match the DuckDB
    jaccard() oracle bit-for-bit. Scale note: N x 256 bits broadcast
    is fine to ~10^7 docs; beyond that, bucket by mask-LSH bands and
    compare within-bucket (same trade as embedding_dedup's IVF path).
    """
    import numpy as np

    import ray

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sig = ds.map_batches(_byte_masks, batch_format="pyarrow").to_pandas()
    sig = sig.sort_values("doc_id").reset_index(drop=True)
    all_ids = sig["doc_id"].to_numpy(dtype=np.int64)
    packed = np.frombuffer(b"".join(sig["mask"]), dtype=np.uint8).reshape(len(sig), 32)
    # float32 so the [batch, N] product hits BLAS sgemm — numpy integer
    # matmul is a slow non-BLAS path (measured ~10x on 5000 docs); 0/1
    # sums of <= 256 are exact in float32
    B = np.unpackbits(packed, axis=1).astype(np.float32)  # [N, 256]
    pops = B.sum(axis=1).astype(np.int64)
    pos_of = {int(d): i for i, d in enumerate(all_ids)}
    ref = ray.put((all_ids, B, pops, pos_of))

    class BestMatch:
        def __init__(self):
            self.ids, self.B, self.pops, self.pos = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch["text"].to_pylist()
            dids = batch["doc_id"].to_pylist()
            X = np.zeros((len(texts), 256), dtype=np.float32)
            for i, t in enumerate(texts):
                X[i, np.frombuffer(t.encode("utf-8"), dtype=np.uint8)] = 1.0
            inter = np.rint(X @ self.B.T).astype(np.int64)  # exact counts
            xpops = X.sum(axis=1).astype(np.int64)
            union = xpops[:, None] + self.pops[None, :] - inter
            # exact int/int double division; two empty-text docs give
            # union == 0 — define sim = 0 there instead of a NaN that
            # would poison max/argmax tie-breaking
            sims = np.divide(
                inter, union, out=np.zeros(inter.shape, dtype=np.float64), where=union > 0
            )
            rows = np.arange(len(dids))
            self_pos = np.fromiter((self.pos[int(d)] for d in dids), dtype=np.int64)
            sims[rows, self_pos] = -1.0  # exclude self
            best = sims.max(axis=1)
            # tie-break: smallest match_id among the argmax columns
            is_best = sims == best[:, None]
            match = np.where(is_best, self.ids[None, :], np.iinfo(np.int64).max).min(axis=1)
            return pa.table(
                {
                    "doc_id": pa.array(np.asarray(dids, dtype=np.int64), pa.int64()),
                    "match_id": pa.array(match, pa.int64()),
                    "sim": pa.array(best, pa.float64()),
                }
            )

    out = ds.map_batches(BestMatch, batch_format="pyarrow", batch_size=512, concurrency=(1, 2)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def charset_best_match_lsh(sf_dir: str, n_bands: int = 8, bucket_cap: int = 20_000) -> pd.DataFrame:
    """Bucketed scale path for charset_best_match — the mask-band LSH
    fallback the exact variant's docstring names: no [N, 256] broadcast,
    so it works past the exact variant's ~10^7-doc cap.

    Shape: (1) signature pass — each doc reduces to its 32-byte byte-set
    mask; (2) band rows — the mask is split into `n_bands` 32-bit bands
    and each (band_id, band_value) key becomes a bucket (docs sharing
    any exact band collide); (3) groupby(shard).map_groups — within each
    bucket, pairwise intersections via one unpackbits+sgemm block, emit
    each member's best bucket-local candidate; (4) groupby(doc_id) —
    reduce to the best candidate across buckets (max sim, ties by min
    match_id). Approximate by construction: a doc whose true best match
    shares NO exact 32-bit band is mis-matched; where the candidate IS
    the true best the sim value is the same exact int/int division as
    the exact variant. Hot buckets (homogeneous corpora share e.g. the
    ascii-lowercase band) are capped at `bucket_cap` members with a
    logged drop — the within-bucket work is O(cap * members), never
    O(N^2).
    """
    import numpy as np

    import ray.data as _rd

    ds = _rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids, bids, bvals, masks, shards = [], [], [], [], []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            bits = np.zeros(256, dtype=np.uint8)
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            if len(data):
                bits[data] = 1
            packed = np.packbits(bits)
            words = packed.view(">u4")  # 8 x 32-bit bands
            for b in range(min(n_bands, 8)):
                v = int(words[b])
                doc_ids.append(did)
                bids.append(b)
                bvals.append(v)
                masks.append(packed.tobytes())
                shards.append((v ^ (b * 0x9E3779B9)) % 64)
        return pa.table(
            {
                "shard": pa.array(shards, pa.int32()),
                "band_id": pa.array(bids, pa.int32()),
                "band_value": pa.array(bvals, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "mask": pa.array(masks, pa.binary()),
            }
        )

    def best_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        out_d, out_m, out_s = [], [], []
        for _, grp in g.groupby(["band_id", "band_value"], sort=False):
            grp = grp.drop_duplicates("doc_id")
            if len(grp) < 2:
                continue
            if len(grp) > bucket_cap:
                print(
                    f"charset_lsh: hot bucket with {len(grp)} members capped at {bucket_cap}"
                )
                grp = grp.nsmallest(bucket_cap, "doc_id")
            ids = grp["doc_id"].to_numpy(dtype=np.int64)
            packed = np.frombuffer(b"".join(grp["mask"]), dtype=np.uint8).reshape(len(grp), 32)
            B = np.unpackbits(packed, axis=1).astype(np.float32)
            pops = B.sum(axis=1).astype(np.int64)
            inter = np.rint(B @ B.T).astype(np.int64)
            union = pops[:, None] + pops[None, :] - inter
            sims = np.divide(
                inter, union, out=np.zeros(inter.shape, dtype=np.float64), where=union > 0
            )
            np.fill_diagonal(sims, -1.0)
            best = sims.max(axis=1)
            is_best = sims == best[:, None]
            match = np.where(is_best, ids[None, :], np.iinfo(np.int64).max).min(axis=1)
            out_d.extend(ids.tolist())
            out_m.extend(match.tolist())
            out_s.extend(best.tolist())
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "match_id": pd.Series(out_m, dtype="int64"),
                "sim": pd.Series(out_s, dtype="float64"),
            }
        )

    def add_doc_shard(t: pa.Table) -> pa.Table:
        shard = (np.asarray(t["doc_id"]) % 64).astype(np.int32)
        return t.append_column("doc_shard", pa.array(shard, pa.int32()))

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        # per-doc best across buckets; Ray's map_groups dispatches a UDF
        # call per group, so the real per-doc reduce runs as a vectorized
        # pandas groupby inside 64 coarse shards (same trick as dedup)
        rows = []
        for did, grp in g.groupby("doc_id", sort=False):
            best = grp["sim"].max()
            rows.append((int(did), int(grp.loc[grp["sim"] == best, "match_id"].min()), float(best)))
        return pd.DataFrame(rows, columns=["doc_id", "match_id", "sim"]).astype(
            {"doc_id": "int64", "match_id": "int64", "sim": "float64"}
        )

    out = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(best_in_shard, batch_format="pandas")
        .map_batches(add_doc_shard, batch_format="pyarrow")
        .groupby("doc_shard")
        .map_groups(reduce_shard, batch_format="pandas")
        .to_pandas()
    )
    if "doc_id" not in out.columns:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "match_id": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def charset_best_match_sql() -> str:
    return """
        WITH s AS (
            SELECT a.doc_id AS doc_id, b.doc_id AS match_id,
                   jaccard(a.text, b.text) AS sim
            FROM documents a JOIN documents b ON a.doc_id <> b.doc_id
        ), r AS (
            SELECT doc_id, match_id, sim,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY sim DESC, match_id) AS rk
            FROM s
        )
        SELECT doc_id, match_id, sim FROM r WHERE rk = 1 ORDER BY doc_id
    """
