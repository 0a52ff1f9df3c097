"""Text-analysis pipelines over the documents table (actor-pool stages)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.textstats import (
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
