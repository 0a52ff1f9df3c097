"""Threshold-calibration sweeps.

Before a 100-TB pipeline commits to a filter threshold it runs the
sweep: how many documents/tokens survive at every candidate cutoff?
These operators produce that operating curve in ONE corpus pass (the
exchange is grid-sized, never doc-sized), completing the calibration
family alongside the hamming landscape (simhash_hamming_histogram*)
and the LSH health census (simhash_band_skew_census).

Grids are integer centi-units so both sides compare against the
identical float64 (t_centi / 100.0) and the curves hash-match the
DuckDB twins exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_Q_GRID = list(range(0, 100, 5))  # quality thresholds, centi-units
_J_GRID = list(range(70, 100, 5))  # jaccard thresholds, centi-units


def quality_threshold_sweep(sf_dir: str) -> pd.DataFrame:
    """Retention curve of the quality filter: for every threshold t in
    {0.00, 0.05, ..., 0.95}, how many documents and how many chars
    survive `quality >= t`.  The curve is what a data owner reads to
    pick the cutoff that hits a token budget — the quality_scores /
    quality_budget_selection pair answers "score one doc" and "select
    to a budget"; this answers "what does every cutoff cost".

    Distributed shape: each batch scores its own docs with the same
    deterministic kernel quality_scores uses and reduces IN PLACE to a
    |grid|-row partial (t_centi, docs, chars); one grid-sized groupby
    Sum folds the partials.  No driver-side doc table, no second scan.

    Output: (t_centi, n_docs_kept, n_chars_kept) int64, ORDER BY
    t_centi."""
    from ray.data.aggregate import Sum

    from ..functions.textstats import quality_score

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "n_chars"]
    )
    grid = np.array(_Q_GRID, dtype=np.int64)
    cuts = grid.astype(np.float64) / 100.0

    def partial(t: pa.Table) -> pa.Table:
        qs = np.array(
            [quality_score(x) for x in t["text"].to_pylist()], dtype=np.float64
        )
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        docs = np.empty(len(grid), dtype=np.int64)
        chars = np.empty(len(grid), dtype=np.int64)
        for i, c in enumerate(cuts):
            m = qs >= c
            docs[i] = int(m.sum())
            chars[i] = int(nch[m].sum())
        return pa.table(
            {
                "t_centi": pa.array(grid),
                "docs": pa.array(docs),
                "chars": pa.array(chars),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("t_centi")
        .aggregate(
            Sum("docs", alias_name="n_docs_kept"),
            Sum("chars", alias_name="n_chars_kept"),
        )
        .to_pandas()
    )
    return out.sort_values("t_centi").reset_index(drop=True).astype("int64")


def quality_threshold_sweep_sql() -> str:
    """Exact twin: the quality_scores twin nested as a subquery,
    cross-joined against the same centi-grid."""
    from .textops import quality_scores_sql

    grid = ", ".join(str(t) for t in _Q_GRID)
    return f"""
        WITH qs AS MATERIALIZED (
            SELECT * FROM ({quality_scores_sql()})
        ), g AS (
            SELECT UNNEST([{grid}]) AS t_centi
        )
        SELECT CAST(g.t_centi AS BIGINT) AS t_centi,
               CAST(COUNT(*) FILTER (WHERE qs.quality >= g.t_centi / 100.0)
                    AS BIGINT) AS n_docs_kept,
               CAST(COALESCE(SUM(d.n_chars)
                        FILTER (WHERE qs.quality >= g.t_centi / 100.0), 0)
                    AS BIGINT) AS n_chars_kept
        FROM g CROSS JOIN qs JOIN documents d USING (doc_id)
        GROUP BY 1 ORDER BY 1
    """


def jaccard_threshold_sweep(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Retention curve of near-dup filtering: for every Jaccard
    threshold t in {0.70, 0.75, ..., 0.95}, the number of qualifying
    pairs and the number of distinct documents involved — the curve a
    dedup owner reads next to lsh_plan_table's collision S-curves
    before picking the banding AND the cutoff.

    Built on the candidate-COMPLETE exact pair set (ngram_jaccard_dedup
    at the grid minimum 0.70 — prefix-filter recall is guaranteed at
    the threshold, so every grid point is a subset of the computed
    set); the sweep itself is a driver-side fold over the pair list,
    bounded by the near-dup mass at 0.70. The grid floor is 0.70:
    no production dedup runs lower, and the prefix filter weakens
    quadratically below it. Note the synthetic test corpus is the
    documented dense-vocab ADVERSARIAL regime for AllPairs (fixed
    2k-shingle vocabulary -> posting lists ~ corpus-sized), so this
    sweep costs minutes at 5k docs there and is excluded from the
    sf0.1 bench; on open-vocabulary corpora the lists thin with
    corpus growth. For an exploratory low-threshold landscape use
    the banded hamming histogram instead.

    Output: (t_centi, n_pairs, n_docs) int64, ORDER BY t_centi."""
    from ..stages.dedup import ngram_jaccard_dedup

    pairs = ngram_jaccard_dedup(sf_dir, threshold=0.7, k=k)
    ja = pairs["jaccard"].to_numpy(dtype=np.float64)
    a = pairs["doc_a"].to_numpy(dtype=np.int64)
    b = pairs["doc_b"].to_numpy(dtype=np.int64)
    rows = []
    for tc in _J_GRID:
        m = ja >= (tc / 100.0)
        n_docs = len(np.unique(np.concatenate([a[m], b[m]]))) if m.any() else 0
        rows.append((tc, int(m.sum()), n_docs))
    return pd.DataFrame(
        rows, columns=["t_centi", "n_pairs", "n_docs"]
    ).astype("int64")


def jaccard_threshold_sweep_sql(k: int = 5) -> str:
    """Exact twin: the exact shingle-Jaccard pair CTE at the grid
    minimum, cross-joined against the same centi-grid."""
    from ..stages.dedup import minhash_lsh_dedup_sql

    grid = ", ".join(str(t) for t in _J_GRID)
    return f"""
        WITH pr AS MATERIALIZED (
            SELECT * FROM ({minhash_lsh_dedup_sql(threshold=0.7, k=k)})
        ), g AS (
            SELECT UNNEST([{grid}]) AS t_centi
        ), hits AS (
            SELECT g.t_centi, pr.doc_a, pr.doc_b
            FROM g JOIN pr ON pr.jaccard >= g.t_centi / 100.0
        ), docs AS (
            SELECT t_centi, doc_a AS d FROM hits
            UNION
            SELECT t_centi, doc_b FROM hits
        )
        SELECT CAST(g.t_centi AS BIGINT) AS t_centi,
               CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(COALESCE(d.n_docs, 0) AS BIGINT) AS n_docs
        FROM g
        LEFT JOIN (SELECT t_centi, COUNT(*) AS n_pairs FROM hits
                   GROUP BY 1) p USING (t_centi)
        LEFT JOIN (SELECT t_centi, COUNT(*) AS n_docs FROM docs
                   GROUP BY 1) d USING (t_centi)
        ORDER BY 1
    """
