"""Batch-98: NFC drift audit, rendezvous hashing, knapsack curve."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents",):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(mine, con, sql):
    odf = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    return odf


def test_nfc_audit_oracle_and_drift_signal(ray_session):
    from pdfrust_ray.fixtures.corpus import ensure_unicode_fixture
    from pdfrust_ray.pipelines.conversation import turn_nfc_audit, turn_nfc_audit_sql

    base = ensure_unicode_fixture()
    mine = turn_nfc_audit(base)
    odf = duckdb.connect().execute(
        turn_nfc_audit_sql(f"{base}/shards/*.parquet")
    ).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    # the fixture plants decomposed prose that drifts under NFC in
    # every role, and NFKC-only forms that must NOT drift
    assert (mine["n_nfc_drift_turns"] > 0).all()
    # a drifting turn is necessarily non-ASCII (NFC is identity on ASCII)
    assert (mine["n_nfc_drift_turns"] <= mine["n_nonascii_turns"]).all()
    # NFKC-only forms (ligatures/fullwidth) are non-ASCII but NFC-stable
    assert (mine["n_nonascii_turns"] > mine["n_nfc_drift_turns"]).any()


def test_nfc_python_duckdb_agree_on_composed_forms(ray_session):
    """Spot-check unicodedata vs utf8proc agreement on classic NFC
    cases: decomposed e + combining acute, Hangul jamo, singleton."""
    import unicodedata

    con = duckdb.connect()
    for s in ["é", "가", "Å", "café", "ﬁnal"]:
        duck = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert duck == unicodedata.normalize("NFC", s), repr(s)


def test_rendezvous_oracle_and_hrw_guarantee(ray_session, con):
    from pdfrust_ray.pipelines.datasetops import (
        rendezvous_hash_audit,
        rendezvous_hash_audit_sql,
    )

    mine = rendezvous_hash_audit(SF)
    _cmp(mine, con, rendezvous_hash_audit_sql())
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert int(mine["n_docs"].sum()) == n_docs
    assert len(mine) == 8
    # HRW guarantee: moved keys only go TO the new worker, so total
    # movement is exactly the new worker's final ownership (~1/9)
    moved = int(mine["n_moved"].sum())
    assert 0 < moved < n_docs / 4
    # brute-force recount on a sample of doc_ids
    import hashlib

    ids = [r[0] for r in con.execute("SELECT doc_id FROM documents LIMIT 40").fetchall()]
    workers = [f"w{i}" for i in range(9)]

    def owner(d, ws):
        return max(
            range(len(ws)),
            key=lambda i: (
                int.from_bytes(
                    hashlib.md5(f"{ws[i]}|{d}".encode()).digest()[:4], "big"
                ),
                i,
            ),
        )

    brute_moved = sum(1 for d in ids if owner(d, workers[:8]) != owner(d, workers))
    # every sampled mover goes to w8
    for d in ids:
        if owner(d, workers[:8]) != owner(d, workers):
            assert owner(d, workers) == 8


def test_knapsack_oracle_and_dp_properties(ray_session, con):
    from pdfrust_ray.pipelines.llmdata import doc_knapsack_curve, doc_knapsack_curve_sql

    mine = doc_knapsack_curve(SF)
    _cmp(mine, con, doc_knapsack_curve_sql())
    # curve is monotone and starts at 0
    assert int(mine.loc[0, "best_quality"]) == 0
    assert (mine["best_quality"].diff().fillna(0) >= 0).all()
    assert int(mine["best_quality"].iloc[-1]) > 0
    # optimality: DP >= greedy-by-density at the full budget
    rows = con.execute(
        r"""
        WITH scored AS (
            SELECT len(list_filter(string_split_regex(text, '\s+'),
                                   w -> w <> '')) AS w,
                   len(list_distinct(list_filter(string_split_regex(text, '\s+'),
                                                 w -> w <> ''))) AS nd
            FROM documents WHERE lang = 'en'
        )
        SELECT w, (nd * 1000) // w AS v FROM scored
        WHERE w > 0 AND w <= 500
        """
    ).fetchall()
    items = sorted(rows, key=lambda r: r[1] / r[0], reverse=True)
    cap, greedy = 500, 0
    for w, v in items:
        if w <= cap:
            cap -= w
            greedy += v
    assert int(mine["best_quality"].iloc[-1]) >= greedy


def test_knapsack_maxplus_merge_equals_serial(ray_session):
    """Shard-split DP + max-plus merge == single-pass DP on any split."""
    rng = np.random.RandomState(7)
    items = [(int(rng.randint(1, 60)), int(rng.randint(1, 100))) for _ in range(80)]
    B = 200

    def dp_of(its):
        dp = np.zeros(B + 1, dtype=np.int64)
        for w, v in its:
            if w <= B:
                dp[w:] = np.maximum(dp[w:], dp[: B + 1 - w] + v)
        return dp

    def maxplus(a, b):
        out = np.full(B + 1, np.iinfo(np.int64).min, dtype=np.int64)
        for k in range(B + 1):
            np.maximum(out[k:], a[k] + b[: B + 1 - k], out=out[k:])
        return out

    whole = dp_of(items)
    for cut in (1, 13, 40, 79):
        merged = maxplus(dp_of(items[:cut]), dp_of(items[cut:]))
        assert (merged == whole).all()
