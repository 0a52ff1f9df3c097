"""The grand capstone: extraction -> quality -> dedup -> pack, with
its chained golden-anchored twin and pipeline invariants."""

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def built(ray_session):
    from pdfrust_ray.fixtures.corpus import ensure_corpus
    from pdfrust_ray.pipelines.corpusbuild import transcript_corpus_build

    d = ensure_corpus("t2")
    return d, transcript_corpus_build(d)


def test_chained_twin_exact(built):
    from pdfrust_ray.pipelines.corpusbuild import transcript_corpus_build_sql

    d, mine = built
    con = duckdb.connect()
    odf = con.execute(
        transcript_corpus_build_sql(f"{d}/golden.parquet")
    ).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    assert len(mine) > 0


def test_pack_invariants(built):
    _, mine = built
    # within every (bucket, pack): positions are 0..k-1 in
    # (conv_id, turn_idx) order, and token sums respect the budget
    # unless the pack is a single oversized turn
    for (_, _), g in mine.groupby(["bucket", "pack_id"]):
        g = g.sort_values(["conv_id", "turn_idx"])
        assert list(g["pack_pos"]) == list(range(len(g)))
        if len(g) > 1:
            assert int(g["n_tokens"].sum()) <= 256


def test_dedup_and_filter_semantics(built, ray_session):
    """Survivors are exactly: ok, non-empty, quality >= 0.30, first
    occurrence of their text by (conv_id, turn_idx)."""
    import pyarrow.parquet as pq

    from pdfrust_ray.functions.textstats import quality_score

    d, mine = built
    g = pq.read_table(f"{d}/golden.parquet").to_pandas()
    g = g[(g["parse_status"] == "ok") & (g["extracted_text"] != "")].copy()
    g["q"] = g["extracted_text"].map(quality_score)
    g = g[g["q"] >= 0.30]
    g = g.sort_values(["conv_id", "turn_idx"]).drop_duplicates(
        "extracted_text", keep="first"
    )
    want = set(zip(g["conv_id"], g["turn_idx"].astype(int)))
    got = set(zip(mine["conv_id"], mine["turn_idx"].astype(int)))
    assert got == want
