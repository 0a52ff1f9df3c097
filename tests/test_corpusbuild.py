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


def test_run_corpus_build_resumable(built, ray_session, tmp_path):
    """The deployable three-stage build: output matches the query op,
    a clean re-run resumes everything, and a crashed pack bucket
    (data without manifest) is redone idempotently."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from pdfrust_ray.pipelines.corpusbuild import run_corpus_build
    from pdfrust_ray.state import manifest

    d, want = built
    out = str(tmp_path / "build")
    m1 = run_corpus_build(d, out, concurrency=2)
    assert m1["rows_kept"] == len(want)
    assert m1["buckets_rebuilt"] == list(range(16))

    got = (
        pq.ParquetDataset(
            sorted(glob.glob(os.path.join(out, "stage_pack", "group=*", "*.parquet")))
        )
        .read()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[list(want.columns)]
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got, want.reset_index(drop=True), check_dtype=False
    )

    # clean re-run: everything resumes, nothing rebuilt
    m2 = run_corpus_build(d, out, concurrency=2)
    assert m2["dedup_resumed"] and m2["buckets_rebuilt"] == []
    assert m2["packs_total"] == m1["packs_total"]

    # crash simulation: bucket 3's data present but manifest missing
    os.remove(manifest.manifest_path(os.path.join(out, "stage_pack"), 3))
    m3 = run_corpus_build(d, out, concurrency=2)
    assert m3["buckets_rebuilt"] == [3]
    got3 = (
        pq.ParquetDataset(
            sorted(glob.glob(os.path.join(out, "stage_pack", "group=*", "*.parquet")))
        )
        .read()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[list(want.columns)]
    )
    pd.testing.assert_frame_equal(
        got3, want.reset_index(drop=True), check_dtype=False
    )

    # resume=False rebuilds every stage from scratch
    shutil.rmtree(out)
    m4 = run_corpus_build(d, out, concurrency=2, resume=False)
    assert m4["buckets_rebuilt"] == list(range(16))


def test_conv_context_pack(ray_session):
    """Conversation-granularity packing: twin exact, conversations
    never split, budget respected for multi-conv packs."""
    import duckdb
    import pandas as pd

    from pdfrust_ray.fixtures.corpus import ensure_corpus
    from pdfrust_ray.pipelines.conversation import (
        conv_context_pack,
        conv_context_pack_sql,
    )

    d = ensure_corpus("t2")
    mine = conv_context_pack(d)
    con = duckdb.connect()
    odf = con.execute(conv_context_pack_sql(f"{d}/shards/*.parquet")).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    # one row per conversation (never split)
    assert mine["conv_id"].is_unique
    for (_, _), g in mine.groupby(["bucket", "pack_id"]):
        assert list(g.sort_values("conv_id")["pack_pos"]) == list(range(len(g)))
        if len(g) > 1:
            assert int(g["n_tokens"].sum()) <= 2048
