"""Batch-16 ops: categorical encoding, keyset pagination, quantized
retrieval, orphan-file audit."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _assert_oracle(con, mine: pd.DataFrame, sql: str):
    odf = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )


def test_categorical_encode_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import categorical_encode, categorical_encode_sql

    mine = categorical_encode(SF)
    assert mine["code"].tolist() == list(range(len(mine)))
    assert mine["event_type"].is_monotonic_increasing  # sorted codebook
    assert int(mine["n_events"].sum()) == 1000
    _assert_oracle(con, mine, categorical_encode_sql())


def test_events_keyset_page_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import events_keyset_page, events_keyset_page_sql

    mine = events_keyset_page(SF)
    assert len(mine) == 50
    assert mine["rank"].tolist() == list(range(1, 51))
    # strictly after the cursor and ordered
    assert (mine["ts_us"] >= pd.Timestamp("2024-01-15").value // 1000).all()
    assert mine.sort_values(["ts_us", "event_id"])["rank"].is_monotonic_increasing
    _assert_oracle(con, mine, events_keyset_page_sql())


def test_ann_quantized_topk_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import ann_quantized_topk, ann_quantized_topk_sql

    mine = ann_quantized_topk(SF)
    assert len(mine) == 50  # 5 queries x k=10
    # each query's own vector ranks first (self-dot dominates on the fixture)
    firsts = mine[mine["rank"] == 1]
    assert (firsts["query_id"].to_numpy() == firsts["vec_id"].to_numpy()).all()
    _assert_oracle(con, mine, ann_quantized_topk_sql())


def test_ann_quantized_topk_batch_invariance(ray_session):
    import ray.data as rd

    from pdfrust_ray.pipelines import relational as rel

    base = rel.ann_quantized_topk(SF)
    orig = rd.read_parquet

    def small_read(path, **kw):
        return orig(path, override_num_blocks=9, **kw)

    rel.rd.read_parquet = small_read
    try:
        again = rel.ann_quantized_topk(SF)
    finally:
        rel.rd.read_parquet = orig
    pd.testing.assert_frame_equal(base, again)


def test_orphan_files_audit(ray_session):
    from pdfrust_ray.pipelines.datasetops import orphan_files_audit

    out = orphan_files_audit(SF)
    by_file = out.set_index("file")["status"].to_dict()
    assert by_file == {
        "data-a.parquet": "live",
        "data-b.parquet": "live",
        "data-c.parquet": "live",
        "data-orphan.parquet": "orphan",
    }
    assert (out["n_rows"] > 0).all()
