"""Batch-26 ops: bigram vocabulary growth, ingest lineage, type-share
trend."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _assert_oracle(con, mine: pd.DataFrame, sql: str):
    odf = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )


def test_bigram_vocab_growth_oracle(ray_session, con):
    from pdfrust_ray.pipelines.datasetops import (
        bigram_vocab_growth,
        bigram_vocab_growth_sql,
    )

    mine = bigram_vocab_growth(SF)
    assert len(mine) == 5  # 500 docs / 100-doc buckets
    # diminishing returns: the first bucket dominates, curve is monotone
    assert mine.iloc[0]["n_new_bigrams"] > mine.iloc[1:]["n_new_bigrams"].sum()
    assert mine["cum_vocab"].is_monotonic_increasing
    _assert_oracle(con, mine, bigram_vocab_growth_sql())


def test_csv_shard_lineage_oracle(ray_session, con):
    from pdfrust_ray.pipelines.datasetops import csv_shard_lineage, csv_shard_lineage_sql

    mine = csv_shard_lineage(SF)
    assert len(mine) == 8
    assert int(mine["n_rows"].sum()) == 1000
    _assert_oracle(con, mine, csv_shard_lineage_sql())


def test_events_type_share_trend_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import (
        events_type_share_trend,
        events_type_share_trend_sql,
    )

    mine = events_type_share_trend(SF)
    # per-day shares sum to ~1e6 (ppm truncation loses < n_types ppm)
    day_sums = mine.groupby("day")["share_ppm"].sum()
    assert ((day_sums > 999_990) & (day_sums <= 1_000_000)).all()
    _assert_oracle(con, mine, events_type_share_trend_sql())
