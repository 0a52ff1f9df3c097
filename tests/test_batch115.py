"""Batch-115: event-type RLE census, region x year market mix."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders", "customer", "nation", "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(mine, con, sql):
    odf = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    return odf


def test_user_type_run_histogram_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import (
        user_type_run_histogram,
        user_type_run_histogram_sql,
    )

    mine = user_type_run_histogram(SF)
    _cmp(mine, con, user_type_run_histogram_sql())
    # run lengths weighted by count reconcile with total events
    assert int((mine["run_len"] * mine["n_runs"]).sum()) == con.execute(
        "SELECT COUNT(*) FROM events"
    ).fetchone()[0]
    assert (mine["run_len"] >= 1).all()


def test_region_year_order_matrix_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import (
        region_year_order_matrix,
        region_year_order_matrix_sql,
    )

    mine = region_year_order_matrix(SF)
    _cmp(mine, con, region_year_order_matrix_sql())
    # every order lands in exactly one cell (all customers have nations)
    assert int(mine["n_orders"].sum()) == con.execute(
        "SELECT COUNT(*) FROM orders"
    ).fetchone()[0]
    # per-year shares recompute exactly
    tot = mine.groupby("year")["revenue_cents"].transform("sum")
    assert (
        mine["year_share_ppm"] == mine["revenue_cents"] * 1_000_000 // tot
    ).all()
