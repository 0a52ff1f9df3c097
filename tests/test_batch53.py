"""Batch-53: sequential A/B lift curve, conversation abandonment."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def test_experiment_lift_curve_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import (
        experiment_lift,
        experiment_lift_curve,
        experiment_lift_curve_sql,
    )

    mine = experiment_lift_curve(SF)
    odf = con.execute(experiment_lift_curve_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    # cumulative columns are monotone per arm
    for v in ("A", "B"):
        sub = mine[mine["variant"] == v]
        assert (np.diff(sub["cum_purchases"].to_numpy()) >= 0).all()
        assert (np.diff(sub["cum_revenue_cents"].to_numpy()) >= 0).all()
    # the curve's final point equals the experiment_lift total readout
    final = mine[mine["d"] == mine["d"].max()].set_index("variant")
    lift = experiment_lift(SF).set_index("variant")
    for v in ("A", "B"):
        assert int(final.loc[v, "cum_purchases"]) == int(lift.loc[v, "n_purchases"])
        assert int(final.loc[v, "cum_revenue_cents"]) == int(lift.loc[v, "revenue_cents"])


def test_conv_abandonment_oracle(ray_session):
    from pdfrust_ray.fixtures.corpus import ensure_corpus
    from pdfrust_ray.pipelines.conversation import conv_abandonment, conv_abandonment_sql

    d = ensure_corpus("t1")
    mine = conv_abandonment(d)
    con = duckdb.connect()
    odf = con.execute(conv_abandonment_sql(f"{d}/shards/*.parquet")).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    n_convs = con.execute(
        f"SELECT COUNT(DISTINCT conv_id) FROM read_parquet('{d}/shards/*.parquet')"
    ).fetchone()[0]
    assert int(mine["n_convs"].sum()) == n_convs
