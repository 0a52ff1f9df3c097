"""Batch-135: Hill tail-index estimator with quantized log terms."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_value_tail_hill_oracle(ray_session):
    from pdfrust_ray.pipelines.relational import value_tail_hill, value_tail_hill_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    mine = value_tail_hill(SF)
    odf = con.execute(value_tail_hill_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    assert (mine["k"] == 64).all()
    assert (mine["sum_lnratio_nano"] > 0).all()
    # alpha recomputes from the folded integers
    assert (
        mine["alpha_milli"]
        == (mine["k"] - 1) * 1_000_000_000 * 1000 // mine["sum_lnratio_nano"]
    ).all()


def test_hill_estimator_on_planted_pareto(ray_session, tmp_path):
    # exact Pareto(alpha=2) quantiles: x_i = xm * (n/i)^(1/alpha);
    # Hill on the top-k of that grid must recover alpha ~ 2
    import pyarrow as pa
    import pyarrow.parquet as pq

    n, alpha, xm = 2000, 2.0, 10.0
    vals = [xm * (n / i) ** (1.0 / alpha) for i in range(1, n + 1)]
    t = pa.table(
        {
            "event_id": list(range(n)),
            "event_type": ["pareto"] * n,
            "value": vals,
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from pdfrust_ray.pipelines.relational import value_tail_hill

    out = value_tail_hill(str(tmp_path)).iloc[0]
    # Hill over deterministic Pareto quantiles: within 15% of truth
    assert 1700 <= out["alpha_milli"] <= 2300
