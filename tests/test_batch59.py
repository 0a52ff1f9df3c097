"""Batch-59: per-supplier p90 ship-delay tail over the fact join."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_slowest_suppliers_p90_oracle(ray_session):
    from pdfrust_ray.pipelines.relational import (
        slowest_suppliers_p90,
        slowest_suppliers_p90_sql,
    )

    mine = slowest_suppliers_p90(SF)
    con = duckdb.connect()
    for t in ["lineitem", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    odf = con.execute(slowest_suppliers_p90_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    # ranked slowest-first; delays are plausible TPC-H ship windows
    d = mine["p90_delay_days"].to_numpy()
    assert (np.diff(d) <= 0).all()
    assert (mine["p90_delay_days"] >= 0).all()


def test_p90_brute_force_one_supplier(ray_session):
    from pdfrust_ray.pipelines.relational import slowest_suppliers_p90

    mine = slowest_suppliers_p90(SF, k=3)
    sk = int(mine["s_suppkey"].iloc[0])
    con = duckdb.connect()
    for t in ["lineitem", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    delays = con.execute(
        f"""SELECT date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) d
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_suppkey = {sk} ORDER BY d"""
    ).fetchdf()["d"].to_numpy()
    rank = int(np.ceil(0.9 * len(delays)))
    assert int(mine["p90_delay_days"].iloc[0]) == int(delays[rank - 1])
    assert int(mine["n_lineitems"].iloc[0]) == len(delays)
