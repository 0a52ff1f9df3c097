"""Batch-55: length-vs-quality Pearson sufficient statistics."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_doc_len_quality_corr_oracle(ray_session):
    from pdfrust_ray.pipelines.llmdata import (
        doc_len_quality_corr,
        doc_len_quality_corr_sql,
    )

    mine = doc_len_quality_corr(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    odf = con.execute(doc_len_quality_corr_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
    # Cauchy-Schwarz on the centered sums: cov_num^2 <= varx_num * vary_num
    n, sx, sy, sxx, syy, sxy = (int(mine[c].iloc[0]) for c in mine.columns)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    assert vx >= 0 and vy >= 0
    assert cov * cov <= vx * vy
    # r is a real correlation on this fixture (non-degenerate columns)
    assert vx > 0 and vy > 0
