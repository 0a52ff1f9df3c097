"""Batch-47: MinHash vs SimHash pair-set agreement audit."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_dedup_method_overlap_oracle(ray_session):
    from pdfrust_ray.stages.dedup import (
        dedup_method_overlap,
        dedup_method_overlap_sql,
        minhash_lsh_dedup,
        simhash_dedup,
    )

    mine = dedup_method_overlap(SF)
    # internal consistency vs the constituent pair frames
    m = len(minhash_lsh_dedup(SF))
    s = len(simhash_dedup(SF))
    row = mine.iloc[0]
    assert int(row["n_minhash"]) == m
    assert int(row["n_simhash"]) == s
    assert int(row["n_both"]) + int(row["n_minhash_only"]) == m
    assert int(row["n_both"]) + int(row["n_simhash_only"]) == s
    assert int(row["n_both"]) > 0  # planted dups are found by both

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    odf = con.execute(dedup_method_overlap_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )
