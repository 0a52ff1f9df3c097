"""Batch-151: parquet physical layout + zone-map pruning audits."""

SF = "/root/testdata/sf0.001"


def test_parquet_layout_audit_reconciles(ray_session):
    from pdfrust_ray.pipelines.datasetops import (
        parquet_layout_audit,
        _ensure_rg_file,
    )
    import pyarrow.parquet as pq

    out = parquet_layout_audit(SF)
    src = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    # every source row lands in exactly one row group of the copy
    assert int(out["num_rows"].sum()) == src
    # ~10 equal groups by construction (last group may be short)
    assert len(out) >= 2
    assert out["num_rows"].iloc[:-1].nunique() == 1
    assert (out["compressed_bytes"] > 0).all()
    assert (out["uncompressed_bytes"] >= out["compressed_bytes"]).all()
    # engine-written copy is ts-sorted: row groups tile time
    f = pq.ParquetFile(_ensure_rg_file(SF))
    stats = [
        f.metadata.row_group(g).column(
            f.schema_arrow.names.index("ts")
        ).statistics
        for g in range(f.metadata.num_row_groups)
    ]
    for a, b in zip(stats, stats[1:]):
        assert a.max <= b.min


def test_rowgroup_pruning_audit_monotone(ray_session):
    from pdfrust_ray.pipelines.datasetops import rowgroup_pruning_audit

    out = rowgroup_pruning_audit(SF)
    assert len(out) == 8
    # higher cutoff never prunes fewer groups; rows follow groups
    assert (out["n_pruned"].diff().dropna() >= 0).all()
    assert (out["rows_skipped"].diff().dropna() >= 0).all()
    assert (out["n_pruned"] <= out["n_groups"]).all()
    # the sorted layout makes pruning real, not vacuous
    assert int(out["n_pruned"].iloc[-1]) > 0
