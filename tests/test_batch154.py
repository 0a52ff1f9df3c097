"""Batch-154: split-half centroid drift + order brand Simpson."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_embedding_split_half_drift_brute(ray_session):
    from pdfrust_ray.pipelines.relational import embedding_split_half_drift
    import pyarrow.parquet as pq

    out = embedding_split_half_drift(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    lab = int(out["label"].iloc[0])
    sub = t[t["label"] == lab]
    q = np.round(
        np.stack([np.asarray(v, dtype=np.float64) for v in sub["embedding"]])
        * 1_000_000
    ).astype(np.int64)
    par = (sub["vec_id"].to_numpy(np.int64) % 2) == 0
    se, so = q[par].sum(axis=0), q[~par].sum(axis=0)
    ne, no = int(par.sum()), int((~par).sum())
    drift = int(np.abs(se * no - so * ne).sum())
    row = out[out["label"] == lab].iloc[0]
    assert int(row["n_even"]) == ne and int(row["n_odd"]) == no
    assert int(row["drift_l1_scaled"]) == drift
    # all ten labels present, both halves populated at this scale
    assert len(out) == t["label"].nunique()
    assert (out["drift_l1_scaled"] >= 0).all()


def test_order_brand_simpson_invariants(ray_session):
    from pdfrust_ray.pipelines.relational import order_brand_simpson
    import pyarrow.parquet as pq

    out = order_brand_simpson(SF)
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey"]).to_pandas()
    # every order with lineitems appears once
    assert len(out) == li["l_orderkey"].nunique()
    assert int(out["n_items"].sum()) == len(li)
    # Simpson numerator bounds: n <= sum(c^2) <= n^2
    assert (out["simpson_num"] >= out["n_items"]).all()
    assert (out["simpson_num"] <= out["n_items"] ** 2).all()
    # single-brand orders hit the upper bound exactly
    single = out[out["n_brands"] == 1]
    if len(single):
        assert (single["simpson_num"] == single["n_items"] ** 2).all()
