"""Batch-149: turn line-repetition screen + source length KS matrix."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_turn_line_repetition_brute(ray_session):
    from pdfrust_ray.fixtures.corpus import ensure_corpus
    from pdfrust_ray.pipelines.conversation import turn_line_repetition
    import glob
    import pandas as pd
    import pyarrow.parquet as pq

    corpus = ensure_corpus("t1")
    out = turn_line_repetition(corpus)
    t = pd.concat(
        pq.read_table(f).to_pandas()
        for f in sorted(glob.glob(f"{corpus}/shards/*.parquet"))
    )
    cid = out["conv_id"].iloc[0]
    g = t[t["conv_id"] == cid]
    n_dup_turns = dup_total = mx = 0
    for text in g["text"]:
        counts = {}
        for ln in text.split("\n"):
            if ln:
                counts[ln] = counts.get(ln, 0) + 1
        d = sum(c - 1 for c in counts.values() if c > 1)
        n_dup_turns += 1 if d else 0
        dup_total += d
        mx = max(mx, max(counts.values(), default=0))
    row = out[out["conv_id"] == cid].iloc[0]
    assert int(row["n_turns_with_dup"]) == n_dup_turns
    assert int(row["total_dup_lines"]) == dup_total
    assert int(row["max_line_mult"]) == mx
    # PDF payloads guarantee repeated structural lines somewhere
    assert int(out["total_dup_lines"].sum()) > 0


def test_source_len_ks_matrix_brute(ray_session):
    from pdfrust_ray.pipelines.textops import source_len_ks_matrix
    import pyarrow.parquet as pq

    out = source_len_ks_matrix(SF)
    d = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    d["len"] = d["text"].str.len()
    row = out.iloc[0]
    a = np.sort(d.loc[d["source"] == row["source_a"], "len"].to_numpy())
    b = np.sort(d.loc[d["source"] == row["source_b"], "len"].to_numpy())
    grid = np.unique(np.r_[a, b])
    ca = np.searchsorted(a, grid, side="right")
    cb = np.searchsorted(b, grid, side="right")
    ks = int(np.abs(ca * len(b) - cb * len(a)).max())
    assert int(row["ks_scaled"]) == ks
    assert int(row["n_a"]) == len(a) and int(row["n_b"]) == len(b)
    # KS is bounded by nA*nB
    assert (out["ks_scaled"] <= out["n_a"] * out["n_b"]).all()
