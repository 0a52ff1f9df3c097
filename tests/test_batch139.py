"""Batch-139: Golomb-Rice parameter audit + per-source token KL."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_rice_param_audit_matches_brute(ray_session):
    from pdfrust_ray.pipelines.relational import rice_param_audit
    import pyarrow.parquet as pq
    import pandas as pd

    out = rice_param_audit(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id"]
    ).to_pandas()
    # brute-force certificate on three users
    for uid in sorted(ev["user_id"].unique())[:3]:
        ids = np.sort(ev.loc[ev["user_id"] == uid, "event_id"].to_numpy(np.int64))
        deltas = np.r_[ids[0], np.diff(ids)]
        costs = {
            k: int((deltas >> k).sum() + len(ids) * (k + 1)) for k in range(17)
        }
        best_k = min(costs, key=lambda k: (costs[k], k))
        row = out[out["user_id"] == uid].iloc[0]
        assert int(row["best_k"]) == best_k
        assert int(row["rice_bits"]) == costs[best_k]
        assert int(row["plain_bits"]) == 64 * len(ids)
    # Rice at the optimum never loses to plain 64-bit layout here
    assert (out["rice_bits"] < out["plain_bits"]).all()


def test_source_token_kl_properties(ray_session):
    from pdfrust_ray.pipelines.textops import source_token_kl

    out = source_token_kl(SF)
    # every source present, one row each
    assert out["source"].is_unique and len(out) >= 2
    # KL >= 0 up to per-term floor-rounding (each term can lose < 1 nano)
    assert (out["kl_nano"] > -int(out["vocab"].iloc[0])).all()
    # identical vocabulary universe on every row
    assert out["vocab"].nunique() == 1
    # a genuinely divergent source exists (the corpus mixes sources)
    assert int(out["kl_nano"].max()) > 0
