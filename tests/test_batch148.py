"""Batch-148: selectivity-estimate audit + exact Gini mean difference."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_selectivity_estimate_audit_exactness(ray_session):
    from pdfrust_ray.pipelines.relational import selectivity_estimate_audit
    import pyarrow.parquet as pq

    out = selectivity_estimate_audit(SF)
    assert len(out) == 8
    ev = pq.read_table(f"{SF}/events.parquet", columns=["value"]).to_pandas()
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    # exact counts verify against a driver recount
    for _, r in out.iterrows():
        exact = int(((cents >= r["pred_lo"]) & (cents < r["pred_hi"])).sum())
        assert exact == int(r["exact_count"])
    # fractions are reduced and denominators positive
    import math

    for _, r in out.iterrows():
        g = math.gcd(int(r["est_num"]), int(r["est_den"]))
        assert g == 1 and int(r["est_den"]) > 0
    # uniform-interpolation estimate is sane: within the total row count
    n = len(cents)
    assert ((out["est_num"] <= out["est_den"] * n)).all()


def test_type_gini_mean_diff_brute(ray_session):
    from pdfrust_ray.pipelines.relational import type_gini_mean_diff
    import pyarrow.parquet as pq

    out = type_gini_mean_diff(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    ev["cents"] = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    et = out["event_type"].iloc[0]
    x = ev.loc[ev["event_type"] == et, "cents"].to_numpy()
    brute = sum(
        int(abs(int(x[i]) - int(x[j])))
        for i in range(len(x))
        for j in range(i + 1, len(x))
    )
    row = out[out["event_type"] == et].iloc[0]
    assert int(row["gmd_num_cents"]) == brute
    assert int(row["n_pairs"]) == len(x) * (len(x) - 1) // 2
