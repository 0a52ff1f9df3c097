"""Batch-140: U-shaped position attribution + daily max-surge window."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_position_attribution_conserves_budget(ray_session):
    from pdfrust_ray.pipelines.relational import position_attribution
    import pyarrow.parquet as pq

    out = position_attribution(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type"]).to_pandas()
    n_purchases = int((ev["event_type"] == "purchase").sum())
    # every purchase distributes exactly 10000 bp — conservation law
    assert int(out["credit_bp"].sum()) == 10_000 * n_purchases
    assert set(out["channel"]) <= {"click", "view", "direct"}
    assert (out["credit_bp"] > 0).all()


def test_position_attribution_u_shape_small_paths():
    # pure-unit check of the credit split rule on synthetic paths
    for m, expect in [
        (1, [10_000]),
        (2, [5_000, 5_000]),
        (3, [4_000, 2_000, 4_000]),
        (4, [4_000, 1_000, 1_000, 4_000]),
        (5, [4_000, 667, 667, 666, 4_000]),
    ]:
        if m == 1:
            bps = np.array([10_000], dtype=np.int64)
        elif m == 2:
            bps = np.array([5_000, 5_000], dtype=np.int64)
        else:
            base, rem = divmod(2_000, m - 2)
            bps = np.full(m, base, dtype=np.int64)
            bps[0] = bps[-1] = 4_000
            bps[1 : 1 + rem] += 1
        assert bps.tolist() == expect and int(bps.sum()) == 10_000


def test_daily_revenue_max_surge_brute(ray_session):
    from pdfrust_ray.pipelines.relational import daily_revenue_max_surge
    import pyarrow.parquet as pq
    import pandas as pd

    out = daily_revenue_max_surge(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "value"]).to_pandas()
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    d = pd.DataFrame({"day": day, "c": cents}).groupby("day")["c"].sum().sort_index()
    days = d.index.to_numpy()
    c = d.to_numpy()
    n = len(c)
    b = c * n - int(c.sum())
    # brute force all O(n^2) windows with the same tie-break
    best = None
    for j in range(n):
        for i in range(j + 1):
            s = int(b[i : j + 1].sum())
            key = (-s, days[j], days[i])
            if best is None or key < best[0]:
                best = (key, days[i], days[j], j - i + 1, s)
    row = out.iloc[0]
    assert int(row["start_day"]) == best[1]
    assert int(row["end_day"]) == best[2]
    assert int(row["len_days"]) == best[3]
    assert int(row["surge_scaled"]) == best[4]
    assert int(row["n_days"]) == n
