"""Batch-145: duplicate-payment pair screen + daily periodicity."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_duplicate_payment_pairs_brute(ray_session):
    from pdfrust_ray.pipelines.relational import duplicate_payment_pairs
    import pyarrow.parquet as pq

    out = duplicate_payment_pairs(SF)
    o = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    ).to_pandas()
    o["day"] = (o["o_orderdate"].astype("datetime64[ns]").astype("int64")
                // 86_400_000_000_000)
    o["cents"] = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    pairs = set()
    for _, g in o.groupby("o_custkey"):
        recs = sorted(zip(g["day"], g["o_orderkey"], g["cents"]))
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                if recs[j][0] - recs[i][0] <= 1:
                    pairs.add((int(recs[i][1]), int(recs[j][1])))
    got = set(zip(out["orderkey_a"].astype(int), out["orderkey_b"].astype(int)))
    assert got == pairs and len(got) > 0
    # gap_bp is a valid basis-point ratio
    assert (out["gap_bp"] >= 0).all() and (out["gap_bp"] <= 10_000).all()


def test_user_daily_periodicity_brute(ray_session):
    from pdfrust_ray.pipelines.relational import user_daily_periodicity
    import pyarrow.parquet as pq
    import collections

    out = user_daily_periodicity(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    ev["hour"] = ev["ts"].astype("int64") // 3_600_000_000
    for uid in sorted(ev["user_id"].unique())[:3]:
        lut = collections.Counter(ev.loc[ev["user_id"] == uid, "hour"])
        d24 = sum(v * lut.get(k + 24, 0) for k, v in lut.items())
        d1 = sum(v * lut.get(k + 1, 0) for k, v in lut.items())
        row = out[out["user_id"] == uid].iloc[0]
        assert int(row["dot_lag24"]) == d24
        assert int(row["dot_lag1"]) == d1
        assert int(row["n_hours_active"]) == len(lut)
    assert (out["n_hours_active"] <= out["n_events"]).all()
