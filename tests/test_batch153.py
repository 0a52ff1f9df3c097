"""Batch-153: water-filling allocation + half-mass traffic clock."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_waterfill_conservation_and_fairness(ray_session):
    from pdfrust_ray.pipelines.relational import capacity_waterfill_allocation

    out = capacity_waterfill_allocation(SF)
    cap = int(out["capacity"].iloc[0])
    total = int(out["demand"].sum())
    # exact conservation
    assert int(out["allocated"].sum()) == min(cap, total)
    # never allocate beyond demand
    assert (out["allocated"] <= out["demand"]).all()
    # max-min fairness: a type allocated less than its demand is
    # allocated at least as much as every smaller allocation
    curtailed = out[out["allocated"] < out["demand"]]
    if len(curtailed):
        floor_alloc = int(curtailed["allocated"].min())
        assert (out["allocated"] >= np.minimum(out["demand"], floor_alloc)).all()
        # curtailed allocations differ by at most 1 (water level)
        assert int(curtailed["allocated"].max()) - floor_alloc <= 1


def test_type_halfmass_time_brute(ray_session):
    from pdfrust_ray.pipelines.relational import type_halfmass_time
    import pyarrow.parquet as pq

    out = type_halfmass_time(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "event_type"]
    ).to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    ev["day"] = ev["us"] // 86_400_000_000
    row = out.iloc[0]
    g = ev[(ev["day"] == row["day"]) & (ev["event_type"] == row["event_type"])]
    g = g.sort_values(["us", "event_id"])
    half = (len(g) + 1) // 2
    assert int(g["us"].iloc[half - 1]) == int(row["half_ts_us"])
    assert int(row["n"]) == len(g)
    # microsecond-of-day in range
    assert (out["half_us_of_day"] >= 0).all()
    assert (out["half_us_of_day"] < 86_400_000_000).all()
