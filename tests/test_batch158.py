"""Batch-158: hourly ACF spectrum + above-median run structure."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_hourly_acf_lag24_peak(ray_session):
    from pdfrust_ray.pipelines.relational import hourly_acf_spectrum
    import pyarrow.parquet as pq
    import collections

    out = hourly_acf_spectrum(SF)
    assert len(out) == 48
    # brute-check one lag
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    hours = collections.Counter(ev["ts"].astype("int64") // 3_600_000_000)
    lag = 24
    dot = sum(v * hours.get(k + lag, 0) for k, v in hours.items())
    assert int(out.loc[out["lag_hours"] == lag, "dot"].iloc[0]) == dot
    assert (out["dot"] >= 0).all()


def test_type_above_median_runs_brute(ray_session):
    from pdfrust_ray.pipelines.relational import type_above_median_runs
    import pyarrow.parquet as pq

    out = type_above_median_runs(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"],
    ).to_pandas()
    et = out["event_type"].iloc[0]
    g = ev[ev["event_type"] == et].sort_values(["ts", "event_id"])
    cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
    med = int(np.sort(cents)[(len(cents) + 1) // 2 - 1])
    best = cur = 0
    for v in cents > med:
        cur = cur + 1 if v else 0
        best = max(best, cur)
    row = out[out["event_type"] == et].iloc[0]
    assert int(row["median_cents"]) == med
    assert int(row["max_above_run"]) == best
    # strictly-above count is below half by definition of lower median
    assert (2 * out["n_above"] <= out["n"]).all()
