"""Batch-156: cross-mode status parity query + robust value volatility."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_extract_mode_agreement_all_agree(ray_session):
    import __ray_entry__ as e

    out = e.queries()["extract_mode_agreement"](SF)
    # text and chars modes must report the SAME first error per turn
    # (round-2 ADVICE emission-order fix) — full agreement on fixture
    assert (out["agree"] == 1).all()
    assert len(out) > 0
    # both ok and error statuses appear (the fixture plants failures)
    assert out["status_text"].nunique() >= 1


def test_user_value_msd_median_brute(ray_session):
    from pdfrust_ray.pipelines.relational import user_value_msd_median
    import pyarrow.parquet as pq

    out = user_value_msd_median(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    ).to_pandas()
    for uid in sorted(ev["user_id"].unique())[:3]:
        g = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        d = np.sort(np.abs(np.diff(cents)))
        row = out[out["user_id"] == uid].iloc[0]
        assert int(row["n_diffs"]) == len(d)
        assert int(row["median_abs_diff"]) == int(d[(len(d) + 1) // 2 - 1])
    assert (out["median_abs_diff"] >= 0).all()
