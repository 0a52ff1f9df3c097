"""Batch-142: Heaps'-law exponent fit + Church-Gale token adaptation."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_heaps_law_fit_recovers_planted_exponent():
    # pure-unit check of the quantized-log integer regression: plant
    # y = x^0.7 exactly on the curve and recover slope_micro ~ 700000
    import math

    x = np.array([10, 100, 1000, 10000, 100000], dtype=np.int64)
    y = np.array([int(round(v**0.7)) for v in x], dtype=np.int64)
    qx = [int(math.floor(math.log(int(v)) * 1e6 + 0.5)) for v in x]
    qy = [int(math.floor(math.log(int(v)) * 1e6 + 0.5)) for v in y]
    n = len(qx)
    sx, sy = sum(qx), sum(qy)
    sxx = sum(a * a for a in qx)
    sxy = sum(a * b for a, b in zip(qx, qy))
    slope = 1_000_000 * (n * sxy - sx * sy) // (n * sxx - sx * sx)
    assert abs(slope - 700_000) < 1_000


def test_heaps_law_fit_shapes(ray_session):
    from pdfrust_ray.pipelines.textops import heaps_law_fit

    out = heaps_law_fit(SF)
    assert out["source"].is_unique and len(out) >= 2
    # saturated toy vocabulary: exponent far below 1, never negative
    assert (out["slope_micro"] >= 0).all()
    assert (out["slope_micro"] < 1_000_000).all()
    assert (out["vocab"] <= out["total_tokens"]).all()


def test_token_adaptation_invariants(ray_session):
    from pdfrust_ray.pipelines.textops import token_adaptation_stats
    import pyarrow.parquet as pq

    out = token_adaptation_stats(SF)
    # df2 <= df <= cf always
    assert (out["df2"] <= out["df"]).all()
    assert (out["df"] <= out["cf"]).all()
    # totals reconcile against a driver-side recount
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    total = sum(len([w for w in s.split(" ") if w]) for s in t["text"].to_pylist())
    assert int(out["cf"].sum()) == total
    # word-salad corpus: common words repeat within docs -> adaptation
    top = out.sort_values("cf", ascending=False).iloc[0]
    assert int(top["df2"]) > 0
