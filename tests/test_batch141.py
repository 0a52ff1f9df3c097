"""Batch-141: hourly EMD matrix + value sortedness (run) census."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_hourly_emd_matrix_metric_properties(ray_session):
    from pdfrust_ray.pipelines.relational import hourly_emd_matrix

    out = hourly_emd_matrix(SF)
    # complete upper triangle over the observed types
    types = sorted(set(out["type_a"]) | set(out["type_b"]))
    k = len(types)
    assert len(out) == k * (k - 1) // 2
    assert (out["emd_scaled"] >= 0).all()
    # identity of indiscernibles on a planted equal pair: a profile
    # compared against itself is zero — emulate via the formula
    v = np.array([3, 0, 5] + [0] * 21, dtype=np.int64)
    ca = np.cumsum(v)
    assert int(np.abs(ca[:-1] * ca[-1] - ca[:-1] * ca[-1]).sum()) == 0


def test_hourly_emd_planted_shift():
    # moving 1 of 4 units one hour later: normalized CDFs differ by
    # 1/4 at one hour, so W1 = 1/4 and the scaled value is
    # W1 * nA * nB = (1/4) * 4 * 4 = 4
    a = np.zeros(24, dtype=np.int64)
    b = np.zeros(24, dtype=np.int64)
    a[5] = 4
    b[5], b[6] = 3, 1
    ca, cb = np.cumsum(a), np.cumsum(b)
    emd = int(np.abs(ca[:-1] * cb[-1] - cb[:-1] * ca[-1]).sum())
    assert emd == 4


def test_value_sortedness_audit_brute(ray_session):
    from pdfrust_ray.pipelines.relational import value_sortedness_audit
    import pyarrow.parquet as pq

    out = value_sortedness_audit(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).to_pandas()
    for uid in sorted(ev["user_id"].unique())[:3]:
        g = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        runs = [1]
        for i in range(1, len(cents)):
            if cents[i] < cents[i - 1]:
                runs.append(1)
            else:
                runs[-1] += 1
        row = out[out["user_id"] == uid].iloc[0]
        assert int(row["n_events"]) == len(cents)
        assert int(row["n_runs"]) == len(runs)
        assert int(row["max_run_len"]) == max(runs)
    assert (out["n_runs"] <= out["n_events"]).all()
