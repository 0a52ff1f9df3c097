"""Batch-157: Kendall tau-b concordance + hour-boundary audit."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_custbal_revenue_kendall_pair_conservation(ray_session):
    from pdfrust_ray.pipelines.relational import custbal_revenue_kendall

    out = custbal_revenue_kendall(SF).iloc[0]
    n = int(out["n_customers"])
    total_pairs = n * (n - 1) // 2
    assert (
        int(out["concordant"])
        + int(out["discordant"])
        + int(out["ties_x_only"])
        + int(out["ties_y_only"])
        + int(out["ties_xy"])
        == total_pairs
    )


def test_custbal_revenue_kendall_brute(ray_session):
    from pdfrust_ray.pipelines.relational import custbal_revenue_kendall
    import pyarrow.parquet as pq

    out = custbal_revenue_kendall(SF).iloc[0]
    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    o["cents"] = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    rev = o.groupby("o_custkey")["cents"].sum()
    x = np.round(cust["c_acctbal"].to_numpy() * 100).astype(np.int64)
    y = cust["c_custkey"].map(rev).fillna(0).to_numpy(np.int64)
    C = D = 0
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            s = np.sign(x[i] - x[j]) * np.sign(y[i] - y[j])
            if s > 0:
                C += 1
            elif s < 0:
                D += 1
    assert int(out["concordant"]) == C
    assert int(out["discordant"]) == D


def test_boundary_timestamp_audit_bounds(ray_session):
    from pdfrust_ray.pipelines.relational import boundary_timestamp_audit

    out = boundary_timestamp_audit(SF)
    assert (out["n_first_sec"] <= out["n"]).all()
    assert (out["n_last_sec"] <= out["n"]).all()
    # organic synthetic data: no pile-up expected at boundaries
    assert set(out["excess_first"]) <= {0, 1}
