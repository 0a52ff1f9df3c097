"""Batch-155: Theil revenue terms + Lorenz decile table."""

import math

SF = "/root/testdata/sf0.001"


def test_nation_revenue_theil_identity(ray_session):
    from pdfrust_ray.pipelines.relational import nation_revenue_theil

    out = nation_revenue_theil(SF)
    n = len(out)
    total = int(out["rev_cents"].sum())
    # recompute every quantized term
    for _, r in out.iterrows():
        q = int(math.floor(math.log(int(r["rev_cents"]) * n / total) * 1e9 + 0.5))
        assert q == int(r["lnratio_nano"])
        assert int(r["contrib"]) == int(r["rev_cents"]) * q
    # Theil T >= 0 up to quantization: the exact sum of x*ln(xn/X) is
    # nonnegative by Jensen; quantization shifts each term < 1 nano-nat
    assert int(out["contrib"].sum()) > -total


def test_user_activity_lorenz_properties(ray_session):
    from pdfrust_ray.pipelines.relational import user_activity_lorenz
    import pyarrow.parquet as pq

    out = user_activity_lorenz(SF)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    assert len(out) == 10
    assert int(out["n_users"].sum()) == ev["user_id"].nunique()
    assert int(out["events_in_decile"].sum()) == len(ev)
    assert int(out["cum_events"].iloc[-1]) == len(ev)
    # Lorenz convexity: sorted-ascending deciles have nondecreasing mass
    # (allowing ties at equal user counts); cum strictly increases
    assert (out["cum_events"].diff().dropna() > 0).all()
    # per-user mass is nondecreasing across deciles: avg events per
    # user in decile 1 <= in decile 10 (users sorted ascending)
    first = out.iloc[0]
    last = out.iloc[-1]
    assert int(first["events_in_decile"]) * int(last["n_users"]) <= int(
        last["events_in_decile"]
    ) * int(first["n_users"])
