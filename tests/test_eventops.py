"""Event-stream + quality ops: weighted sample, band join, MAD
outliers, windowed dedup, JSON props, token entropy."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _assert_oracle(con, mine: pd.DataFrame, sql: str):
    odf = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )


def test_weighted_sample_matches_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import weighted_sample, weighted_sample_sql

    mine = weighted_sample(SF)
    assert len(mine) == 20
    _assert_oracle(con, mine, weighted_sample_sql())


def test_weighted_sample_favors_heavy_rows(ray_session, con):
    # A-ES property: the sample's mean weight should exceed the corpus
    # mean (inclusion probability increases with weight)
    from pdfrust_ray.pipelines.relational import weighted_sample

    mine = weighted_sample(SF)
    pop_mean = con.execute("SELECT AVG(value) FROM events").fetchone()[0]
    assert mine["value"].mean() > pop_mean


def test_band_join_matches_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import events_band_join, events_band_join_sql

    mine = events_band_join(SF)
    assert len(mine) > 0  # non-vacuous at the fixture
    _assert_oracle(con, mine, events_band_join_sql())
    assert (mine["gap_us"] >= 0).all() and (mine["gap_us"] <= 60_000_000).all()


def test_band_join_halo_brute_force():
    # serial brute force over a hand corpus with pairs that straddle
    # window boundaries (the halo's whole reason to exist)
    from pdfrust_ray.pipelines.relational import _BAND_US

    win = 2 * _BAND_US
    # events at: boundary-30s, boundary+20s (straddles), plus an
    # in-window pair and a too-far pair
    ts = np.array(
        [win - 30_000_000, win + 20_000_000, 10, 50_000_000, 300_000_000],
        dtype=np.int64,
    )
    ids = np.arange(5)
    expect = set()
    for i in range(5):
        for j in range(5):
            d = ts[j] - ts[i]
            if i != j and 0 <= d <= _BAND_US and (d > 0 or ids[i] < ids[j]):
                expect.add((min(i, j) if d == 0 else i, j if d >= 0 else i))
    # replicate the tiling + halo logic serially
    got = set()
    for w_shift in (0, 1):
        groups: dict = {}
        for i in range(5):
            w = ts[i] // win
            groups.setdefault(w, []).append(i)
            if ts[i] % win >= win - _BAND_US:
                groups.setdefault(w + 1, []).append(i)
        for g in groups.values():
            g = sorted(g, key=lambda i: (ts[i], ids[i]))
            for x in range(len(g)):
                for y in range(x + 1, len(g)):
                    if ts[g[y]] - ts[g[x]] <= _BAND_US:
                        got.add((g[x], g[y]))
    assert got == expect


def test_outliers_match_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import (
        events_value_outliers,
        events_value_outliers_sql,
    )

    mine = events_value_outliers(SF)
    assert len(mine) > 0
    _assert_oracle(con, mine, events_value_outliers_sql())


def test_windowed_dedup_matches_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import (
        windowed_event_dedup,
        windowed_event_dedup_sql,
    )

    mine = windowed_event_dedup(SF)
    assert 0 < len(mine)
    _assert_oracle(con, mine, windowed_event_dedup_sql())


def test_windowed_dedup_gap_invariant(ray_session):
    # within every (user, type), consecutive KEPT events are > 1h apart
    # relative to the previous RAW event — verify the weaker derived
    # invariant on kept rows: sorted kept ts gaps are all > 0
    from pdfrust_ray.pipelines.relational import windowed_event_dedup

    mine = windowed_event_dedup(SF)
    for _, g in mine.groupby(["user_id", "event_type"]):
        ts = np.sort(g["ts_us"].to_numpy())
        assert (np.diff(ts) > 0).all()


def test_props_k_stats_matches_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import props_k_stats, props_k_stats_sql

    mine = props_k_stats(SF)
    assert len(mine) > 0
    _assert_oracle(con, mine, props_k_stats_sql())


def test_token_entropy_matches_oracle(ray_session, con):
    from pdfrust_ray.pipelines.quality import token_entropy, token_entropy_sql

    mine = token_entropy(SF)
    assert len(mine) > 0
    _assert_oracle(con, mine, token_entropy_sql())


def test_token_entropy_hand_values(ray_session):
    # uniform distribution maximizes entropy; constant text scores 0
    import math
    from collections import Counter

    from pdfrust_ray.pipelines.quality import token_entropy

    mine = token_entropy(SF)
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    row = docs.iloc[0]
    c = Counter(row["text"].lower().split())
    n = sum(c.values())
    expect = sum(
        int(math.floor(-(k / n) * math.log(k / n) * 1e9 + 0.5)) for k in c.values()
    )
    got = int(mine.loc[mine["doc_id"] == row["doc_id"], "entropy_nano"].iloc[0])
    assert got == expect


def test_regression_matches_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import (
        events_value_regression,
        events_value_regression_sql,
    )

    mine = events_value_regression(SF)
    assert len(mine) > 0
    _assert_oracle(con, mine, events_value_regression_sql())


def test_regression_recovers_planted_line(ray_session, tmp_path):
    # y = 3x + 700 cents exactly -> slope_micro = 3_000_000,
    # intercept_hundredths = 70_000
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 1000
    x = np.arange(n) % 97
    t = pa.table(
        {
            "event_type": pa.array(["a"] * n),
            "value": pa.array((3 * x + 700) / 100.0, pa.float64()),
            "props": pa.array(['{"k": %d}' % v for v in x]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from pdfrust_ray.pipelines.relational import events_value_regression

    out = events_value_regression(str(tmp_path))
    assert int(out["slope_micro"].iloc[0]) == 3_000_000
    assert int(out["intercept_hundredths"].iloc[0]) == 70_000


def test_global_median_matches_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import (
        global_exact_median,
        global_exact_median_sql,
    )

    mine = global_exact_median(SF)
    _assert_oracle(con, mine, global_exact_median_sql())


def test_global_median_narrow_buckets(ray_session, con):
    # tiny bucket count forces several refinement passes through the
    # same streaming machinery — result must not change
    from pdfrust_ray.pipelines.relational import (
        global_exact_median,
        global_exact_median_sql,
    )

    mine = global_exact_median(SF, n_buckets=16)
    _assert_oracle(con, mine, global_exact_median_sql())


def test_gini_matches_oracle(ray_session, con):
    from pdfrust_ray.pipelines.relational import (
        user_activity_gini,
        user_activity_gini_sql,
    )

    mine = user_activity_gini(SF)
    _assert_oracle(con, mine, user_activity_gini_sql())
    # a count distribution has some inequality but is far from maximal
    g = int(mine["gini_nano"].iloc[0])
    assert 0 < g < 500_000_000
