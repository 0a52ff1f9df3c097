"""Relational operator demos over the TPC-H-ish test tables.

These exercise the Dataset wide operators (groupby/aggregate, sort,
limit, broadcast join, windowed aggregation, distinct) with DuckDB-SQL
oracles. Money sums are returned as integer cents (the inputs are
cent-valued doubles, so sum*100 is an exact integer and the result is
bit-stable regardless of float summation order).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _cents(x) -> "pa.Array":
    return pc.cast(pc.round(pc.multiply(x, 100.0)), pa.int64())


def lineitem_agg(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-flavored pricing summary (groupby two keys, 4 aggs)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), type=pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": t["l_quantity"],
                "price_cents": _cents(t["l_extendedprice"]),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def lineitem_agg_sql() -> str:
    return """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               CAST(ROUND(SUM(ROUND(l_extendedprice * 100))) AS BIGINT) AS sum_price_cents,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """


def segment_revenue(sf_dir: str) -> pd.DataFrame:
    """Broadcast join: orders x customer -> revenue per market segment.

    customer is the small side: ray.put the Arrow table once, then a
    vectorized Arrow hash join per batch — no shuffle join (SURVEY §4 /
    guide "Joins and lookups"). Inner-join semantics: orders rows whose
    o_custkey is absent from customer are dropped, matching the SQL
    oracle's INNER JOIN."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    ref = ray.put(cust)

    class JoinSegment:
        def __init__(self):
            self.cust = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            left = pa.table(
                {"o_custkey": t["o_custkey"], "price_cents": _cents(t["o_totalprice"])}
            )
            j = left.join(
                self.cust, keys="o_custkey", right_keys="c_custkey", join_type="inner"
            )
            return j.select(["c_mktsegment", "price_cents"])

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    out = (
        ds.map_batches(JoinSegment, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("c_mktsegment")
        .aggregate(Sum("price_cents", alias_name="revenue_cents"), Count(alias_name="n_orders"))
        .to_pandas()
    )
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def order_priority_revenue(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """Big x big SHUFFLE join: lineitem x orders -> revenue per order
    priority. Neither side is broadcastable at design scale, so this is
    the hash-partitioned exchange path (Dataset.join), with the
    standard combiner optimization first: lineitem pre-aggregates to
    one (orderkey, rev_cents) row per order BEFORE the join, so the
    exchange moves order-count rows, not lineitem-count rows. Inner
    semantics: orders with no lineitems drop, like the SQL oracle."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        # per-batch combiner BEFORE the shuffle: lineitem is clustered by
        # orderkey, so the local sum collapses ~4 line rows per order to
        # one partial row — the groupby then exchanges order-count rows
        cents = pa.table(
            {"l_orderkey": t["l_orderkey"], "price_cents": _cents(t["l_extendedprice"])}
        )
        g = pa.TableGroupBy(cents, "l_orderkey").aggregate([("price_cents", "sum")])
        return pa.table(
            {"l_orderkey": g["l_orderkey"], "price_cents": g["price_cents_sum"]}
        )

    li_agg = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("price_cents", alias_name="rev_cents"))
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    out = (
        li_agg.join(
            orders,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .groupby("o_orderpriority")
        .aggregate(Sum("rev_cents", alias_name="revenue_cents"), Count(alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def order_priority_revenue_sql() -> str:
    return """
        WITH la AS (
          SELECT l_orderkey,
                 CAST(ROUND(SUM(ROUND(l_extendedprice * 100))) AS BIGINT) AS rev_cents
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT o.o_orderpriority,
               CAST(SUM(la.rev_cents) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM la JOIN orders o ON la.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """


def segment_revenue_sql() -> str:
    return """
        SELECT c.c_mktsegment,
               CAST(ROUND(SUM(ROUND(o.o_totalprice * 100))) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """


def top_parts(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Global sort + limit (ties broken by p_partkey)."""
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"])

    def prep(t: pa.Table) -> pa.Table:
        return t.append_column("price_cents", _cents(t["p_retailprice"]))

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .select_columns(["p_partkey", "p_name", "price_cents"])
        .sort([("price_cents"), ("p_partkey")], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out


def top_parts_sql(k: int = 10) -> str:
    return f"""
        SELECT p_partkey, p_name,
               CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
        FROM part
        ORDER BY price_cents DESC, p_partkey
        LIMIT {k}
    """


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate: (event_type, hour) -> count, sum cents."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "value_cents": _cents(t["value"]),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents"))
        .to_pandas()
    )
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def events_hourly_sql() -> str:
    return """
        SELECT event_type, date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(ROUND(value * 100))) AS BIGINT) AS sum_value_cents
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
        ORDER BY event_type, hour
    """


def events_hopping_15m(sf_dir: str) -> pd.DataFrame:
    """Hopping-window aggregate: 1-hour windows advancing every 15
    minutes, so each event belongs to 4 overlapping windows. The
    fan-out is a map_batches row multiplication (event -> its 4 window
    starts) followed by one groupby — the streaming-engine HOP()
    re-expressed as batch row expansion; at any scale the exchange
    carries 4x event rows of (window, type) keys only."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
    hop_us = 15 * 60 * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t["ts"], multiple=15, unit="minute")
        cents = _cents(t["value"])
        parts = []
        for k in range(4):
            ws = pc.subtract(base, pa.scalar(k * hop_us, pa.duration("us")))
            parts.append(
                pa.table(
                    {
                        "win_start": ws,
                        "event_type": t["event_type"],
                        "value_cents": cents,
                    }
                )
            )
        return pa.concat_tables(parts)

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["win_start", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents"))
        .to_pandas()
    )
    out["sum_value_cents"] = out["sum_value_cents"].astype("int64")
    return out.sort_values(["win_start", "event_type"]).reset_index(drop=True)


def events_hopping_15m_sql() -> str:
    return """
        SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
                   AS win_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(ROUND(value * 100))) AS BIGINT) AS sum_value_cents
        FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


def distinct_mktsegments(sf_dir: str) -> pd.DataFrame:
    """Distinct values (ds.unique is the shuffle; result is tiny)."""
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


def distinct_mktsegments_sql() -> str:
    return "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"


def supplier_nation_agg(sf_dir: str) -> pd.DataFrame:
    """Two-table broadcast join + per-nation account stats (min/max/mean)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ref = ray.put(nation)

    class JoinNation:
        def __init__(self):
            self.nation = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized Arrow hash join against the broadcast small side;
            # inner semantics match the oracle's INNER JOIN
            left = pa.table(
                {"s_nationkey": t["s_nationkey"], "acct_cents": _cents(t["s_acctbal"])}
            )
            j = left.join(
                self.nation, keys="s_nationkey", right_keys="n_nationkey", join_type="inner"
            )
            return j.select(["n_name", "acct_cents"])

    ds = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"])
    out = (
        ds.map_batches(JoinNation, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("n_name")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Min("acct_cents", alias_name="min_acct_cents"),
            Max("acct_cents", alias_name="max_acct_cents"),
        )
        .to_pandas()
    )
    return out.sort_values("n_name").reset_index(drop=True)


def supplier_nation_agg_sql() -> str:
    return """
        SELECT n.n_name,
               COUNT(*) AS n_suppliers,
               MIN(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS min_acct_cents,
               MAX(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS max_acct_cents
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
    """


def sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session windows per user: a new session starts when the gap from
    the previous event exceeds `gap_minutes` (streaming-shaped op:
    groupby(user_id) + per-group pandas over the ts-sorted log — the
    Ray Data pattern for event-time windows)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_session = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        g["session_id"] = new_session.cumsum().astype("int64")
        agg = g.groupby("session_id").agg(
            n_events=("ts", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )
        agg = agg.reset_index()
        agg.insert(0, "user_id", g["user_id"].iloc[0])
        return agg

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["user_id", "session_id"]).reset_index(drop=True)


def sessionize_sql(gap_minutes: int = 30) -> str:
    return f"""
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM o
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM s GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """


def running_user_totals(sf_dir: str) -> pd.DataFrame:
    """Row-level window function: running event count and value total per
    user in ts order (cumsum inside ts-sorted groups)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        cents = (g["value"] * 100.0).round().astype("int64")
        g["running_n"] = range(1, len(g) + 1)
        g["running_value_cents"] = cents.cumsum()
        return g[["event_id", "user_id", "running_n", "running_value_cents"]]

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    out["running_n"] = out["running_n"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def running_user_totals_sql() -> str:
    return """
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS running_n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
                   AS running_value_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
        ORDER BY event_id
    """


def asof_click_before_purchase(sf_dir: str) -> pd.DataFrame:
    """As-of join: for every 'purchase' event, the most recent 'click'
    by the same user at or before the purchase time.

    Ray pattern for as-of/range joins (no built-in): partition by the
    join key (groupby user_id), sort each side by ts inside the group,
    and pd.merge_asof per group. NULL matches surface as -1 so the
    result hashes identically to the SQL LEFT ASOF JOIN oracle.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        purchases = g[g["event_type"] == "purchase"].sort_values("ts")
        clicks = g[g["event_type"] == "click"].sort_values("ts")
        if not len(purchases):
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "click_event_id": pd.Series([], dtype="int64"),
                }
            )
        merged = pd.merge_asof(
            purchases[["event_id", "user_id", "ts"]],
            clicks[["event_id", "ts"]].rename(columns={"event_id": "click_event_id"}),
            on="ts",
            direction="backward",
            allow_exact_matches=True,
        )
        out = merged[["event_id", "user_id", "click_event_id"]].copy()
        out["click_event_id"] = out["click_event_id"].fillna(-1).astype("int64")
        return out

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def asof_click_before_purchase_sql() -> str:
    return """
        SELECT p.event_id,
               p.user_id,
               COALESCE(c.event_id, -1) AS click_event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
        ORDER BY p.event_id
    """


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """Grouping-sets / ROLLUP: revenue by (order year, status), with
    per-year subtotals and a grand total.

    Ray shape: ONE distributed groupby at the finest grain — the
    rollup levels are derived from that (tiny) aggregate, never from a
    second scan of the input. NULL grouping keys surface as the
    sentinels (-1, 'ALL') so the frame hashes identically to the SQL
    ROLLUP oracle."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    base = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["o_year", "o_orderstatus"])
        .aggregate(Sum("price_cents", alias_name="revenue_cents"), Count(alias_name="n_orders"))
        .to_pandas()
    )
    per_year = (
        base.groupby("o_year", as_index=False)[["revenue_cents", "n_orders"]]
        .sum()
        .assign(o_orderstatus="ALL")
    )
    grand = pd.DataFrame(
        {
            "o_year": [-1],
            "o_orderstatus": ["ALL"],
            "revenue_cents": [base["revenue_cents"].sum()],
            "n_orders": [base["n_orders"].sum()],
        }
    )
    cols = ["o_year", "o_orderstatus", "revenue_cents", "n_orders"]
    out = pd.concat([base[cols], per_year[cols], grand[cols]])
    for c in ("o_year", "revenue_cents", "n_orders"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["o_year", "o_orderstatus"]).reset_index(drop=True)


def orders_rollup_sql() -> str:
    return """
        SELECT COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS o_year,
               COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               CAST(ROUND(SUM(ROUND(o_totalprice * 100))) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
        ORDER BY o_year, o_orderstatus
    """


def lineitem_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-group median + p90 of the price distribution.

    Ray has no quantile aggregate; with integer-cents values the exact
    discrete quantile is computed per group inside map_groups (numpy
    sort over the group's column — the group is one flag/status slice,
    small relative to the corpus). Matches DuckDB quantile_disc."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"l_returnflag": t["l_returnflag"], "price_cents": _cents(t["l_extendedprice"])}
        )

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = np.sort(g["price_cents"].to_numpy())
        # quantile_disc: value at index ceil(q*n)-1 (1-based), per DuckDB
        def qd(q):
            i = max(0, int(np.ceil(q * len(v))) - 1)
            return int(v[i])

        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "median_cents": [qd(0.5)],
                "p90_cents": [qd(0.9)],
                "n_items": [len(v)],
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("l_returnflag")
        .map_groups(quantiles, batch_format="pandas")
        .to_pandas()
    )
    for c in ("median_cents", "p90_cents", "n_items"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def lineitem_quantiles_sql() -> str:
    return """
        SELECT l_returnflag,
               quantile_disc(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.5)
                   AS median_cents,
               quantile_disc(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.9)
                   AS p90_cents,
               COUNT(*) AS n_items
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """


def customers_without_orders(sf_dir: str, min_price: float = 400000.0) -> pd.DataFrame:
    """Broadcast ANTI-join: customers with no order above `min_price`
    (the fixtures are FK-complete, so the plain no-orders variant would
    be vacuously empty — the threshold keeps the check meaningful:
    ~200 of 1500 customers at sf0.01).

    The qualifying custkey set is reduced distributed (filter + unique
    on a pruned read), broadcast once with ray.put, and each customer
    batch drops matching rows with a vectorized is_in — the NOT EXISTS
    shape without a shuffle join."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    big = orders.filter(expr=f"o_totalprice > {min_price}")
    have = pa.array(sorted(big.unique("o_custkey")), pa.int64())
    ref = ray.put(have)

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = pc.invert(pc.is_in(t["c_custkey"], value_set=keys))
        return t.filter(mask)

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    out = ds.map_batches(anti, batch_format="pyarrow").to_pandas()
    if "c_custkey" not in out.columns:
        out = pd.DataFrame(
            {"c_custkey": pd.Series([], dtype="int64"), "c_mktsegment": pd.Series([], dtype="str")}
        )
    return out.sort_values("c_custkey").reset_index(drop=True)


def customers_without_orders_sql(min_price: float = 400000.0) -> str:
    return f"""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > {min_price})
        ORDER BY c_custkey
    """


def orders_sample(sf_dir: str, modulus: int = 20) -> pd.DataFrame:
    """Deterministic hash sample (~1/modulus of orders): md5(o_orderkey)
    bucket 0. Unlike random_sample this is reproducible and
    SQL-oracled; the filter is embarrassingly parallel."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def sample(t: pa.Table) -> pa.Table:
        from pdfrust_ray.functions.md5vec import md5_prefix_u32

        keys = [str(k).encode() for k in t["o_orderkey"].to_pylist()]
        keep = md5_prefix_u32(keys) % modulus == 0
        t = t.filter(pa.array(keep))
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "price_cents": _cents(t["o_totalprice"])}
        )

    out = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    if "o_orderkey" not in out.columns:
        out = pd.DataFrame(
            {"o_orderkey": pd.Series([], dtype="int64"), "price_cents": pd.Series([], dtype="int64")}
        )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def orders_sample_sql(modulus: int = 20) -> str:
    # same md5-bucket predicate, evaluated in SQL
    return f"""
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders
        WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT)
              % {modulus} = 0
        ORDER BY o_orderkey
    """


def customer_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Stratified deterministic sample: each market segment keeps
    ~1/m(segment) of its customers where the per-stratum modulus is
    itself hash-derived (so strata genuinely differ). Reproducible,
    embarrassingly parallel, SQL-oracled — the training-data 'sample
    rare strata more densely' primitive."""
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def sample(t: pa.Table) -> pa.Table:
        from pdfrust_ray.functions.md5vec import md5_prefix_u32

        segs = t["c_mktsegment"].to_pylist()
        keys = [str(k).encode() for k in t["c_custkey"].to_pylist()]
        m = md5_prefix_u32([s.encode() for s in segs]) % 5 + 3
        keep = md5_prefix_u32(keys) % m == 0
        return t.filter(pa.array(keep))

    out = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    if "c_custkey" not in out.columns:
        out = pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "c_mktsegment": pd.Series([], dtype="string"),
            }
        )
    return out.sort_values("c_custkey").reset_index(drop=True)


def customer_stratified_sample_sql() -> str:
    md5u32 = "CAST(('0x' || substr(md5({expr}), 1, 8)) AS UBIGINT)"
    seg = md5u32.format(expr="c_mktsegment")
    key = md5u32.format(expr="CAST(c_custkey AS VARCHAR)")
    return f"""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE {key} % ({seg} % 5 + 3) = 0
        ORDER BY c_custkey
    """


def events_value_quartiles(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) per user over (value, event_id) order: every event
    tagged with its within-user value quartile. groupby(user) +
    vectorized per-group assignment (SQL NTILE fill rule: the first
    n % 4 tiles take the extra rows)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values(["value", "event_id"], kind="mergesort").reset_index(drop=True)
        n = len(g)
        size, rem = divmod(n, 4)
        r = np.arange(n)
        cut = rem * (size + 1)
        tile = np.where(
            r < cut,
            r // max(size + 1, 1),
            rem + np.maximum(r - cut, 0) // max(size, 1),
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "quartile": (tile + 1).astype("int64"),
            }
        )

    out = ds.groupby("user_id").map_groups(tiles, batch_format="pandas").to_pandas()
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def events_value_quartiles_sql() -> str:
    return """
        SELECT event_id, user_id,
               CAST(NTILE(4) OVER (PARTITION BY user_id
                                   ORDER BY value, event_id) AS BIGINT) AS quartile
        FROM events
        ORDER BY user_id, event_id
    """


def events_sliding_hour(sf_dir: str) -> pd.DataFrame:
    """Sliding event-time window: for every event, the number of events
    by the same user in the trailing hour (RANGE frame, inclusive).

    Ray shape: groupby(user_id) + a two-pointer sweep over each user's
    ts-sorted log inside map_groups — the event-time analogue of the
    sessionize stage; no driver loops, one key-partitioned shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    window = pd.Timedelta(hours=1)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="stable").reset_index(drop=True)
        ts = g["ts"].to_numpy()
        import numpy as np

        # RANGE frame: all rows with ts in [ts[i]-1h, ts[i]] — including
        # PEERS of the current row (same ts), matching SQL RANGE ... CURRENT
        # ROW semantics on ties.
        left = np.searchsorted(ts, ts - window.to_timedelta64(), side="left")
        right = np.searchsorted(ts, ts, side="right")
        g["n_last_hour"] = (right - left).astype("int64")
        return g[["event_id", "user_id", "n_last_hour"]]

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def events_sliding_hour_sql() -> str:
    return """
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                             AND CURRENT ROW) AS BIGINT)
                   AS n_last_hour
        FROM events
        ORDER BY event_id
    """


def top_orders_per_segment(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Ranked top-N per group (ROW_NUMBER() <= k): the k highest-value
    orders per market segment.

    Scale shape: broadcast the small customer side (ray.put once), then
    a per-batch LOCAL top-k combiner — each batch keeps at most k rows
    per segment, so the final groupby(segment) shuffle moves
    O(batches x segments x k) rows, never the order table. The final
    per-group rank is assigned inside map_groups."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    ref = ray.put(cust)

    class LocalTopK:
        def __init__(self):
            self.cust = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            left = pa.table(
                {
                    "o_custkey": t["o_custkey"],
                    "o_orderkey": t["o_orderkey"],
                    "price_cents": _cents(t["o_totalprice"]),
                }
            )
            j = left.join(
                self.cust, keys="o_custkey", right_keys="c_custkey", join_type="inner"
            ).select(["c_mktsegment", "o_orderkey", "price_cents"])
            # local combiner: keep at most k candidates per segment
            df = j.to_pandas()
            df = df.sort_values(
                ["c_mktsegment", "price_cents", "o_orderkey"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            return pa.Table.from_pandas(
                df.groupby("c_mktsegment", sort=False).head(k), preserve_index=False
            )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["price_cents", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = pd.Series(range(1, len(g) + 1), dtype="int64")
        return g[["c_mktsegment", "rnk", "o_orderkey", "price_cents"]]

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    out = (
        ds.map_batches(LocalTopK, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("c_mktsegment")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["c_mktsegment", "rnk"]).reset_index(drop=True)


def top_orders_per_segment_sql(k: int = 3) -> str:
    return f"""
        WITH j AS (
          SELECT c.c_mktsegment, o.o_orderkey,
                 CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), r AS (
          SELECT c_mktsegment, o_orderkey, price_cents,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY price_cents DESC, o_orderkey) AS rnk
          FROM j
        )
        SELECT c_mktsegment, CAST(rnk AS BIGINT) AS rnk, o_orderkey, price_cents
        FROM r WHERE rnk <= {k}
        ORDER BY c_mktsegment, rnk
    """


def user_next_event(sf_dir: str) -> pd.DataFrame:
    """LEAD window: for every event, the time gap to the same user's
    NEXT event (microseconds) and that event's type. Last event of a
    user gets the sentinels (-1, '') so the frame hashes identically to
    the SQL LEAD oracle's COALESCE. One key-partitioned shuffle
    (groupby user_id), vectorized shift inside the group."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        nxt_ts = g["ts"].shift(-1)
        gap = ((nxt_ts - g["ts"]).dt.total_seconds() * 1_000_000).round()
        g["next_gap_us"] = gap.fillna(-1).astype("int64")
        g["next_event_type"] = g["event_type"].shift(-1).fillna("")
        return g[["event_id", "user_id", "next_gap_us", "next_event_type"]]

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def user_next_event_sql() -> str:
    return """
        SELECT event_id, user_id,
               COALESCE(CAST(date_diff('microsecond', ts, LEAD(ts) OVER w) AS BIGINT),
                        -1) AS next_gap_us,
               COALESCE(LEAD(event_type) OVER w, '') AS next_event_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """


def user_funnel_sets(sf_dir: str) -> pd.DataFrame:
    """Set operations (INTERSECT / EXCEPT re-expressed): classify every
    user by membership in the click set vs the purchase set — 'both' is
    the INTERSECT, 'click_only'/'purchase_only' the two EXCEPTs,
    'neither' the complement. Ray shape: per-batch indicator columns
    (vectorized equality) -> one groupby(user_id) Max aggregate (the
    exchange carries two int bits per user), category derived on the
    tiny aggregate."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        return pa.table(
            {
                "user_id": t["user_id"],
                "is_click": pc.cast(pc.equal(et, "click"), pa.int64()),
                "is_purchase": pc.cast(pc.equal(et, "purchase"), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("is_click", alias_name="has_click"), Max("is_purchase", alias_name="has_purchase"))
        .to_pandas()
    )
    import numpy as np

    c = agg["has_click"].to_numpy() == 1
    p = agg["has_purchase"].to_numpy() == 1
    agg["funnel_set"] = np.select(
        [c & p, c & ~p, ~c & p], ["both", "click_only", "purchase_only"], default="neither"
    )
    out = agg[["user_id", "funnel_set"]].copy()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def user_funnel_sets_sql() -> str:
    return """
        WITH f AS (
          SELECT user_id,
                 MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
          FROM events GROUP BY user_id
        )
        SELECT user_id,
               CASE WHEN has_click = 1 AND has_purchase = 1 THEN 'both'
                    WHEN has_click = 1 THEN 'click_only'
                    WHEN has_purchase = 1 THEN 'purchase_only'
                    ELSE 'neither' END AS funnel_set
        FROM f ORDER BY user_id
    """


def events_value_percentiles(sf_dir: str) -> pd.DataFrame:
    """Interpolated (continuous) percentiles per event type — the
    quantile_cont complement of lineitem_quantiles' quantile_disc.

    Exactness: DuckDB interpolates as lo*(1-frac) + hi*frac with
    h = (n-1)*q (verified bit-identical on the testdata); the same
    float-op order is reproduced here so the doubles hash-match. One
    key-partitioned shuffle, numpy sort per group."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = np.sort(g["value"].to_numpy())
        n = len(v)

        def qc(q: float) -> float:
            h = (n - 1) * q
            lo = int(np.floor(h))
            frac = h - lo
            hi = min(lo + 1, n - 1)
            return float(v[lo] * (1 - frac) + v[hi] * frac)

        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p50_value": [qc(0.5)],
                "p95_value": [qc(0.95)],
                "n_events": [n],
            }
        )

    out = (
        ds.groupby("event_type")
        .map_groups(quantiles, batch_format="pandas")
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def events_value_percentiles_sql() -> str:
    return """
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50_value,
               quantile_cont(value, 0.95) AS p95_value,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_daily_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot (long -> wide): per day, one count column per event type
    plus the total. Ray shape: the CASE-WHEN indicator columns are
    built vectorized per batch, so the pivot is just a groupby(day) Sum
    — the exchange carries one short row per (batch, day), never a
    per-type fan-out."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        cols = {"day": pc.floor_temporal(t["ts"], unit="day")}
        for et in _EVENT_TYPES:
            cols[f"n_{et}"] = pc.cast(pc.equal(t["event_type"], et), pa.int64())
        return pa.table(cols)

    aggs = [Sum(f"n_{et}", alias_name=f"n_{et}") for et in _EVENT_TYPES]
    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(*aggs, Count(alias_name="n_total"))
        .to_pandas()
    )
    for et in _EVENT_TYPES:
        out[f"n_{et}"] = out[f"n_{et}"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def events_daily_pivot_sql() -> str:
    cases = ",\n               ".join(
        f"CAST(SUM(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{et}"
        for et in _EVENT_TYPES
    )
    return f"""
        SELECT date_trunc('day', ts) AS day,
               {cases},
               COUNT(*) AS n_total
        FROM events
        GROUP BY 1 ORDER BY 1
    """


def region_revenue(sf_dir: str) -> pd.DataFrame:
    """3-way dimension join chain: lineitem -> supplier -> nation ->
    region, revenue per region. The dimension chain (supplier x nation
    x region) is pre-joined ONCE driver-side into a single
    suppkey -> region map and broadcast — at design scale the dims are
    O(suppliers) rows vs O(lineitems) facts, the textbook star-schema
    broadcast; the fact table never shuffles until the tiny final
    groupby."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    dim = supp.join(
        nation, keys="s_nationkey", right_keys="n_nationkey", join_type="inner"
    ).join(region, keys="n_regionkey", right_keys="r_regionkey", join_type="inner")
    dim = dim.select(["s_suppkey", "r_name"])
    ref = ray.put(dim)

    class JoinRegion:
        def __init__(self):
            self.dim = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            left = pa.table(
                {"l_suppkey": t["l_suppkey"], "price_cents": _cents(t["l_extendedprice"])}
            )
            j = left.join(self.dim, keys="l_suppkey", right_keys="s_suppkey", join_type="inner")
            return j.select(["r_name", "price_cents"])

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice"])
    out = (
        ds.map_batches(JoinRegion, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("r_name")
        .aggregate(Sum("price_cents", alias_name="revenue_cents"), Count(alias_name="n_items"))
        .to_pandas()
    )
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)


def region_revenue_sql() -> str:
    return """
        SELECT r.r_name,
               CAST(ROUND(SUM(ROUND(l.l_extendedprice * 100))) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name
    """


def first_last_order_per_customer(sf_dir: str) -> pd.DataFrame:
    """FIRST_VALUE / LAST_VALUE window: per customer, the orderkey of
    their earliest and latest order in (o_orderdate, o_orderkey) order,
    plus the order count. One key-partitioned shuffle; argmin/argmax
    computed vectorized inside the group."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        return pd.DataFrame(
            {
                "o_custkey": pd.Series([int(g["o_custkey"].iloc[0])], dtype="int64"),
                "first_orderkey": pd.Series([int(g["o_orderkey"].iloc[0])], dtype="int64"),
                "last_orderkey": pd.Series([int(g["o_orderkey"].iloc[-1])], dtype="int64"),
                "n_orders": pd.Series([len(g)], dtype="int64"),
            }
        )

    out = ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas").to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def first_last_order_per_customer_sql() -> str:
    return """
        SELECT DISTINCT o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
               LAST_VALUE(o_orderkey) OVER w AS last_orderkey,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey
    """


def orders_above_customer_avg(sf_dir: str) -> pd.DataFrame:
    """Correlated-subquery filter: orders strictly above their own
    customer's average order value.

    Integer-exact predicate: price_cents * n_orders > sum_cents avoids
    the float average entirely, so engine and SQL agree bit-for-bit.
    Shape: one groupby(custkey) aggregate produces the per-customer
    (sum, count) pairs — customer-count rows, broadcast once — then an
    embarrassingly-parallel vectorized filter over orders."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"], "price_cents": _cents(t["o_totalprice"])}
        )

    stats = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("price_cents", alias_name="sum_cents"), Count(alias_name="n_orders"))
    )
    stats_tbl = pa.Table.from_pandas(stats.to_pandas(), preserve_index=False)
    ref = ray.put(stats_tbl)

    class AboveAvg:
        def __init__(self):
            self.stats = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            left = pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_custkey": t["o_custkey"],
                    "price_cents": _cents(t["o_totalprice"]),
                }
            )
            j = left.join(self.stats, keys="o_custkey", join_type="inner")
            lhs = pc.multiply(j["price_cents"], j["n_orders"])
            keep = pc.greater(lhs, j["sum_cents"])
            return j.filter(keep).select(["o_orderkey", "o_custkey", "price_cents"])

    out = ds.map_batches(AboveAvg, batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def orders_above_customer_avg_sql() -> str:
    return """
        WITH s AS (
          SELECT o_custkey,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_cents,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY o_custkey
        )
        SELECT o.o_orderkey, o.o_custkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders o JOIN s ON o.o_custkey = s.o_custkey
        WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * s.n_orders > s.sum_cents
        ORDER BY o.o_orderkey
    """


def user_top_event_type(sf_dir: str) -> pd.DataFrame:
    """Per-group MODE: each user's most frequent event type, ties broken
    by the lexically smallest type (deterministic, unlike SQL mode()).
    Shape: per-batch combiner counts (user,type) pairs -> one
    groupby(user_id, event_type) Sum -> argmax inside a second tiny
    groupby(user). The exchange carries (user x type) count rows."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    def combine(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "event_type"], ascending=[False, True], kind="mergesort")
        return pd.DataFrame(
            {
                "user_id": pd.Series([int(g["user_id"].iloc[0])], dtype="int64"),
                "top_event_type": pd.Series([g["event_type"].iloc[0]], dtype="str"),
                "n_events": pd.Series([int(g["n"].iloc[0])], dtype="int64"),
            }
        )

    out = counts.groupby("user_id").map_groups(pick, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def user_top_event_type_sql() -> str:
    return """
        WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS n
          FROM events GROUP BY user_id, event_type
        ), r AS (
          SELECT user_id, event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY n DESC, event_type) AS rnk
          FROM c
        )
        SELECT user_id, event_type AS top_event_type, n AS n_events
        FROM r WHERE rnk = 1 ORDER BY user_id
    """


def events_value_histogram(sf_dir: str, bin_width: int = 25) -> pd.DataFrame:
    """Fixed-width histogram of the event value distribution: bin =
    floor(value_cents / (bin_width*100)) — integer arithmetic on cents
    so bin assignment is exact. Per-batch combiner then one tiny
    groupby(bin); the exchange carries (batch x bins) rows."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    w = bin_width * 100

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        bins = pc.cast(pc.floor(pc.divide(pc.cast(cents, pa.float64()), float(w))), pa.int64())
        g = pa.TableGroupBy(pa.table({"bin": bins, "value_cents": cents}), "bin").aggregate(
            [("value_cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "bin": g["bin"],
                "sum_cents": g["value_cents_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n_events"), Sum("sum_cents", alias_name="sum_value_cents"))
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value_cents"] = out["sum_value_cents"].astype("int64")
    return out.sort_values("bin").reset_index(drop=True)


def events_value_histogram_sql(bin_width: int = 25) -> str:
    w = bin_width * 100
    return f"""
        SELECT CAST(FLOOR(CAST(ROUND(value * 100) AS BIGINT) / {w}.0) AS BIGINT) AS bin,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events
        GROUP BY 1 ORDER BY 1
    """


def user_value_percent_rank(sf_dir: str) -> pd.DataFrame:
    """PERCENT_RANK + CUME_DIST per user over value order: rank-based
    relative standing of every event inside its user partition.
    Vectorized inside the group via searchsorted on the sorted value
    column (RANK ties = left insertion point; CUME_DIST = right), with
    DuckDB's float formulas ((rank-1)/(n-1), cum/n) reproduced for
    bit-identical doubles."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = g["value"].to_numpy()
        sv = np.sort(v)
        n = len(v)
        rank = np.searchsorted(sv, v, side="left") + 1  # RANK() with ties
        cume = np.searchsorted(sv, v, side="right")  # peers included
        pr = (rank - 1) / (n - 1) if n > 1 else np.zeros(n)
        g = g.copy()
        g["pct_rank"] = pr
        g["cume_dist"] = cume / n
        return g[["event_id", "user_id", "pct_rank", "cume_dist"]]

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def user_value_percent_rank_sql() -> str:
    return """
        SELECT event_id, user_id,
               PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value) AS pct_rank,
               CUME_DIST() OVER (PARTITION BY user_id ORDER BY value) AS cume_dist
        FROM events
        ORDER BY event_id
    """


def nation_supplier_names(sf_dir: str) -> pd.DataFrame:
    """Collect/string-agg per group: comma-joined sorted supplier names
    per nation key (one key-partitioned shuffle, per-group join)."""
    ds = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_name"])

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        names = ",".join(sorted(g["s_name"]))
        return pd.DataFrame(
            {
                "s_nationkey": pd.Series([int(g["s_nationkey"].iloc[0])], dtype="int64"),
                "suppliers": pd.Series([names], dtype="str"),
                "n_suppliers": pd.Series([len(g)], dtype="int64"),
            }
        )

    out = ds.groupby("s_nationkey").map_groups(per_nation, batch_format="pandas").to_pandas()
    return out.sort_values("s_nationkey").reset_index(drop=True)


def nation_supplier_names_sql() -> str:
    return """
        SELECT s_nationkey,
               string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
               COUNT(*) AS n_suppliers
        FROM supplier
        GROUP BY s_nationkey
        ORDER BY s_nationkey
    """


def customers_with_big_orders(sf_dir: str, min_price: float = 400000.0) -> pd.DataFrame:
    """Broadcast SEMI-join (EXISTS): customers having at least one
    order above `min_price` — the positive complement of
    customers_without_orders. Qualifying keys reduced distributed,
    broadcast once, vectorized is_in keep-filter per batch."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    big = orders.filter(expr=f"o_totalprice > {min_price}")
    have = pa.array(sorted(big.unique("o_custkey")), pa.int64())
    ref = ray.put(have)

    def semi(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        return t.filter(pc.is_in(t["c_custkey"], value_set=keys))

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    out = ds.map_batches(semi, batch_format="pyarrow").to_pandas()
    if "c_custkey" not in out.columns:
        out = pd.DataFrame(
            {"c_custkey": pd.Series([], dtype="int64"), "c_mktsegment": pd.Series([], dtype="str")}
        )
    return out.sort_values("c_custkey").reset_index(drop=True)


def customers_with_big_orders_sql(min_price: float = 400000.0) -> str:
    return f"""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > {min_price})
        ORDER BY c_custkey
    """


def events_dow_grid(sf_dir: str) -> pd.DataFrame:
    """Dense grid fill (cross join + LEFT JOIN + zero fill): event
    counts for EVERY (event_type x day-of-week) cell, including empty
    ones — the report-shaped output that plain groupby can't produce.
    DoW uses DuckDB's dayofweek numbering (Sunday=0); the engine maps
    Arrow's Monday=0 via (dow+1)%7. The grid is types x 7 — driver-side
    fill on the tiny aggregate."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        # Arrow Monday=0 -> DuckDB Sunday=0: (dow+1) with 7 wrapped to 0
        dow1 = pc.add(pc.cast(pc.day_of_week(t["ts"], count_from_zero=True, week_start=1), pa.int64()), 1)
        return pa.table(
            {
                "event_type": t["event_type"],
                "dow": pc.if_else(pc.equal(dow1, 7), pa.scalar(0, pa.int64()), dow1),
            }
        )

    counts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Count(alias_name="n_events"))
        .to_pandas()
    )
    types = sorted(counts["event_type"].unique())
    grid = pd.MultiIndex.from_product([types, range(7)], names=["event_type", "dow"])
    out = (
        counts.set_index(["event_type", "dow"])
        .reindex(grid, fill_value=0)
        .reset_index()
    )
    out["dow"] = out["dow"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["event_type", "dow"]).reset_index(drop=True)


def events_dow_grid_sql() -> str:
    return """
        WITH g AS (
          SELECT t.event_type, d.dow
          FROM (SELECT DISTINCT event_type FROM events) t
          CROSS JOIN (SELECT unnest(range(0, 7)) AS dow) d
        ), c AS (
          SELECT event_type, dayofweek(ts) AS dow, COUNT(*) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT g.event_type, CAST(g.dow AS BIGINT) AS dow,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.dow = c.dow
        ORDER BY g.event_type, g.dow
    """


def lineitem_discounted_revenue(sf_dir: str) -> pd.DataFrame:
    """Expression aggregate: the TPC-H discounted-revenue expression
    price*(1-discount) per (returnflag, linestatus), in integer cents
    (rounded per row BEFORE summing, in the same float-op order as the
    SQL twin, so the sum is bit-stable)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        disc = pc.multiply(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            ),
            pa.scalar(100.0),
        )
        # DuckDB ROUND is half-away-from-zero; Arrow's default is
        # half-to-even — the discount product genuinely hits .5 cases
        # (unlike the cent-valued price*100 elsewhere)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "disc_cents": pc.cast(
                    pc.round(disc, round_mode="half_towards_infinity"), pa.int64()
                ),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("disc_cents", alias_name="disc_revenue_cents"), Count(alias_name="n_items"))
        .to_pandas()
    )
    out["disc_revenue_cents"] = out["disc_revenue_cents"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def lineitem_discounted_revenue_sql() -> str:
    return """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS disc_revenue_cents,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """


def running_global_total(sf_dir: str, bucket_width: int = 1024) -> pd.DataFrame:
    """GLOBAL cumulative total in event_id order — the distributed
    two-phase prefix scan (Blelloch): unlike running_user_totals there
    is no partition key, so a naive window would serialize the corpus
    through one node.

      phase 1 (up-sweep): bucket = event_id // bucket_width; one tiny
        groupby(bucket) Sum — the exchange is O(n_buckets) counters;
      driver: exclusive prefix over the sorted bucket sums (n_buckets
        integers — broadcast back with ray.put);
      phase 2 (down-sweep): groupby(bucket).map_groups sorts each
        bucket by event_id and emits local cumsum + bucket offset.

    Values are quantized to cents (floor(v*100 + 0.5), exact for the
    non-negative cent-valued inputs) BEFORE summation, so the running
    totals are order-free int64 sums and the window-function SQL twin
    is bit-identical."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        v = t["value"].to_numpy()
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "bucket": pa.array(eid // bucket_width, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    sums = (
        prepped.groupby("bucket")
        .aggregate(Sum("cents", alias_name="s"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    excl = sums["s"].cumsum().shift(1, fill_value=0)
    offsets = dict(zip(sums["bucket"].astype(int), excl.astype(int)))
    oref = ray.put(offsets)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("event_id").reset_index(drop=True)
        g["cum_cents"] = g["cents"].cumsum() + off
        return g[["event_id", "cum_cents"]]

    out = prepped.groupby("bucket").map_groups(scan, batch_format="pandas").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def running_global_total_sql() -> str:
    return """
        SELECT event_id,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
                    OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_cents
        FROM events ORDER BY event_id
    """


def bottom_k_sample(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Uniform k-sample WITHOUT replacement via the bottom-k hash
    sketch: every row gets the deterministic key md5(event_id)[:8]; the
    global k smallest keys ARE a uniform sample (the classic mergeable
    bottom-k / KMV construction — Bar-Yossef et al. 2002).

    Distributed shape: each batch keeps only its local bottom-k
    (vectorized single-block MD5, partial sort), so the driver merge
    sees O(blocks x k) rows — no shuffle, no global sort of the corpus,
    and partial results merge by 'union then re-take bottom-k', which
    is what makes the sketch cluster-friendly. Ties on the 32-bit key
    prefix break by event_id; the SQL twin orders by the same prefix,
    so the sample is bit-identical."""
    import numpy as np

    from ..functions.md5vec import md5_prefix_u32

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def local_bottom_k(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        h = md5_prefix_u32([str(i).encode() for i in eid.tolist()])
        order = np.lexsort((eid, h))[:k]
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "hkey": pa.array(h[order].astype(np.int64), pa.int64()),
            }
        )

    out = ds.map_batches(local_bottom_k, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["hkey", "event_id"]).head(k).reset_index(drop=True)
    out["sample_rank"] = pd.Series(range(1, len(out) + 1), dtype="int64")
    out["event_id"] = out["event_id"].astype("int64")
    return out[["sample_rank", "event_id"]]


def bottom_k_sample_sql(k: int = 100) -> str:
    """Oracle orders by the same 32-bit hex prefix the engine uses
    (substr(md5,1,8)), with event_id tie-break — bit-identical."""
    return f"""
        SELECT CAST(row_number() OVER (
                 ORDER BY substr(md5(CAST(event_id AS VARCHAR)), 1, 8), event_id)
               AS BIGINT) AS sample_rank,
               event_id
        FROM events
        ORDER BY sample_rank LIMIT {k}
    """


def heavy_user_full_outer(sf_dir: str, min_n: int = 15) -> pd.DataFrame:
    """FULL OUTER join: heavy clickers vs heavy purchasers (users with
    >= min_n events of the type). Both join inputs are filtered
    aggregates, so either side can have users the other lacks — the
    full-outer case a left/inner join can't express.

    Ray shape: full-outer-of-aggregates as UNION + indicator groupby —
    each side emits (user_id, n_clicks, n_purchases) rows with the
    other side zeroed, and one hash groupby Sum merges them. This is
    the classic exchange-optimal plan for outer joins of pre-aggregated
    sides (one shuffle total; `Dataset.join(join_type="full_outer")`
    exists but its hash-shuffle finalize rejects schema-less EMPTY
    partitions in Ray 2.49, and would be a second exchange anyway).
    Zero counts and a membership class make the frame hash-identical
    to the SQL oracle. The HAVING filter runs distributed, after each
    side's count aggregate."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    def side(event_type: str, col: str, other: str):
        agg = (
            ds.filter(expr=f"event_type == '{event_type}'")
            .groupby("user_id")
            .aggregate(Count(alias_name=col))
            .filter(expr=f"{col} >= {min_n}")
        )

        def widen(t: pa.Table) -> pa.Table:
            zero = pa.array([0] * t.num_rows, pa.int64())
            cols = {"user_id": t["user_id"], col: pc.cast(t[col], pa.int64()), other: zero}
            return pa.table({k: cols[k] for k in ("user_id", "n_clicks", "n_purchases")})

        return agg.map_batches(widen, batch_format="pyarrow")

    merged = (
        side("click", "n_clicks", "n_purchases")
        .union(side("purchase", "n_purchases", "n_clicks"))
        .groupby("user_id")
        .aggregate(
            Sum("n_clicks", alias_name="n_clicks"),
            Sum("n_purchases", alias_name="n_purchases"),
        )
        .to_pandas()
    )
    nc = merged["n_clicks"].astype("int64")
    np_ = merged["n_purchases"].astype("int64")
    out = pd.DataFrame(
        {
            "user_id": merged["user_id"].astype("int64"),
            "n_clicks": nc,
            "n_purchases": np_,
            "membership": pd.Series(
                ["both" if c > 0 and p > 0 else ("click_only" if c > 0 else "purchase_only")
                 for c, p in zip(nc, np_)],
                dtype="str",
            ),
        }
    )
    return out.sort_values("user_id").reset_index(drop=True)


def heavy_user_full_outer_sql(min_n: int = 15) -> str:
    return f"""
        WITH c AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
          FROM events WHERE event_type = 'click'
          GROUP BY user_id HAVING COUNT(*) >= {min_n}
        ), p AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id HAVING COUNT(*) >= {min_n}
        )
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
               COALESCE(c.n_clicks, 0) AS n_clicks,
               COALESCE(p.n_purchases, 0) AS n_purchases,
               CASE WHEN c.user_id IS NOT NULL AND p.user_id IS NOT NULL THEN 'both'
                    WHEN c.user_id IS NOT NULL THEN 'click_only'
                    ELSE 'purchase_only' END AS membership
        FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
        ORDER BY user_id
    """


def events_daily_unpivot(sf_dir: str) -> pd.DataFrame:
    """Unpivot (wide -> long): the inverse of events_daily_pivot. The
    distributed part is the pivot's own vectorized-indicator groupby;
    the melt then fans each (tiny, day-count-sized) wide row out to one
    (day, event_type, n) row per type — including explicit zero cells,
    which a direct long GROUP BY would omit."""
    wide = events_daily_pivot(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        days, types, ns = [], [], []
        d = t.to_pydict()
        for i in range(t.num_rows):
            for et in _EVENT_TYPES:
                days.append(d["day"][i])
                types.append(et)
                ns.append(d[f"n_{et}"][i])
        return pa.table(
            {
                "day": pa.array(days, t.schema.field("day").type),
                "event_type": pa.array(types, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    out = (
        rd.from_pandas(wide)
        .map_batches(melt, batch_format="pyarrow")
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["day", "event_type"]).reset_index(drop=True)


def events_daily_unpivot_sql() -> str:
    arms = "\n          UNION ALL\n          ".join(
        f"SELECT day, '{et}' AS event_type, n_{et} AS n FROM wide" for et in _EVENT_TYPES
    )
    cases = ",\n                 ".join(
        f"CAST(SUM(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{et}"
        for et in _EVENT_TYPES
    )
    return f"""
        WITH wide AS (
          SELECT date_trunc('day', ts) AS day,
                 {cases}
          FROM events GROUP BY 1
        )
        {arms}
        ORDER BY day, event_type
    """


def orders_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE grouping sets over (o_orderstatus, o_orderpriority): all
    four aggregation levels — (s,p), (s,ALL), (ALL,p), (ALL,ALL) —
    derived from ONE distributed finest-grain groupby (the rollup
    trick extended to the full lattice; the input is never re-scanned).
    'ALL' sentinels make the frame hash-identical to the SQL CUBE."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    base = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("price_cents", alias_name="revenue_cents"), Count(alias_name="n_orders"))
        .to_pandas()
    )
    vals = ["revenue_cents", "n_orders"]
    by_s = (
        base.groupby("o_orderstatus", as_index=False)[vals].sum().assign(o_orderpriority="ALL")
    )
    by_p = (
        base.groupby("o_orderpriority", as_index=False)[vals].sum().assign(o_orderstatus="ALL")
    )
    grand = pd.DataFrame(
        {
            "o_orderstatus": ["ALL"],
            "o_orderpriority": ["ALL"],
            "revenue_cents": [base["revenue_cents"].sum()],
            "n_orders": [base["n_orders"].sum()],
        }
    )
    cols = ["o_orderstatus", "o_orderpriority", "revenue_cents", "n_orders"]
    out = pd.concat([base[cols], by_s[cols], by_p[cols], grand[cols]])
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values(["o_orderstatus", "o_orderpriority"]).reset_index(drop=True)


def orders_cube_sql() -> str:
    return """
        SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               CAST(ROUND(SUM(ROUND(o_totalprice * 100))) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus, o_orderpriority
    """


def late_events_by_day(
    sf_dir: str,
    jitter_us: int = 1_800_000_000,
    lateness_us: int = 300_000_000,
    bucket_us: int = 21_600_000_000,
) -> pd.DataFrame:
    """Event-time watermark accounting — the streaming-semantics
    operator: replay the corpus as a bounded-disorder arrival stream
    (arrival = ts + deterministic md5 jitter < 30 min, the standard
    out-of-order-delivery model), advance a low watermark = max event
    time seen so far, and count per event-time day how many events
    arrive LATE (event time < watermark - allowed lateness) vs on time
    — exactly what a Beam/Flink-style pipeline must decide to trigger
    or drop.

    Ray shape: the watermark is a GLOBAL prefix-max over arrival
    order, so this reuses the two-phase scan of running_global_total
    with max instead of sum: 6-hour arrival-key range buckets ->
    per-bucket max (tiny groupby), driver exclusive prefix-max over
    O(buckets) values, per-bucket down-sweep running max + late flag,
    then a small per-day count groupby. All integer microsecond math,
    so the window-function SQL twin is bit-identical."""
    import numpy as np

    from ..functions.md5vec import md5_prefix_u32

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        tu = pc.cast(t["ts"], pa.int64()).to_numpy()  # epoch us
        h = md5_prefix_u32([str(i).encode() for i in eid.tolist()])
        ak = tu + (h % np.uint64(jitter_us)).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "tu": pa.array(tu, pa.int64()),
                "ak": pa.array(ak, pa.int64()),
                "bucket": pa.array(ak // bucket_us, pa.int64()),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    bmax = (
        prepped.groupby("bucket")
        .aggregate(Max("tu", alias_name="mx"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    excl = bmax["mx"].cummax().shift(1)
    prefix = {
        int(b): (None if pd.isna(m) else int(m))
        for b, m in zip(bmax["bucket"], excl)
    }
    pref = ray.put(prefix)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        seed = ray.get(pref)[int(g["bucket"].iloc[0])]
        g = g.sort_values(["ak", "event_id"]).reset_index(drop=True)
        tu = g["tu"].to_numpy()
        run = np.maximum.accumulate(tu)
        wm = np.empty(len(tu), dtype=np.float64)
        wm[0] = np.nan if seed is None else seed
        if len(tu) > 1:
            wm[1:] = run[:-1]
            if seed is not None:
                wm[1:] = np.maximum(wm[1:], seed)
        late = ~np.isnan(wm) & (tu < wm - lateness_us)
        day = tu // 86_400_000_000 * 86_400_000_000
        return pd.DataFrame(
            {
                "day_us": day,
                "n_late": late.astype("int64"),
                "n_on_time": (~late).astype("int64"),
            }
        )

    agg = (
        prepped.groupby("bucket")
        .map_groups(scan, batch_format="pandas")
        .groupby("day_us")
        .aggregate(Sum("n_late", alias_name="n_late"), Sum("n_on_time", alias_name="n_on_time"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(agg["day_us"].astype("int64"), unit="us"),
            "n_late": agg["n_late"].astype("int64"),
            "n_on_time": agg["n_on_time"].astype("int64"),
        }
    )
    return out.sort_values("day").reset_index(drop=True)


def late_events_by_day_sql(
    jitter_us: int = 1_800_000_000, lateness_us: int = 300_000_000
) -> str:
    md5u32 = "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT)"
    return f"""
        WITH a AS (
          SELECT event_id, ts, epoch_us(ts) AS tu,
                 epoch_us(ts) + {md5u32} % {jitter_us} AS ak
          FROM events
        ), w AS (
          SELECT event_id, ts, tu,
                 MAX(tu) OVER (ORDER BY ak, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
          FROM a
        )
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) FILTER (WHERE wm IS NOT NULL AND tu < wm - {lateness_us})
                    AS BIGINT) AS n_late,
               CAST(COUNT(*) FILTER (WHERE wm IS NULL OR tu >= wm - {lateness_us})
                    AS BIGINT) AS n_on_time
        FROM w GROUP BY 1 ORDER BY 1
    """


def orders_skyline(sf_dir: str) -> pd.DataFrame:
    """Skyline / Pareto-front query: orders not dominated on
    (totalprice, orderdate) — maximize both; b dominates a when b >= a
    on both dimensions and > on at least one.

    Distributed shape (the classic two-phase skyline): each batch
    computes its LOCAL Pareto front (dominance is transitive, so no
    global-front point can be dominated locally — local fronts are a
    superset-preserving combiner); the union of local fronts (small by
    the skyline's nature) is reduced with one final dominance pass.
    Exchange volume = sum of local front sizes, never the fact table.
    Prices compare in exact integer cents on both sides."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )

    def _front(keys, price, day):
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        ge_p = price[None, :] >= price[:, None]
        ge_d = day[None, :] >= day[:, None]
        strict = (price[None, :] > price[:, None]) | (day[None, :] > day[:, None])
        dominated = (ge_p & ge_d & strict).any(axis=1)
        return ~dominated

    def local_front(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()).to_numpy()
        ts = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()).to_numpy()
        keep = _front(keys, cents, ts)
        return pa.table(
            {
                "o_orderkey": pa.array(keys[keep], pa.int64()),
                "price_cents": pa.array(cents[keep], pa.int64()),
                "ts_us": pa.array(ts[keep], pa.int64()),
            }
        )

    partial = ds.map_batches(local_front, batch_format="pyarrow").to_pandas()
    keys = partial["o_orderkey"].to_numpy()
    cents = partial["price_cents"].to_numpy()
    ts = partial["ts_us"].to_numpy()
    keep = _front(keys, cents, ts)
    out = pd.DataFrame(
        {
            "o_orderkey": pd.Series(keys[keep], dtype="int64"),
            "price_cents": pd.Series(cents[keep], dtype="int64"),
            "o_orderdate": pd.to_datetime(ts[keep].astype("int64"), unit="us"),
        }
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def orders_skyline_sql() -> str:
    return """
        WITH o AS (
          SELECT o_orderkey,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
                 o_orderdate
          FROM orders
        )
        SELECT a.o_orderkey, a.price_cents,
               CAST(a.o_orderdate AS TIMESTAMP) AS o_orderdate
        FROM o a
        WHERE NOT EXISTS (
          SELECT 1 FROM o b
          WHERE b.price_cents >= a.price_cents AND b.o_orderdate >= a.o_orderdate
            AND (b.price_cents > a.price_cents OR b.o_orderdate > a.o_orderdate)
        )
        ORDER BY o_orderkey
    """


def events_per_user_sample(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-group uniform sampling: the k events per user with the
    smallest md5 keys — the grouped bottom-k sketch (deterministic
    reservoir). One user-keyed shuffle of (user_id, hash, event_id)
    triples; inside each group a partial sort takes k. Same hex-prefix
    order as bottom_k_sample so the SQL twin is bit-identical."""
    import numpy as np

    from ..functions.md5vec import md5_prefix_u32

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        h = md5_prefix_u32([str(i).encode() for i in eid.tolist()])
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": pa.array(eid, pa.int64()),
                "hkey": pa.array(h.astype(np.int64), pa.int64()),
            }
        )

    def take_k(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hkey", "event_id"]).head(k).reset_index(drop=True)
        g["sample_rank"] = pd.Series(range(1, len(g) + 1), dtype="int64")
        return g[["user_id", "sample_rank", "event_id"]]

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(take_k, batch_format="pandas")
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["user_id", "sample_rank"]).reset_index(drop=True)


def events_per_user_sample_sql(k: int = 3) -> str:
    return f"""
        SELECT user_id, CAST(rn AS BIGINT) AS sample_rank, event_id
        FROM (
          SELECT user_id, event_id,
                 row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY substr(md5(CAST(event_id AS VARCHAR)), 1, 8), event_id) AS rn
          FROM events
        )
        WHERE rn <= {k}
        ORDER BY user_id, sample_rank
    """


# ---------------------------------------------------------------------------
# A-ES weighted sampling without replacement
# ---------------------------------------------------------------------------


def weighted_sample(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Weighted k-sample without replacement (Efraimidis-Spirakis A-ES,
    IPL 2006): each row gets key u^(1/w) with u a deterministic
    md5-derived uniform and w = its weight (value); the global top-k
    keys are the sample, with inclusion probability proportional to
    weight. The quality-weighted corpus-sampling primitive.

    Shape: keys are computed per batch (vectorized md5 + glibc pow —
    correctly-rounded float64, so DuckDB's pow() agrees bit-for-bit),
    each batch keeps only its LOCAL top-k, and the driver merges
    O(blocks x k) survivors — mergeable and shuffle-free, exactly like
    bottom_k_sample."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def local_topk(t: pa.Table) -> pa.Table:
        from pdfrust_ray.functions.md5vec import md5_prefix_u32

        ids = t["event_id"].to_numpy()
        w = t["value"].to_numpy().astype(np.float64)
        h = md5_prefix_u32([str(i).encode() for i in ids.tolist()])
        u = (h.astype(np.float64) + 1.0) / 4294967296.0
        key = np.power(u, 1.0 / w)
        # local top-k by (key DESC, event_id ASC)
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                "event_id": pa.array(ids[order], pa.int64()),
                "value": pa.array(w[order], pa.float64()),
                "key": pa.array(key[order], pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["key", "event_id"], ascending=[False, True], kind="mergesort")
    out = cand.head(k)[["event_id", "value"]].copy()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def weighted_sample_sql(k: int = 20) -> str:
    return f"""
        SELECT event_id, value FROM (
          SELECT event_id, value,
                 pow((CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1)
                     / 4294967296.0,
                     1.0 / value) AS key
          FROM events
          ORDER BY key DESC, event_id LIMIT {k}
        )
        ORDER BY event_id
    """


# ---------------------------------------------------------------------------
# time-band self-join (tiled windows + halo)
# ---------------------------------------------------------------------------

_BAND_US = 60_000_000  # 60 s


def events_band_join(sf_dir: str, band_us: int = _BAND_US) -> pd.DataFrame:
    """Same-user event pairs at most `band_us` apart (0 <= tb-ta <= band,
    canonical earlier-first, ties by event_id) — the band/range join
    Ray Data has no primitive for.

    Distributed pattern: tile time into 2*band windows and duplicate
    any event within `band` of its window's end into the NEXT window
    (halo). Every qualifying pair then co-exists in at least one
    (user, window) group — if b lands in the next window, a is by
    construction inside the halo — so groupby(user_id, window) +
    within-group pairing finds all pairs locally; a pair found twice
    (both members duplicated) collapses in the final pair-keyed dedup.
    The exchange carries each event at most twice; no O(n^2) block."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    win = 2 * band_us

    def tile(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64()).to_numpy()
        ids = t["event_id"].to_numpy()
        users = t["user_id"].to_numpy()
        w = ts_us // win
        # base copy + halo copy for events near the window end
        halo = (ts_us % win) >= (win - band_us)
        u2 = np.concatenate([users, users[halo]])
        w2 = np.concatenate([w, w[halo] + 1])
        return pa.table(
            {
                "user_id": pa.array(u2, pa.int64()),
                "window": pa.array(w2, pa.int64()),
                # coarse shard keeps every (user, window) group whole
                # while amortizing Ray's per-group dispatch over ~1e5
                # tiny groups (the same rework as supplier_butterflies)
                "shard": pa.array(((u2 * 1_000_003 + w2) % 64).astype(np.int32), pa.int32()),
                "event_id": pa.array(np.concatenate([ids, ids[halo]]), pa.int64()),
                "ts_us": pa.array(np.concatenate([ts_us, ts_us[halo]]), pa.int64()),
            }
        )

    def pair_of_shard(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out_a, out_b, out_g = [], [], []
        for _uw, grp in g.groupby(["user_id", "window"], sort=False):
            grp = grp.sort_values(["ts_us", "event_id"], kind="mergesort")
            ts = grp["ts_us"].to_numpy()
            ids = grp["event_id"].to_numpy()
            right = np.searchsorted(ts, ts + band_us, side="right")
            idx = np.arange(len(ts))
            cnt = right - idx - 1
            tot = int(cnt.sum())
            if tot == 0:
                continue
            # vectorized (i, j) emission: j runs i+1 .. right[i]-1
            a_idx = np.repeat(idx, cnt)
            b_idx = (
                np.arange(tot)
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
                + np.repeat(idx + 1, cnt)
            )
            out_a.append(ids[a_idx])
            out_b.append(ids[b_idx])
            out_g.append(ts[b_idx] - ts[a_idx])
        if not out_a:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("a_id", "b_id", "gap_us")}
            )
        return pd.DataFrame(
            {
                "a_id": pd.Series(np.concatenate(out_a), dtype="int64"),
                "b_id": pd.Series(np.concatenate(out_b), dtype="int64"),
                "gap_us": pd.Series(np.concatenate(out_g), dtype="int64"),
            }
        )

    out = (
        ds.map_batches(tile, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pair_of_shard, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("a_id", "b_id", "gap_us")}
        )
    out = out.drop_duplicates(subset=["a_id", "b_id"])
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def events_band_join_sql(band_us: int = _BAND_US) -> str:
    return f"""
        SELECT a.event_id AS a_id, b.event_id AS b_id,
               epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id <> b.event_id
         AND b.ts >= a.ts AND epoch_us(b.ts) - epoch_us(a.ts) <= {band_us}
         AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
        ORDER BY a_id, b_id
    """


# ---------------------------------------------------------------------------
# MAD robust outliers
# ---------------------------------------------------------------------------


def events_value_outliers(sf_dir: str, mult: int = 3) -> pd.DataFrame:
    """Rows whose |value - per-type median| exceeds mult x MAD (median
    absolute deviation) — the robust outlier rule that, unlike z-scores,
    is not itself corrupted by the outliers it hunts. All math on
    integer cents, so the SQL twin is exact.

    Two-phase: per-type (median, MAD) via groupby(event_type).map_groups
    (exact quantile per group; the group count is the type cardinality —
    at unbounded scale the mergeable quantile_sketch is the stand-in),
    thresholds broadcast, then one streaming filter pass."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "c": _cents(t["value"]),
            }
        )

    base = ds.map_batches(prep, batch_format="pyarrow")

    def med_mad(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["c"].to_numpy())
        m = int(v[max(0, int(np.ceil(0.5 * len(v))) - 1)])  # quantile_disc 0.5
        d = np.sort(np.abs(g["c"].to_numpy() - m))
        mad = int(d[max(0, int(np.ceil(0.5 * len(d))) - 1)])
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "m": [m], "d": [mad]}
        )

    th = (
        base.groupby("event_type").map_groups(med_mad, batch_format="pandas").to_pandas()
    )
    import ray as _ray

    th_ref = _ray.put({r.event_type: (int(r.m), int(r.d)) for r in th.itertuples()})

    def flag(t: pa.Table) -> pa.Table:
        lut = _ray.get(th_ref)
        types = t["event_type"].to_pylist()
        c = t["c"].to_numpy()
        m = np.array([lut[x][0] for x in types], dtype=np.int64)
        d = np.array([lut[x][1] for x in types], dtype=np.int64)
        keep = np.abs(c - m) > mult * d
        return t.filter(pa.array(keep))

    out = base.map_batches(flag, batch_format="pyarrow").to_pandas()
    out = out.rename(columns={"c": "value_cents"})
    for c in ("event_id", "value_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def events_value_outliers_sql(mult: int = 3) -> str:
    return f"""
        WITH v AS (SELECT event_id, event_type,
                          CAST(ROUND(value * 100) AS BIGINT) AS value_cents
                   FROM events),
        med AS (SELECT event_type, quantile_disc(value_cents, 0.5) AS m
                FROM v GROUP BY event_type),
        mad AS (SELECT v.event_type,
                       quantile_disc(abs(v.value_cents - med.m), 0.5) AS d
                FROM v JOIN med USING (event_type) GROUP BY v.event_type)
        SELECT v.event_id, v.event_type, v.value_cents
        FROM v JOIN med USING (event_type) JOIN mad USING (event_type)
        WHERE abs(v.value_cents - med.m) > {mult} * mad.d
        ORDER BY v.event_id
    """


# ---------------------------------------------------------------------------
# trailing-window event dedup
# ---------------------------------------------------------------------------

_DEDUP_WIN_US = 3_600_000_000  # 1 h


def windowed_event_dedup(sf_dir: str, window_us: int = _DEDUP_WIN_US) -> pd.DataFrame:
    """Stream dedup: keep an event iff no event with the same
    (user_id, event_type) occurred within the preceding hour — the
    at-most-once-per-window suppression rule of alerting/metering
    pipelines. Keyed shuffle + per-group vectorized LAG diff; the SQL
    twin is the LAG window."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        ts = g["ts_us"].to_numpy()
        gap = np.diff(ts, prepend=ts[0] - window_us - 1)
        return g[gap > window_us]

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .map_groups(keep, batch_format="pandas")
        .to_pandas()
    )
    for c in ("event_id", "user_id", "ts_us"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def windowed_event_dedup_sql(window_us: int = _DEDUP_WIN_US) -> str:
    return f"""
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        FROM (
          SELECT event_id, user_id, event_type, ts,
                 LAG(ts) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS prev
          FROM events
        )
        WHERE prev IS NULL OR epoch_us(ts) - epoch_us(prev) > {window_us}
        ORDER BY event_id
    """


# ---------------------------------------------------------------------------
# JSON property extraction + aggregate
# ---------------------------------------------------------------------------


def props_k_stats(sf_dir: str) -> pd.DataFrame:
    """Parse the JSON `props` column and aggregate the extracted field
    per event_type — the semi-structured-payload pattern (stdlib
    json.loads per row inside the batch; the extraction is row-local so
    the only exchange is the type-cardinality groupby of partials)."""
    import json

    from ray.data.aggregate import Max, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pd.DataFrame:
        rows: dict[str, list[int]] = {}
        for et, pr in zip(t["event_type"].to_pylist(), t["props"].to_pylist()):
            k = int(json.loads(pr)["k"])
            agg = rows.setdefault(et, [0, -(1 << 62), 0])
            agg[0] += k
            agg[1] = max(agg[1], k)
            agg[2] += 1
        return pd.DataFrame(
            {
                "event_type": list(rows),
                "sum_k": pd.Series([v[0] for v in rows.values()], dtype="int64"),
                "max_k": pd.Series([v[1] for v in rows.values()], dtype="int64"),
                "n": pd.Series([v[2] for v in rows.values()], dtype="int64"),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    for c in ("sum_k", "max_k", "n"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def props_k_stats_sql() -> str:
    return """
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """


# ---------------------------------------------------------------------------
# per-group OLS regression
# ---------------------------------------------------------------------------


def events_value_regression(sf_dir: str) -> pd.DataFrame:
    """Per-type least-squares fit of value_cents on the JSON `k`
    property — distributed OLS via the moment-sum combiner: each batch
    contributes one (n, Sx, Sy, Sxx, Sxy) row per type (all exact
    int64), a type-cardinality groupby sums them, and the closed-form
    slope/intercept finalize quantizes its two float divisions in the
    SQL twin's exact op order. The shape generalizes to any
    sufficient-statistics model (same skeleton as embedding_second_moment)."""
    import json
    import math

    import numpy as np

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value", "props"])

    def moments(t: pa.Table) -> pd.DataFrame:
        y = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()).to_numpy()
        x = np.array([int(json.loads(p)["k"]) for p in t["props"].to_pylist()], dtype=np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(), "x": x, "y": y})
        rows = []
        for et, g in df.groupby("event_type"):
            gx, gy = g["x"].to_numpy(), g["y"].to_numpy()
            rows.append(
                (et, len(g), int(gx.sum()), int(gy.sum()), int((gx * gx).sum()), int((gx * gy).sum()))
            )
        return pd.DataFrame(
            rows, columns=["event_type", "n", "sx", "sy", "sxx", "sxy"]
        ).astype({c: "int64" for c in ("n", "sx", "sy", "sxx", "sxy")})

    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
    )
    out_rows = []
    for r in m.itertuples():
        n, sx, sy, sxx, sxy = int(r.n), int(r.sx), int(r.sy), int(r.sxx), int(r.sxy)
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        out_rows.append(
            (
                r.event_type,
                int(math.floor(slope * 1e6 + 0.5)),
                int(math.floor((float(sy) - slope * sx) / n * 1e2 + 0.5)),
            )
        )
    out = pd.DataFrame(out_rows, columns=["event_type", "slope_micro", "intercept_hundredths"])
    for c in ("slope_micro", "intercept_hundredths"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def events_value_regression_sql() -> str:
    return """
        WITH v AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS y,
                          CAST(json_extract_string(props, '$.k') AS BIGINT) AS x
                   FROM events),
        m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
              FROM v GROUP BY event_type)
        SELECT event_type,
               CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
                 AS slope_micro,
               CAST(floor((CAST(sy AS DOUBLE)
                           - (CAST(n * sxy - sx * sy AS DOUBLE)
                              / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n * 1e2 + 0.5)
                    AS BIGINT) AS intercept_hundredths
        FROM m ORDER BY event_type
    """


# ---------------------------------------------------------------------------
# exact global median by iterative histogram refinement
# ---------------------------------------------------------------------------


def global_exact_median(sf_dir: str, n_buckets: int = 1024) -> pd.DataFrame:
    """EXACT global median of value_cents without a global sort and
    without ever collecting values: the classical distributed selection
    algorithm. Pass 1 finds (min, max, count); each refinement pass
    histograms the corpus into n_buckets equal-width integer ranges
    (per-batch combiner -> one tiny vector per block), the driver walks
    the O(n_buckets) counts to locate the bucket containing the target
    rank, and the range narrows geometrically — ceil(log_B(range))
    streaming passes total (2 for cent-scale data), each an
    embarrassingly parallel scan. Matches DuckDB quantile_disc(0.5)
    exactly (rank = ceil(n/2), 1-based)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"c": _cents(t["value"])})

    base = ds.map_batches(cents, batch_format="pyarrow")

    from ray.data.aggregate import Count, Max, Min

    stats = base.aggregate(Min("c"), Max("c"), Count())
    lo, hi, n = int(stats["min(c)"]), int(stats["max(c)"]), int(stats["count()"])
    rank = max(1, int(np.ceil(0.5 * n)))  # quantile_disc 0.5, 1-based

    while hi - lo + 1 > n_buckets:
        width = (hi - lo + n_buckets) // n_buckets  # ceil division

        def hist(t: pa.Table, lo=lo, width=width) -> pd.DataFrame:
            c = t["c"].to_numpy()
            c = c[(c >= lo) & (c <= hi)]
            idx = (c - lo) // width
            counts = np.bincount(idx, minlength=n_buckets).astype(np.int64)
            return pd.DataFrame({"bucket": np.arange(n_buckets, dtype=np.int64), "cnt": counts})

        from ray.data.aggregate import Sum

        # also count values below lo that fell out of range in earlier
        # passes — they are already accounted in `rank` adjustment below
        hdf = (
            base.map_batches(hist, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
            .sort_values("bucket")
        )
        counts = np.zeros(n_buckets, dtype=np.int64)
        counts[hdf["bucket"].to_numpy()] = hdf["cnt"].to_numpy()
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, rank))
        rank -= int(cum[b - 1]) if b > 0 else 0
        lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)

    # final pass: exact per-value counts over the narrowed range
    def exact(t: pa.Table, lo=lo, hi=hi) -> pd.DataFrame:
        c = t["c"].to_numpy()
        c = c[(c >= lo) & (c <= hi)]
        counts = np.bincount(c - lo, minlength=hi - lo + 1).astype(np.int64)
        return pd.DataFrame(
            {"v": np.arange(lo, hi + 1, dtype=np.int64), "cnt": counts}
        )

    from ray.data.aggregate import Sum

    vdf = (
        base.map_batches(exact, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("v")
    )
    cum = np.cumsum(vdf["cnt"].to_numpy())
    med = int(vdf["v"].to_numpy()[int(np.searchsorted(cum, rank))])
    return pd.DataFrame({"median_cents": pd.Series([med], dtype="int64")})


def global_exact_median_sql() -> str:
    return """
        SELECT quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.5) AS median_cents
        FROM events
    """


# ---------------------------------------------------------------------------
# Gini coefficient of per-user activity
# ---------------------------------------------------------------------------


def user_activity_gini(sf_dir: str) -> pd.DataFrame:
    """Inequality of the per-user event-count distribution — the skew
    diagnostic that tells a pipeline whether its groupby keys need
    salting. Gini = (2*sum(i*c_i) - (n+1)*sum(c_i)) / (n*sum(c_i)) over
    counts sorted ascending (1-based ranks, ties broken by user_id to
    match the SQL row_number). The distributed part is the per-user
    count groupby; the count table is user-cardinality-sized (the
    docstring's 100-TB variant sorts it with ds.sort and computes rank
    sums via the two-phase prefix scan rather than on the driver)."""
    import math

    import numpy as np

    from ray.data.aggregate import Count

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .groupby("user_id")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    counts = counts.sort_values(["cnt", "user_id"], kind="mergesort").reset_index(drop=True)
    c = counts["cnt"].to_numpy().astype("int64")
    n = len(c)
    tot = int(c.sum())
    wsum = int((c * (1 + np.arange(n, dtype=np.int64))).sum())
    gini = float(2 * wsum - (n + 1) * tot) / (float(n) * tot)
    return pd.DataFrame(
        {"gini_nano": pd.Series([int(math.floor(gini * 1e9 + 0.5))], dtype="int64")}
    )


def user_activity_gini_sql() -> str:
    return """
        WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM events GROUP BY user_id),
        r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS i FROM c),
        s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS tot,
                     CAST(SUM(i * cnt) AS BIGINT) AS wsum FROM r)
        SELECT CAST(floor(CAST(2 * wsum - (n + 1) * tot AS DOUBLE)
                          / (CAST(n AS DOUBLE) * tot) * 1e9 + 0.5) AS BIGINT) AS gini_nano
        FROM s
    """


# ---------------------------------------------------------------------------
# timed conversion funnel (event-sequence matching)
# ---------------------------------------------------------------------------


def funnel_within_hour(sf_dir: str, window_us: int = 3_600_000_000) -> pd.DataFrame:
    """Per user, the number of signup events followed by a purchase
    within the hour — the MATCH_RECOGNIZE/CEP-style timed-sequence
    pattern. One user-keyed shuffle; inside each group a searchsorted
    two-pointer matches every signup against the purchase timeline (no
    per-pair loop, no self-join blow-up)."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(
            t["event_type"], value_set=pa.array(["signup", "purchase"])
        )
        t = t.filter(mask)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    def match(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sort(g.loc[g["event_type"] == "signup", "ts_us"].to_numpy())
        p = np.sort(g.loc[g["event_type"] == "purchase", "ts_us"].to_numpy())
        if len(s) == 0 or len(p) == 0:
            return pd.DataFrame({"user_id": [], "n_converted": []})
        # signup converts iff some purchase in (ts, ts + window]
        lo = np.searchsorted(p, s, side="right")
        hi = np.searchsorted(p, s + window_us, side="right")
        n = int((hi > lo).sum())
        if n == 0:
            return pd.DataFrame({"user_id": [], "n_converted": []})
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_converted": [n]}
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(match, batch_format="pandas")
        .to_pandas()
    )
    for c in ("user_id", "n_converted"):
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def funnel_within_hour_sql(window_us: int = 3_600_000_000) -> str:
    return f"""
        SELECT s.user_id, CAST(COUNT(*) AS BIGINT) AS n_converted
        FROM events s
        WHERE s.event_type = 'signup' AND EXISTS (
          SELECT 1 FROM events p
          WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
            AND p.ts > s.ts AND epoch_us(p.ts) - epoch_us(s.ts) <= {window_us})
        GROUP BY s.user_id
        ORDER BY s.user_id
    """


# ---------------------------------------------------------------------------
# table profiling
# ---------------------------------------------------------------------------


def events_table_profile(sf_dir: str) -> pd.DataFrame:
    """Column-profile pass (the data-quality dashboard op): row count,
    null count, EXACT distinct count, min, max for the profiled
    columns. Scalar stats come from one streaming combiner; the exact
    distinct counts are value-keyed groupbys (fine for these
    cardinalities; hll_distinct_users is the unbounded-cardinality
    stand-in). Values are profiled in integer cents."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t["user_id"], "value_cents": _cents(t["value"])}
        )

    base = ds.map_batches(prep, batch_format="pyarrow")

    def partial(t: pa.Table) -> pd.DataFrame:
        import numpy as np

        i64 = np.iinfo(np.int64)
        rows = []
        for col in ("user_id", "value_cents"):
            v = t[col].to_numpy(zero_copy_only=False)
            nulls = int(pd.isna(v).sum())
            ok = v[~pd.isna(v)]
            # identity sentinels for empty/all-null batches so the
            # global Min/Max ignore them (0 would corrupt a corpus
            # whose true min is positive or true max negative)
            rows.append(
                (
                    col,
                    len(v),
                    nulls,
                    int(ok.min()) if len(ok) else i64.max,
                    int(ok.max()) if len(ok) else i64.min,
                )
            )
        return pd.DataFrame(
            rows, columns=["col", "n", "nulls", "min_v", "max_v"]
        ).astype({"n": "int64", "nulls": "int64", "min_v": "int64", "max_v": "int64"})

    from ray.data.aggregate import Max, Min, Sum

    stats = (
        base.map_batches(partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("nulls", alias_name="nulls"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
        .to_pandas()
    )

    # exact distinct per column: value-keyed groupby, count the groups
    # (nulls dropped first — SQL's COUNT(DISTINCT col) excludes them,
    # and Ray's groupby would otherwise key a null group)
    def col_distinct(col: str) -> int:
        def drop_nulls(t: pa.Table) -> pa.Table:
            return pa.table({col: pc.drop_null(t[col])})

        return (
            base.select_columns([col])
            .map_batches(drop_nulls, batch_format="pyarrow")
            .groupby(col)
            .aggregate(Count(alias_name="_n"))
            .count()
        )

    nd = {c: col_distinct(c) for c in ("user_id", "value_cents")}
    stats["n_distinct"] = stats["col"].map(nd).astype("int64")
    for c in ("n", "nulls", "min_v", "max_v"):
        stats[c] = stats[c].astype("int64")
    cols = ["col", "n", "nulls", "n_distinct", "min_v", "max_v"]
    return stats[cols].sort_values("col").reset_index(drop=True)


def events_table_profile_sql() -> str:
    return """
        SELECT * FROM (
          SELECT 'user_id' AS col, COUNT(*) AS n,
                 COUNT(*) - COUNT(user_id) AS nulls,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct,
                 CAST(MIN(user_id) AS BIGINT) AS min_v,
                 CAST(MAX(user_id) AS BIGINT) AS max_v
          FROM events
          UNION ALL
          SELECT 'value_cents', COUNT(*), COUNT(*) - COUNT(value),
                 CAST(COUNT(DISTINCT CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT),
                 CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT),
                 CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
          FROM events
        ) ORDER BY col
    """


# ---------------------------------------------------------------------------
# cohort retention matrix
# ---------------------------------------------------------------------------


_DAY_US = 86_400_000_000


def cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Classic cohort-retention analysis: users are cohorted by the
    epoch day of their first event; each (cohort_day, days_since) cell
    counts the distinct cohort users active that day. (Day grain
    because the events fixture spans a single month — at month grain
    the matrix would be one cell.)

    ONE user-keyed exchange: per user group, the first day and the
    distinct active days are both local facts, so
    groupby(user_id).map_groups emits that user's retention cells
    directly — no self-join of the events table, and the second
    groupby runs over cell-cardinality rows (cohorts x days, tiny).

    (A two-aggregate + Dataset.join formulation also works on paper,
    but blocks downstream of a multi-key hash aggregate can reach
    Dataset.join with schemaless empty partitions in ray 2.49 — the
    map_groups shape is both safer and one exchange cheaper.)"""
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), _DAY_US)
        return pa.table({"user_id": t["user_id"], "day": day})

    def user_cells(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        days = np.unique(g["day"].to_numpy())
        return pd.DataFrame(
            {
                "cohort_day": pd.Series(np.full(len(days), days[0]), dtype="int64"),
                "days_since": pd.Series(days - days[0], dtype="int64"),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(user_cells, batch_format="pandas")
        .groupby(["cohort_day", "days_since"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    for c in ("cohort_day", "days_since", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["cohort_day", "days_since"]).reset_index(drop=True)


def cohort_retention_sql() -> str:
    return f"""
        WITH um AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // {_DAY_US} AS day
                    FROM events),
        fu AS (SELECT user_id, MIN(day) AS cohort_day FROM um GROUP BY user_id)
        SELECT fu.cohort_day, um.day - fu.cohort_day AS days_since,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM um JOIN fu USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# global rank transform (percentile normalization)
# ---------------------------------------------------------------------------


def events_value_rank_normalize(sf_dir: str, k: int = 500) -> pd.DataFrame:
    """Global PERCENT_RANK transform of the value column — percentile
    feature normalization. A global window function needs a total
    order, but NOT a global sort: value is cents-quantized into a
    BOUNDED domain, so one groupby(value_cents) count pass reduces the
    corpus to a domain-sized frequency table; the driver turns it into
    a cumulative "rows strictly below v" map, broadcasts it once, and
    a second streaming pass assigns every row
    pr = cum_below / (N - 1) — the exact PERCENT_RANK with ties, one
    small exchange + one zero-shuffle scan regardless of corpus size.
    Returns the first k rows by event_id (full transform is
    corpus-sized; the slice keeps the oracle compare bounded)."""
    import numpy as np

    import ray as _ray
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"], "value_cents": _cents(t["value"])})

    base = ds.map_batches(prep, batch_format="pyarrow")
    freq = (
        base.groupby("value_cents")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("value_cents")
    )
    n_total = int(freq["n"].sum())
    cum_below = np.concatenate([[0], np.cumsum(freq["n"].to_numpy())[:-1]])
    lut_ref = _ray.put(
        (freq["value_cents"].to_numpy(np.int64), cum_below.astype(np.int64), n_total)
    )

    class Rank:
        def __init__(self):
            self.vals, self.below, self.n = _ray.get(lut_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vc = t["value_cents"].to_numpy()
            pos = np.searchsorted(self.vals, vc)
            pr = self.below[pos] / (self.n - 1)
            return pa.table(
                {
                    "event_id": t["event_id"],
                    "value_cents": t["value_cents"],
                    "pr": pa.array(pr, pa.float64()),
                }
            )

    out = (
        base.map_batches(Rank, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .sort_values("event_id")
        .head(k)
        .reset_index(drop=True)
    )
    out["event_id"] = out["event_id"].astype("int64")
    out["value_cents"] = out["value_cents"].astype("int64")
    return out


def events_value_rank_normalize_sql(k: int = 500) -> str:
    return f"""
        SELECT event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
               PERCENT_RANK() OVER (ORDER BY CAST(ROUND(value * 100) AS BIGINT))
                   AS pr
        FROM events
        ORDER BY event_id LIMIT {k}
    """


# ---------------------------------------------------------------------------
# behavioral sequence mining (event-type trigrams)
# ---------------------------------------------------------------------------


def user_event_trigrams(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k most common per-user event-type trigrams — the behavioral
    n-gram miner (what follows what). One user-keyed exchange orders
    each user's stream; consecutive type triples are counted with a
    per-group combiner, and the tiny trigram vocabulary (|types|^3)
    reduces through a coarse-shard map_groups (not a hash aggregate —
    see supplier_butterflies' measured note) before the driver top-k.
    Ordering ties pinned to (ts, event_id) like the SQL window."""
    from collections import Counter

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "event_id"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_id": t["event_id"],
            }
        )

    def grams_of_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        et = g["event_type"].tolist()
        c = Counter(
            f"{a}>{b}>{d}" for a, b, d in zip(et, et[1:], et[2:])
        )
        if not c:
            return pd.DataFrame(
                {
                    "trigram": pd.Series([], dtype="object"),
                    "n_part": pd.Series([], dtype="int64"),
                    "tshard": pd.Series([], dtype="int32"),
                }
            )
        import hashlib

        keys = list(c.keys())
        return pd.DataFrame(
            {
                "trigram": keys,
                "n_part": pd.Series(list(c.values()), dtype="int64"),
                # deterministic shard (python hash() is process-salted,
                # which would split a trigram across shards)
                "tshard": pd.Series(
                    [int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % 8 for s in keys],
                    dtype="int32",
                ),
            }
        )

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("trigram", sort=False)["n_part"].sum()
        return pd.DataFrame(
            {"trigram": s.index, "n": pd.Series(s.to_numpy(), dtype="int64")}
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(grams_of_user, batch_format="pandas")
        .groupby("tshard")
        .map_groups(reduce_shard, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values(["n", "trigram"], ascending=[False, True], kind="mergesort")
    out["n"] = out["n"].astype("int64")
    return out.head(k).reset_index(drop=True)


def user_event_trigrams_sql(k: int = 20) -> str:
    return f"""
        WITH o AS (
          SELECT event_type AS e1,
                 LEAD(event_type) OVER w AS e2,
                 LEAD(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT e1 || '>' || e2 || '>' || e3 AS trigram,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM o WHERE e3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, trigram LIMIT {k}
    """


# ---------------------------------------------------------------------------
# gaps-and-islands: per-user active-time coverage
# ---------------------------------------------------------------------------


def user_active_time(sf_dir: str, window_us: int = 300_000_000) -> pd.DataFrame:
    """Interval-union coverage (the classic gaps-and-islands problem):
    each event opens a 5-minute activity window; overlapping windows
    merge into islands, and per user we report the number of islands
    and total covered microseconds. One user-keyed exchange; inside
    each group the island starts are a vectorized LAG comparison
    (prev_end < start), no per-interval loop."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t["user_id"], "ts_us": pc.cast(t["ts"], pa.int64())}
        )

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sort(g["ts_us"].to_numpy())
        e = s + window_us
        # an island starts where this interval begins after the running
        # max end of everything before it
        prev_end = np.maximum.accumulate(e)[:-1]
        starts = np.r_[True, s[1:] > prev_end]
        idx = np.flatnonzero(starts)
        ends = np.r_[idx[1:], len(s)]
        # e = s + constant is sorted, so each island's max end is its
        # last element — the reduction is one vectorized subtraction
        covered = int((e[ends - 1] - s[idx]).sum())
        return pd.DataFrame(
            {
                "user_id": pd.Series([int(g["user_id"].iloc[0])], dtype="int64"),
                "n_islands": pd.Series([len(idx)], dtype="int64"),
                "active_us": pd.Series([covered], dtype="int64"),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(islands, batch_format="pandas")
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def user_active_time_sql(window_us: int = 300_000_000) -> str:
    return f"""
        WITH iv AS (
          SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {window_us} AS e
          FROM events
        ), marked AS (
          SELECT user_id, s, e,
                 CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      OR ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY s, e) = 1
                      THEN 1 ELSE 0 END AS new_island
          FROM iv
        ), grp AS (
          SELECT user_id, s, e,
                 SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e) AS island
          FROM marked
        ), agg AS (
          SELECT user_id, island, MAX(e) - MIN(s) AS span
          FROM grp GROUP BY user_id, island
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(span) AS BIGINT) AS active_us
        FROM agg GROUP BY user_id ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# referential-integrity profiling
# ---------------------------------------------------------------------------


def orders_fk_profile(sf_dir: str) -> pd.DataFrame:
    """FK health check between lineitem.l_orderkey and
    orders.o_orderkey: distinct keys on each side, matched keys, and
    orphans in both directions. The FULL OUTER JOIN shape without a
    join: each side reduces to distinct keys with a presence bit
    (per-batch unique combiner), one key-shard map_groups merges the
    bits, and a second tiny groupby rolls the four counters up — key
    rows cross the exchange once, facts never do."""
    import numpy as np

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    def keys_of(col: str, side: int):
        def f(t: pa.Table) -> pa.Table:
            u = np.unique(t[col].to_numpy())
            return pa.table(
                {
                    "key": pa.array(u, pa.int64()),
                    "side": pa.array(np.full(len(u), side, np.int8()), pa.int8()),
                    "kshard": pa.array((u % 32).astype(np.int32), pa.int32()),
                }
            )

        return f

    def merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized classify: per key, min/max of the side bit —
        # min==0 & max==1 -> both; otherwise the single side
        mm = g.groupby("key")["side"].agg(["min", "max"])
        both = int(((mm["min"] == 0) & (mm["max"] == 1)).sum())
        left = int((mm["max"] == 0).sum())
        right = int((mm["min"] == 1).sum())
        return pd.DataFrame(
            {
                "n_left_only": pd.Series([left], dtype="int64"),
                "n_right_only": pd.Series([right], dtype="int64"),
                "n_matched": pd.Series([both], dtype="int64"),
            }
        )

    parts = (
        li.map_batches(keys_of("l_orderkey", 0), batch_format="pyarrow")
        .union(od.map_batches(keys_of("o_orderkey", 1), batch_format="pyarrow"))
        .groupby("kshard")
        .map_groups(merge_shard, batch_format="pandas")
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "n_lineitem_orphan_keys": pd.Series([int(parts["n_left_only"].sum())], dtype="int64"),
            "n_orders_without_lineitems": pd.Series([int(parts["n_right_only"].sum())], dtype="int64"),
            "n_matched_keys": pd.Series([int(parts["n_matched"].sum())], dtype="int64"),
        }
    )
    return out


def orders_fk_profile_sql() -> str:
    return """
        WITH l AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
        o AS (SELECT DISTINCT o_orderkey AS key FROM orders)
        SELECT CAST(COUNT(*) FILTER (WHERE o.key IS NULL) AS BIGINT)
                   AS n_lineitem_orphan_keys,
               CAST(COUNT(*) FILTER (WHERE l.key IS NULL) AS BIGINT)
                   AS n_orders_without_lineitems,
               CAST(COUNT(*) FILTER (WHERE l.key IS NOT NULL AND o.key IS NOT NULL)
                    AS BIGINT) AS n_matched_keys
        FROM l FULL OUTER JOIN o ON l.key = o.key
    """


# ---------------------------------------------------------------------------
# frequent itemset mining (pairwise co-occurrence with support)
# ---------------------------------------------------------------------------


def user_type_itemsets(sf_dir: str, min_support: int = 2) -> pd.DataFrame:
    """Frequent event-type PAIRS by user support (the A-priori level-2
    pass of market-basket mining): a user's basket is their distinct
    event types; a pair's support is how many baskets contain both.
    One user-keyed exchange builds baskets and emits each basket's
    C(k,2) pairs (the item domain is tiny, so per-basket fan-out is
    bounded); a deterministic pair-shard map_groups sums supports."""
    from itertools import combinations

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    def basket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        items = sorted(set(g["event_type"]))
        pairs = [f"{a}|{b}" for a, b in combinations(items, 2)]
        return pd.DataFrame(
            {
                "pair": pd.Series(pairs, dtype="object"),
                "pshard": pd.Series(
                    [int(hashlib.md5(p.encode()).hexdigest()[:4], 16) % 8 for p in pairs],
                    dtype="int32",
                ),
            }
        )

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", sort=False).size()
        s = s[s >= min_support]
        return pd.DataFrame(
            {"pair": s.index, "support": pd.Series(s.to_numpy(), dtype="int64")}
        )

    out = (
        ds.groupby("user_id")
        .map_groups(basket_pairs, batch_format="pandas")
        .groupby("pshard")
        .map_groups(reduce_shard, batch_format="pandas")
        .to_pandas()
    )
    out["support"] = out["support"].astype("int64")
    return out.sort_values(["support", "pair"], ascending=[False, True], kind="mergesort").reset_index(
        drop=True
    )


def user_type_itemsets_sql(min_support: int = 2) -> str:
    return f"""
        WITH b AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type || '|' || c.event_type AS pair,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM b a JOIN b c ON a.user_id = c.user_id AND a.event_type < c.event_type
        GROUP BY 1 HAVING COUNT(*) >= {min_support}
        ORDER BY support DESC, pair
    """


def local_supplier_revenue(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """TPC-H Q5 shape: revenue per nation from lineitems where the
    ordering customer and the supplier sit in the SAME nation of one
    region, over a one-year order window.

    Distributed shape (the canonical multiway-join plan):
      - dimension chain nation x region is pre-joined driver-side and
        broadcast (O(25) rows);
      - supplier -> nationkey and customer -> nationkey are broadcast
        maps attached inside map_batches (inner join drops non-region
        rows BEFORE any exchange; at 10^12-row scale a customer dim
        past worker heap would take the hash-partitioned join path of
        order_priority_revenue instead);
      - the only all-to-all is the big x big lineitem x orders
        hash-partitioned Dataset.join on orderkey, with BOTH sides
        pre-filtered (date window / region membership) so the exchange
        moves a fraction of either table;
      - the c_nationkey = s_nationkey colocation predicate is applied
        post-join, then a tiny groupby(n_name) finishes.
    Revenue is quantized per row in the same float-op order as the SQL
    twin (see lineitem_discounted_revenue) so integer sums match."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    dim = nation.join(region, keys="n_regionkey", right_keys="r_regionkey")
    dim = dim.filter(pc.equal(dim["r_name"], "ASIA"))
    region_nations = dict(
        zip(dim["n_nationkey"].to_pylist(), dim["n_name"].to_pylist())
    )

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(supp["s_nationkey"], pa.array(list(region_nations), pa.int32())))
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"], pa.array(list(region_nations), pa.int32())))
    supp_ref = ray.put(supp)
    cust_ref = ray.put(cust)

    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")

    # task-pool stages (not actor pools): the broadcast dim is fetched
    # per call via fn_kwargs — a zero-copy plasma read — so the join's
    # hash-shuffle aggregators never compete with reserved actor slots
    def prep_lineitem(t: pa.Table, *, supp_ref) -> pa.Table:
        supp = ray.get(supp_ref)
        disc = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        left = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "disc_cents": pc.cast(
                    pc.round(disc, round_mode="half_towards_infinity"), pa.int64()
                ),
            }
        )
        j = left.join(supp, keys="l_suppkey", right_keys="s_suppkey", join_type="inner")
        return j.select(["l_orderkey", "s_nationkey", "disc_cents"])

    def prep_orders(t: pa.Table, *, cust_ref) -> pa.Table:
        cust = ray.get(cust_ref)
        mask = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo, type=pa.timestamp("us"))),
            pc.less(t["o_orderdate"], pa.scalar(hi, type=pa.timestamp("us"))),
        )
        t = t.filter(mask)
        j = t.join(cust, keys="o_custkey", right_keys="c_custkey", join_type="inner")
        return j.select(["o_orderkey", "c_nationkey"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(prep_lineitem, batch_format="pyarrow", fn_kwargs={"supp_ref": supp_ref})
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow", fn_kwargs={"cust_ref": cust_ref})

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    names_ref = ray.put(region_nations)

    def finish(t: pa.Table, *, names_ref) -> pa.Table:
        names = ray.get(names_ref)
        t = t.filter(
            pc.equal(
                pc.cast(t["s_nationkey"], pa.int32()),
                pc.cast(t["c_nationkey"], pa.int32()),
            )
        )
        nk = t["s_nationkey"].to_pylist()
        return pa.table(
            {
                "n_name": pa.array([names[int(k)] for k in nk], pa.string()),
                "disc_cents": t["disc_cents"],
            }
        )

    out = (
        joined.map_batches(finish, batch_format="pyarrow", fn_kwargs={"names_ref": names_ref})
        .groupby("n_name")
        .aggregate(Sum("disc_cents", alias_name="revenue_cents"), Count(alias_name="n_items"))
        .to_pandas()
    )
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


def local_supplier_revenue_sql() -> str:
    return """
        SELECT n.n_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_items
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND c.c_nationkey = s.s_nationkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
        ORDER BY n.n_name
    """


def events_rolling_peak(sf_dir: str, frame_rows: int = 5) -> pd.DataFrame:
    """ROWS-frame sliding extrema: per user in (ts, event_id) order, the
    max and min of `value` over the current row and the 4 preceding
    rows (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW). Extrema are
    order-independent, so doubles hash-match the SQL twin exactly
    (unlike a moving average, whose float summation order differs).

    Distributed shape: one key-partitioned shuffle (groupby user_id),
    then a vectorized pandas rolling min/max inside each group — the
    frame never crosses the partition key, so no inter-group state."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        r = g["value"].rolling(frame_rows, min_periods=1)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "rolling_peak": r.max(),
                "rolling_floor": r.min(),
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def events_rolling_peak_sql(frame_rows: int = 5) -> str:
    return f"""
        SELECT event_id,
               MAX(value) OVER w AS rolling_peak,
               MIN(value) OVER w AS rolling_floor
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {frame_rows - 1} PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """


def concurrent_sessions_daily_peak(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Interval sweep-line over the sessionized event log: per calendar
    day, the peak number of simultaneously-open sessions (a session is
    open on [session_start, session_end] inclusive).

    Distributed shape (composition of two engine primitives):
      1. sessions stay a Dataset — groupby(user_id).map_groups emits
         one +1 point at session_start and one -1 point at session_end
         per session (text/state never leaves the group);
      2. the global running concurrency is the keyless two-phase prefix
         scan of running_global_total, bucketed BY DAY: a tiny
         groupby(day) sum of deltas up-sweeps, the driver takes an
         exclusive prefix over the ~O(days) counters, and a second
         groupby(day).map_groups down-sweeps the within-day cumsum
         (starts ordered before ends at tied timestamps, matching the
         RANGE semantics of an inclusive interval) and keeps the max.
    The peak at a tied timestamp is reached after all +1s regardless of
    their relative order, so the per-day MAX is deterministic and
    matches the window-function SQL twin."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def add_shard(t: pa.Table) -> pa.Table:
        import numpy as np

        return t.append_column(
            "shard",
            pa.array((t["user_id"].to_numpy() % 64).astype(np.int32), pa.int32()),
        )

    def points_of_shard(g: pd.DataFrame) -> pd.DataFrame:
        # coarse 64-way user shard (users stay whole); session boundary
        # detection fully vectorized across ALL users in the shard —
        # a boundary is a user change OR a gap > gap_minutes
        import numpy as np

        if len(g) == 0:
            return pd.DataFrame(
                {
                    "day": pd.Series([], dtype="datetime64[ns]"),
                    "ts": pd.Series([], dtype="datetime64[ns]"),
                    "delta": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        gap_td = np.timedelta64(gap_minutes * 60_000_000_000, "ns")
        boundary = np.r_[True, (u[1:] != u[:-1]) | (np.diff(ts) > gap_td)]
        starts = np.flatnonzero(boundary)
        ends = np.r_[starts[1:] - 1, len(u) - 1]
        pts_ts = np.concatenate([ts[starts], ts[ends]])
        delta = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)]
        )
        return pd.DataFrame(
            {
                "day": pd.Series(pts_ts.astype("datetime64[D]").astype("datetime64[ns]")),
                "ts": pd.Series(pts_ts),
                "delta": pd.Series(delta, dtype="int64"),
            }
        )

    # materialize: both the up-sweep and the down-sweep consume the
    # points — without this the session detection lineage re-executes
    points = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(points_of_shard, batch_format="pandas")
        .materialize()
    )

    # up-sweep as per-batch partials + a driver fold (O(blocks x days)
    # rows): ray 2.49's hash aggregate measured ~8.6 s for this 30-key
    # Sum over 190k points where the combiner shape takes ~0.3 s
    def day_partials(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["day", "delta"]), "day").aggregate([("delta", "sum")])
        return pa.table({"day": g["day"], "s": g["delta_sum"]})

    day_sums = (
        points.map_batches(day_partials, batch_format="pyarrow")
        .to_pandas()
        .groupby("day", as_index=False)["s"]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    excl = day_sums["s"].cumsum().shift(1, fill_value=0)
    offsets = {pd.Timestamp(d): int(v) for d, v in zip(day_sums["day"], excl)}
    oref = ray.put(offsets)

    def peak_of_day(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref)[pd.Timestamp(g["day"].iloc[0])]
        g = g.sort_values(["ts", "delta"], ascending=[True, False], kind="mergesort")
        conc = g["delta"].cumsum() + off
        return pd.DataFrame(
            {
                "day": [g["day"].iloc[0]],
                "peak_concurrency": pd.Series([int(conc.max())], dtype="int64"),
            }
        )

    out = points.groupby("day").map_groups(peak_of_day, batch_format="pandas").to_pandas()
    out["peak_concurrency"] = out["peak_concurrency"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def concurrent_sessions_daily_peak_sql(gap_minutes: int = 30) -> str:
    return f"""
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM o
        ), sess AS (
            SELECT MIN(ts) AS session_start, MAX(ts) AS session_end
            FROM s GROUP BY user_id, session_id
        ), pts AS (
            SELECT session_start AS ts, 1 AS delta FROM sess
            UNION ALL
            SELECT session_end AS ts, -1 AS delta FROM sess
        ), run AS (
            SELECT ts,
                   SUM(delta) OVER (ORDER BY ts, delta DESC
                                    ROWS UNBOUNDED PRECEDING) AS conc
            FROM pts
        )
        SELECT date_trunc('day', ts) AS day,
               CAST(MAX(conc) AS BIGINT) AS peak_concurrency
        FROM run
        GROUP BY 1
        ORDER BY day
    """


def events_type_daily_uniques(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT user_id) per (event_type, day) — the classic
    distinct-aggregate. Exact distributed shape WITHOUT a two-key
    hash aggregate (slow in ray 2.49 and join-hostile, see the
    cohort_retention note): pack (type, day, user) into one int64,
    per-batch unique (the combiner), shard BY PACKED KEY so each
    triple lands whole, per-shard unique + per-(type,day) partial
    counts; the (type, day) totals are the sum of shard partials —
    O(types x days x shards) rows to the driver."""
    import numpy as np

    type_idx = {t: i for i, t in enumerate(sorted(_EVENT_TYPES))}
    tref = ray.put(type_idx)
    n_types = len(type_idx)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"])

    def keys(t: pa.Table) -> pa.Table:
        ti = ray.get(tref)
        u = t["user_id"].to_numpy().astype(np.int64)
        if len(u) and int(u.max()) >= (1 << 31):
            raise ValueError("user_id exceeds the 31-bit packing bound")
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        tix = np.array([ti[x] for x in t["event_type"].to_pylist()], dtype=np.int64)
        key = np.unique(((days * n_types + tix) << 32) | u)
        return pa.table({"key": pa.array(key, pa.int64())})

    def count_partials(t: pa.Table) -> pa.Table:
        # keys are globally distinct after shard_distinct, so per-batch
        # group counts are additive partials
        import numpy as np

        grp = t["key"].to_numpy() >> 32  # (day * n_types + tix)
        ug, cnt = np.unique(grp, return_counts=True)
        return pa.table(
            {"grp": pa.array(ug, pa.int64()), "n_part": pa.array(cnt, pa.int64())}
        )

    from pdfrust_ray.stages.shard import shard_distinct

    parts = (
        shard_distinct(ds.map_batches(keys, batch_format="pyarrow"))
        .map_batches(count_partials, batch_format="pyarrow")
        .to_pandas()
    )
    tot = parts.groupby("grp")["n_part"].sum()
    grp = tot.index.to_numpy()
    inv = {i: t for t, i in type_idx.items()}
    out = pd.DataFrame(
        {
            "event_type": [inv[int(g % n_types)] for g in grp],
            "day": pd.to_datetime((grp // n_types).astype("int64"), unit="D"),
            "n_unique_users": pd.Series(tot.to_numpy(), dtype="int64"),
        }
    )
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def events_type_daily_uniques_sql() -> str:
    return """
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_unique_users
        FROM events
        GROUP BY 1, 2
        ORDER BY event_type, day
    """


def events_value_equidepth(sf_dir: str, n_buckets: int = 10) -> pd.DataFrame:
    """Equi-depth histogram boundaries of the value column (the decile
    cut points a cost-based optimizer or feature binner keeps). A
    global quantile needs a total order but NOT a global sort: one
    groupby(value) count pass reduces the corpus to a domain-sized
    frequency table (value is cent-quantized at the source, so the
    domain is bounded — the events_value_rank_normalize precedent), and
    the driver picks the value at rank floor((N-1) * q / n_buckets)
    from the cumulative counts. Boundaries are ACTUAL data values
    (doubles compared bit-for-bit, no interpolation arithmetic)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    freq = (
        ds.groupby("value")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("value")
        .reset_index(drop=True)
    )
    n_total = int(freq["n"].sum())
    cum = np.cumsum(freq["n"].to_numpy())
    qs = np.arange(1, n_buckets)
    ranks = (n_total - 1) * qs // n_buckets  # 0-based rank of the boundary
    idx = np.searchsorted(cum, ranks + 1)  # first value whose cum covers rank
    return pd.DataFrame(
        {
            "q": pd.Series(qs, dtype="int64"),
            "boundary": freq["value"].to_numpy()[idx],
        }
    )


def events_value_equidepth_sql(n_buckets: int = 10) -> str:
    return f"""
        WITH ord AS (
            SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn FROM events
        ), n AS (SELECT COUNT(*) AS c FROM events),
        qs AS (SELECT unnest(range(1, {n_buckets})) AS q)
        SELECT qs.q AS q, ord.value AS boundary
        FROM qs
        CROSS JOIN n
        JOIN ord ON ord.rn = (n.c - 1) * qs.q // {n_buckets} + 1
        ORDER BY q
    """


def events_hourly_csv(sf_dir: str) -> pd.DataFrame:
    """events_hourly computed through the CSV ingest path
    (sources/tabular.py) instead of parquet — the source-format parity
    query: identical result, identical SQL oracle, proving the engine's
    operators are source-agnostic once the canonical Arrow schema is
    established at the read."""
    from pdfrust_ray.sources.tabular import read_events_csv

    ds = read_events_csv(sf_dir).select_columns(["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "value_cents": _cents(t["value"]),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents"))
        .to_pandas()
    )
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def events_table_checksum(sf_dir: str) -> pd.DataFrame:
    """Order-independent table integrity checksum — the cheap invariant
    a migration / backfill / replication job verifies before swapping a
    table pointer. Every row hashes to md5-prefix-u32 of its canonical
    'event_id|user_id|event_type' string; the checksum is the plain
    int64 SUM of row hashes, so it is commutative, mergeable across
    blocks, and independent of block order or partitioning. Zero
    shuffle: per-batch partial (n, sum) pairs, one tiny driver fold."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        from pdfrust_ray.functions.md5vec import md5_prefix_u32

        keys = [
            f"{e}|{u}|{ty}".encode()
            for e, u, ty in zip(
                t["event_id"].to_pylist(),
                t["user_id"].to_pylist(),
                t["event_type"].to_pylist(),
            )
        ]
        h = md5_prefix_u32(keys).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(keys)], pa.int64()),
                "s": pa.array([int(h.sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "n_rows": pd.Series([int(parts["n"].sum())], dtype="int64"),
            "checksum": pd.Series([int(parts["s"].sum())], dtype="int64"),
        }
    )


def events_table_checksum_sql() -> str:
    return """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(
                        CAST(event_id AS VARCHAR) || '|' ||
                        CAST(user_id AS VARCHAR) || '|' || event_type), 1, 8))
                    AS UBIGINT)) AS BIGINT) AS checksum
        FROM events
    """


def rolling_wau(sf_dir: str, window_days: int = 7) -> pd.DataFrame:
    """Rolling 7-day distinct active users per day (the WAU curve) —
    windowed COUNT DISTINCT, which no window function computes
    directly. Exact distributed shape: distinct (day, user) pairs via
    packed-key sharding, then each activity day FANS OUT to the <= 7
    target days it can serve (plus a sentinel marking the day as
    observed), a second packed-key distinct collapses multi-day users
    per target, and per-shard partial counts fold on the driver.
    Exchanges carry (distinct pairs x window) keys — never raw events
    — and the fan-out factor is the window length, not the corpus."""
    import numpy as np

    SENTINEL = (1 << 32) - 1  # marks "target day == an observed activity day"

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def keys(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.int64)
        if len(u) and int(u.max()) >= (1 << 31):
            raise ValueError("user_id exceeds the 31-bit packing bound")
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        key = np.unique((days << 32) | u)
        return pa.table({"key": pa.array(key, pa.int64())})

    def fanout(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        d = key >> 32
        u = key & ((1 << 32) - 1)
        outs = [((d + off) << 32) | u for off in range(window_days)]
        outs.append((d << 32) | SENTINEL)  # observed-day markers
        return pa.table({"key": pa.array(np.unique(np.concatenate(outs)), pa.int64())})

    def count_partials(t: pa.Table) -> pa.Table:
        # keys globally distinct after the second shard_distinct
        key = t["key"].to_numpy()
        d = key >> 32
        u = key & ((1 << 32) - 1)
        sent = u == SENTINEL
        ud, cnt = np.unique(d[~sent], return_counts=True)
        return pa.table(
            {
                "day_idx": pa.array(np.concatenate([ud, d[sent]]), pa.int64()),
                "n_part": pa.array(
                    np.concatenate([cnt, np.zeros(int(sent.sum()), np.int64)]), pa.int64()
                ),
                "observed": pa.array(
                    np.concatenate([np.zeros(len(ud), bool), np.ones(int(sent.sum()), bool)])
                ),
            }
        )

    from pdfrust_ray.stages.shard import shard_distinct

    parts = (
        shard_distinct(
            shard_distinct(ds.map_batches(keys, batch_format="pyarrow"))
            .map_batches(fanout, batch_format="pyarrow")
        )
        .map_batches(count_partials, batch_format="pyarrow")
        .to_pandas()
    )
    counts = parts.groupby("day_idx")["n_part"].sum()
    observed = set(parts.loc[parts["observed"], "day_idx"].astype(int))
    days = sorted(observed)
    return pd.DataFrame(
        {
            "day": pd.to_datetime(pd.Series(days, dtype="int64"), unit="D"),
            "wau": pd.Series([int(counts.get(d, 0)) for d in days], dtype="int64"),
        }
    )


def rolling_wau_sql(window_days: int = 7) -> str:
    return f"""
        WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        days AS (SELECT DISTINCT d FROM ud)
        SELECT days.d AS day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
        FROM days JOIN ud
          ON ud.d <= days.d AND ud.d > days.d - INTERVAL {window_days} DAY
        GROUP BY 1
        ORDER BY day
    """


def funnel_three_step(sf_dir: str, window_us: int = 3_600_000_000) -> pd.DataFrame:
    """Three-step strict-order funnel: how many users have a signup, a
    signup followed by a view within the hour, and a full
    signup -> view -> purchase chain (each hop within the hour). The
    chain-existence test is fully vectorized per user: views that lead
    to a purchase are marked by one searchsorted pass, and a prefix-sum
    over good views answers "any good view in (signup, signup+w]" for
    every signup at once — no per-pair loop, no 3-way self-join."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(
            t["event_type"], value_set=pa.array(["signup", "view", "purchase"])
        )
        t = t.filter(mask)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sort(g.loc[g["event_type"] == "signup", "ts_us"].to_numpy())
        if len(s) == 0:
            return pd.DataFrame(
                {"s1": pd.Series([], dtype="int64"),
                 "s2": pd.Series([], dtype="int64"),
                 "s3": pd.Series([], dtype="int64")}
            )
        v = np.sort(g.loc[g["event_type"] == "view", "ts_us"].to_numpy())
        p = np.sort(g.loc[g["event_type"] == "purchase", "ts_us"].to_numpy())
        lo = np.searchsorted(v, s, side="right")
        hi = np.searchsorted(v, s + window_us, side="right")
        s2 = bool((hi > lo).any())
        good = (
            np.searchsorted(p, v + window_us, side="right")
            > np.searchsorted(p, v, side="right")
        ) if len(v) else np.zeros(0, bool)
        cg = np.concatenate([[0], np.cumsum(good.astype(np.int64))])
        s3 = bool(((cg[hi] - cg[lo]) > 0).any())
        return pd.DataFrame(
            {"s1": pd.Series([1], dtype="int64"),
             "s2": pd.Series([int(s2)], dtype="int64"),
             "s3": pd.Series([int(s3)], dtype="int64")}
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(flags, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_signup_users": pd.Series([int(out["s1"].sum())], dtype="int64"),
            "n_reached_view": pd.Series([int(out["s2"].sum())], dtype="int64"),
            "n_reached_purchase": pd.Series([int(out["s3"].sum())], dtype="int64"),
        }
    )


def funnel_three_step_sql(window_us: int = 3_600_000_000) -> str:
    return f"""
        WITH e AS (
            SELECT user_id, event_type, epoch_us(ts) AS t FROM events
            WHERE event_type IN ('signup', 'view', 'purchase')
        ),
        u1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'signup'),
        u2 AS (
            SELECT DISTINCT s.user_id
            FROM e s JOIN e v ON v.user_id = s.user_id AND v.event_type = 'view'
                 AND v.t > s.t AND v.t <= s.t + {window_us}
            WHERE s.event_type = 'signup'
        ),
        u3 AS (
            SELECT DISTINCT s.user_id
            FROM e s
            JOIN e v ON v.user_id = s.user_id AND v.event_type = 'view'
                 AND v.t > s.t AND v.t <= s.t + {window_us}
            JOIN e p ON p.user_id = s.user_id AND p.event_type = 'purchase'
                 AND p.t > v.t AND p.t <= v.t + {window_us}
            WHERE s.event_type = 'signup'
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u1) AS n_signup_users,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM u2) AS n_reached_view,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM u3) AS n_reached_purchase
    """


def top_value_events(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global ORDER BY ... LIMIT k WITHOUT a global sort: each batch
    keeps its local top-k by (value DESC, event_id ASC), so the driver
    merge sees O(blocks x k) rows — the mergeable top-k pattern
    (same family as bottom_k_sample), exact for any total order."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def local_topk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_id": t["event_id"].to_numpy(), "value": t["value"].to_numpy()}
        )
        df = df.sort_values(
            ["value", "event_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(
        ["value", "event_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out["event_id"] = out["event_id"].astype("int64")
    return out.reset_index(drop=True)


def top_value_events_sql(k: int = 20) -> str:
    return f"""
        SELECT event_id, value FROM events
        ORDER BY value DESC, event_id
        LIMIT {k}
    """


def user_gap_stats(sf_dir: str) -> pd.DataFrame:
    """Inter-event gap moments per user — the feature-engineering
    staple (burstiness / regularity). Gaps are whole SECONDS (integer
    floor of the epoch difference), so count / sum / sum-of-squares are
    exact int64 partials (max gap ~2.6e6 s -> squares ~7e12, far from
    overflow) and the SQL twin matches bit-for-bit without float
    summation order ever entering."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy()).astype("datetime64[us]").astype(np.int64)
        gaps = np.diff(ts) // 1_000_000  # whole seconds, floor
        return pd.DataFrame(
            {
                "user_id": pd.Series([int(g["user_id"].iloc[0])], dtype="int64"),
                "n_gaps": pd.Series([len(gaps)], dtype="int64"),
                "sum_gap_s": pd.Series([int(gaps.sum())], dtype="int64"),
                "sum_gap_sq_s": pd.Series([int((gaps * gaps).sum())], dtype="int64"),
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def user_gap_stats_sql() -> str:
    return """
        WITH g AS (
            SELECT user_id,
                   (epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000 AS gap_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        )
        SELECT user_id,
               CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
               CAST(COALESCE(SUM(gap_s), 0) AS BIGINT) AS sum_gap_s,
               CAST(COALESCE(SUM(gap_s * gap_s), 0) AS BIGINT) AS sum_gap_sq_s
        FROM g
        GROUP BY user_id
        ORDER BY user_id
    """


def source_quality_rollup(sf_dir: str) -> pd.DataFrame:
    """Per (source, lang) corpus profile: document count and total
    characters — the provenance panel a curation pipeline keeps per
    crawl source. One two-key groupby over pruned columns; n_chars is
    int64 so sums are order-free exact."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
    )
    out = (
        ds.groupby(["source", "lang"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    return out.sort_values(["source", "lang"]).reset_index(drop=True)


def source_quality_rollup_sql() -> str:
    return """
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1, 2
        ORDER BY source, lang
    """


def customer_ltv_cohorts(sf_dir: str) -> pd.DataFrame:
    """Customer-lifetime-value cohort curve over the multi-year orders
    history: cohort = year of the customer's FIRST order, age = order
    year minus cohort year; per (cohort_year, age) cell the order
    count, revenue, and number of distinct active customers.

    Distributed shape: ONE customer-keyed shuffle — first-order year
    and per-age aggregates are group-local facts (each customer
    contributes exactly one partial row per age cell, so distinct
    customers per cell is a plain SUM of ones) — then a per-batch
    arrow combiner collapses partials to the tiny cohort x age grid
    and the driver folds O(blocks x cells) rows. No second shuffle,
    no COUNT DISTINCT machinery."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        year = g["o_orderdate"].dt.year.to_numpy()
        cents = np.floor(g["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        y0 = int(year.min())
        age = year - y0
        ua, inv = np.unique(age, return_inverse=True)
        n = np.bincount(inv)
        rev = np.bincount(inv, weights=cents).astype(np.int64)
        return pd.DataFrame(
            {
                "cohort_year": pd.Series(np.full(len(ua), y0), dtype="int64"),
                "age": pd.Series(ua, dtype="int64"),
                "n_orders": pd.Series(n, dtype="int64"),
                "revenue_cents": pd.Series(rev, dtype="int64"),
                "n_customers": pd.Series(np.ones(len(ua)), dtype="int64"),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["cohort_year", "age"]).aggregate(
            [("n_orders", "sum"), ("revenue_cents", "sum"), ("n_customers", "sum")]
        )
        return g.rename_columns(
            ["cohort_year", "age", "n_orders", "revenue_cents", "n_customers"]
        )

    parts = (
        ds.groupby("o_custkey")
        .map_groups(per_cust, batch_format="pandas")
        .map_batches(combine, batch_format="pyarrow")
        .to_pandas()
    )
    out = (
        parts.groupby(["cohort_year", "age"], as_index=False)[
            ["n_orders", "revenue_cents", "n_customers"]
        ]
        .sum()
        .sort_values(["cohort_year", "age"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def customer_ltv_cohorts_sql() -> str:
    return """
        WITH fy AS (
            SELECT o_custkey, MIN(date_part('year', o_orderdate)) AS y0
            FROM orders GROUP BY 1
        )
        SELECT CAST(fy.y0 AS BIGINT) AS cohort_year,
               CAST(date_part('year', o.o_orderdate) - fy.y0 AS BIGINT) AS age,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
        FROM orders o JOIN fy ON fy.o_custkey = o.o_custkey
        GROUP BY 1, 2
        ORDER BY cohort_year, age
    """


def nation_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Ratio-to-report: each nation's share of total supplier-side
    revenue, in integer parts-per-million (rev_cents * 1e6 // total) so
    the division is exact integer arithmetic, not a float. Broadcast
    dim attach -> one tiny groupby -> driver finalize over the
    nation-cardinality aggregate."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    dim = supp.join(nation, keys="s_nationkey", right_keys="n_nationkey").select(
        ["s_suppkey", "n_name"]
    )
    ref = ray.put(dim)

    def attach(t: pa.Table, *, ref) -> pa.Table:
        d = ray.get(ref)
        left = pa.table(
            {"l_suppkey": t["l_suppkey"], "price_cents": _cents(t["l_extendedprice"])}
        )
        j = left.join(d, keys="l_suppkey", right_keys="s_suppkey", join_type="inner")
        return j.select(["n_name", "price_cents"])

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice"])
    agg = (
        ds.map_batches(attach, batch_format="pyarrow", fn_kwargs={"ref": ref})
        .groupby("n_name")
        .aggregate(Sum("price_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    total = int(agg["revenue_cents"].sum())
    agg["revenue_cents"] = agg["revenue_cents"].astype("int64")
    agg["share_ppm"] = (agg["revenue_cents"] * 1_000_000 // total).astype("int64")
    return agg.sort_values("n_name").reset_index(drop=True)


def nation_revenue_share_sql() -> str:
    return """
        WITH a AS (
            SELECT n.n_name,
                   CAST(ROUND(SUM(ROUND(l.l_extendedprice * 100))) AS BIGINT)
                     AS revenue_cents
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name
        )
        SELECT n_name, revenue_cents,
               CAST(revenue_cents * 1000000 // (SELECT SUM(revenue_cents) FROM a)
                    AS BIGINT) AS share_ppm
        FROM a
        ORDER BY n_name
    """


def session_bounce_rate(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Bounce rate per session-start day: share of sessions with exactly
    one event, in integer parts-per-million. Session detection is the
    coarse-sharded vectorized pass of concurrent_sessions_daily_peak;
    per-day (n_sessions, n_bounce) partials fold on the driver and the
    ppm division stays integer-exact."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def add_shard(t: pa.Table) -> pa.Table:
        return t.append_column(
            "shard", pa.array((t["user_id"].to_numpy() % 64).astype(np.int32), pa.int32())
        )

    def day_partials(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "day": pd.Series([], dtype="datetime64[ns]"),
                    "n_sessions": pd.Series([], dtype="int64"),
                    "n_bounce": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        gap_td = np.timedelta64(gap_minutes * 60_000_000_000, "ns")
        boundary = np.r_[True, (u[1:] != u[:-1]) | (np.diff(ts) > gap_td)]
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.r_[starts, len(u)])
        day = ts[starts].astype("datetime64[D]")
        ud, inv = np.unique(day, return_inverse=True)
        n_sessions = np.bincount(inv)
        n_bounce = np.bincount(inv, weights=(sizes == 1)).astype(np.int64)
        return pd.DataFrame(
            {
                "day": pd.Series(ud.astype("datetime64[ns]")),
                "n_sessions": pd.Series(n_sessions, dtype="int64"),
                "n_bounce": pd.Series(n_bounce, dtype="int64"),
            }
        )

    parts = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(day_partials, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("day", as_index=False)[["n_sessions", "n_bounce"]]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_bounce"] = out["n_bounce"].astype("int64")
    out["bounce_ppm"] = (out["n_bounce"] * 1_000_000 // out["n_sessions"]).astype("int64")
    return out


def session_bounce_rate_sql(gap_minutes: int = 30) -> str:
    return f"""
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM o
        ), sess AS (
            SELECT date_trunc('day', MIN(ts)) AS day, COUNT(*) AS n_events
            FROM s GROUP BY user_id, session_id
        )
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bounce,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS bounce_ppm
        FROM sess
        GROUP BY day
        ORDER BY day
    """


def event_type_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition matrix of event types per user
    stream (ordered by ts, event_id): count of each from -> to bigram
    plus the row-normalized probability in integer ppm. One user-keyed
    shuffle; bigram counting is a vectorized per-group pass; the
    type x type grid (25 cells) folds on the driver."""
    import numpy as np

    type_idx = {t: i for i, t in enumerate(sorted(_EVENT_TYPES))}
    n_types = len(type_idx)
    tref = ray.put(type_idx)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "event_id"]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ti = ray.get(tref)
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        tix = g["event_type"].map(ti).to_numpy()
        if len(tix) < 2:
            return pd.DataFrame({"cell": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        cell = tix[:-1] * n_types + tix[1:]
        uc, cnt = np.unique(cell, return_counts=True)
        return pd.DataFrame(
            {"cell": pd.Series(uc, dtype="int64"), "n": pd.Series(cnt, dtype="int64")}
        )

    parts = (
        ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    )
    tot = parts.groupby("cell")["n"].sum()
    inv = {i: t for t, i in type_idx.items()}
    cells = sorted(tot.index)
    n = tot[cells].to_numpy(dtype=np.int64)
    frm = np.array([c // n_types for c in cells])
    row_tot = {f: int(n[frm == f].sum()) for f in set(frm)}
    out = pd.DataFrame(
        {
            "from_type": [inv[int(c // n_types)] for c in cells],
            "to_type": [inv[int(c % n_types)] for c in cells],
            "n": pd.Series(n, dtype="int64"),
            "p_ppm": pd.Series(
                [int(v) * 1_000_000 // row_tot[f] for v, f in zip(n, frm)], dtype="int64"
            ),
        }
    )
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


def event_type_transitions_sql() -> str:
    return """
        WITH b AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events
        ), c AS (
            SELECT from_type, to_type, COUNT(*) AS n
            FROM b WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
               CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
                 AS p_ppm
        FROM c
        ORDER BY from_type, to_type
    """


def events_daily_percentiles(sf_dir: str) -> pd.DataFrame:
    """Per-day p50 / p90 of the value column, as ACTUAL data values
    (discrete quantiles at rank floor((n-1)*q) — the equidepth
    convention, so doubles are bit-exact). One day-keyed shuffle,
    vectorized partial sort per group."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"day": pc.floor_temporal(t["ts"], unit="day"), "value": t["value"]}
        )

    def quants(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy())
        n = len(v)
        return pd.DataFrame(
            {
                "day": [g["day"].iloc[0]],
                "n_events": pd.Series([n], dtype="int64"),
                "p50": [v[(n - 1) * 50 // 100]],
                "p90": [v[(n - 1) * 90 // 100]],
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .map_groups(quants, batch_format="pandas")
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def events_daily_percentiles_sql() -> str:
    return """
        WITH ord AS (
            SELECT date_trunc('day', ts) AS day, value,
                   ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts)
                                      ORDER BY value) AS rn,
                   COUNT(*) OVER (PARTITION BY date_trunc('day', ts)) AS n
            FROM events
        )
        SELECT day,
               CAST(MAX(n) AS BIGINT) AS n_events,
               MAX(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN value END) AS p50,
               MAX(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN value END) AS p90
        FROM ord
        GROUP BY day
        ORDER BY day
    """


def user_journey_counts(sf_dir: str, k: int = 5, top: int = 30) -> pd.DataFrame:
    """Behavioral journey mining: each user's first k event types in
    (ts, event_id) order joined with '>' form their journey signature;
    output the `top` signatures by (count DESC, journey ASC). One
    user-keyed shuffle; signature counting is a small string-domain
    fold (<= n_types^k signatures)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "event_id"]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        j = ">".join(g["event_type"].head(k))
        return pd.DataFrame({"journey": [j], "n_users": pd.Series([1], dtype="int64")})

    parts = (
        ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    )
    out = (
        parts.groupby("journey", as_index=False)["n_users"]
        .sum()
        .sort_values(["n_users", "journey"], ascending=[False, True], kind="mergesort")
        .head(top)
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def user_journey_counts_sql(k: int = 5, top: int = 30) -> str:
    return f"""
        WITH ordered AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ), j AS (
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY rn) AS journey
            FROM ordered WHERE rn <= {k}
            GROUP BY user_id
        )
        SELECT journey, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM j
        GROUP BY journey
        ORDER BY n_users DESC, journey
        LIMIT {top}
    """


def user_type_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-user Shannon entropy of the event-type distribution in
    nano-nats — the behavioral-diversity feature. One user-keyed
    shuffle; each type contributes floor(-p*ln(p)*1e9 + 0.5) with p
    computed in the same float-op order as the SQL twin (glibc ln ==
    DuckDB ln — the token_entropy precedent), so the int64 sums are
    exact."""
    import math

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        c = g["event_type"].value_counts()
        n = int(c.sum())
        tot = 0
        for cnt in c.to_numpy():
            p = int(cnt) / n
            tot += int(math.floor(-p * math.log(p) * 1e9 + 0.5))
        return pd.DataFrame(
            {
                "user_id": pd.Series([int(g["user_id"].iloc[0])], dtype="int64"),
                "entropy_nano": pd.Series([tot], dtype="int64"),
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def user_type_entropy_sql() -> str:
    return """
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ), n AS (
            SELECT user_id, SUM(cnt) AS n FROM c GROUP BY 1
        )
        SELECT c.user_id,
               CAST(SUM(CAST(FLOOR(
                   -(cnt / CAST(n.n AS DOUBLE))
                   * ln(cnt / CAST(n.n AS DOUBLE)) * 1e9 + 0.5) AS BIGINT))
                 AS BIGINT) AS entropy_nano
        FROM c JOIN n ON c.user_id = n.user_id
        GROUP BY 1
        ORDER BY 1
    """


def days_to_first_purchase(sf_dir: str) -> pd.DataFrame:
    """Time-to-conversion histogram: whole days from each user's FIRST
    event to their FIRST purchase (-1 = never purchased, the censored
    bucket). Per-user facts are group-local (one keyed shuffle); the
    day histogram folds on the driver."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t0 = g["ts"].min()
        purch = g.loc[g["event_type"] == "purchase", "ts"]
        if len(purch) == 0:
            d = -1
        else:
            d = int((purch.min().value - t0.value) // (86_400 * 1_000_000_000))
        return pd.DataFrame(
            {"days": pd.Series([d], dtype="int64"), "n_users": pd.Series([1], dtype="int64")}
        )

    parts = (
        ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    )
    out = (
        parts.groupby("days", as_index=False)["n_users"]
        .sum()
        .sort_values("days")
        .reset_index(drop=True)
    )
    out["days"] = out["days"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


def days_to_first_purchase_sql() -> str:
    return """
        WITH f AS (
            SELECT user_id, MIN(ts) AS t0,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
            FROM events GROUP BY 1
        )
        SELECT CAST(CASE WHEN tp IS NULL THEN -1
                         ELSE (epoch_us(tp) - epoch_us(t0)) // 86400000000
                    END AS BIGINT) AS days,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM f
        GROUP BY 1
        ORDER BY days
    """


def customer_revenue_concentration(sf_dir: str) -> pd.DataFrame:
    """Revenue concentration: the share of total order revenue held by
    the top decile of customers, in exact integer ppm. Per-customer
    revenue is a single-key groupby; the top-k sum is taken from the
    revenue-value FREQUENCY table (rank_normalize's bounded-domain CDF
    trick), so driver state is O(distinct revenue values), never the
    customer list — the k-th largest value and partial ties resolve
    exactly in integer arithmetic."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
        )

    cr = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="rev"))
    )

    def freq(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["rev"]), "rev").aggregate([("rev", "count")])
        return pa.table({"rev": g["rev"], "cnt": g["rev_count"]})

    f = (
        cr.map_batches(freq, batch_format="pyarrow")
        .to_pandas()
        .groupby("rev", as_index=False)["cnt"]
        .sum()
        .sort_values("rev", ascending=False)
        .reset_index(drop=True)
    )
    n = int(f["cnt"].sum())
    total = int((f["rev"] * f["cnt"]).sum())
    k = n // 10
    cum = f["cnt"].cumsum()
    full = f[cum <= k]
    top = int((full["rev"] * full["cnt"]).sum())
    taken = int(full["cnt"].sum())
    if taken < k:  # partial tie slice at the threshold value
        top += int(f["rev"].iloc[len(full)]) * (k - taken)
    return pd.DataFrame(
        {
            "n_customers": pd.Series([n], dtype="int64"),
            "k": pd.Series([k], dtype="int64"),
            "total_cents": pd.Series([total], dtype="int64"),
            "top_decile_cents": pd.Series([top], dtype="int64"),
            "share_ppm": pd.Series([top * 1_000_000 // total], dtype="int64"),
        }
    )


def customer_revenue_concentration_sql() -> str:
    return """
        WITH cr AS (
            SELECT o_custkey,
                   CAST(ROUND(SUM(ROUND(o_totalprice * 100))) AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ), r AS (
            SELECT rev,
                   ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rn,
                   COUNT(*) OVER () AS n,
                   SUM(rev) OVER () AS tot
            FROM cr
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
               CAST(MAX(n) // 10 AS BIGINT) AS k,
               CAST(MAX(tot) AS BIGINT) AS total_cents,
               CAST(SUM(CASE WHEN rn <= n // 10 THEN rev ELSE 0 END) AS BIGINT)
                 AS top_decile_cents,
               CAST(SUM(CASE WHEN rn <= n // 10 THEN rev ELSE 0 END) * 1000000
                    // MAX(tot) AS BIGINT) AS share_ppm
        FROM r
    """


def fulfillment_latency(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """Order-fulfillment latency per priority: whole days from order
    date to each lineitem's ship date. A second consumer of the
    big x big hash-partitioned Dataset.join (lineitem x orders on
    orderkey, both sides projected to two columns before the
    exchange); the 5-key (count, sum, max) day stats fold from
    per-batch arrow partials — integer-exact end to end."""
    import numpy as np

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    joined = li.join(
        od,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partials(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ordd = t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        days = (ship - ordd) // 86_400_000_000
        df = pd.DataFrame({"o_orderpriority": t["o_orderpriority"].to_pylist(), "d": days})
        agg = df.groupby("o_orderpriority")["d"].agg(["size", "sum", "max"]).reset_index()
        return pa.table(
            {
                "o_orderpriority": pa.array(agg["o_orderpriority"], pa.string()),
                "n": pa.array(agg["size"].astype("int64"), pa.int64()),
                "s": pa.array(agg["sum"].astype("int64"), pa.int64()),
                "m": pa.array(agg["max"].astype("int64"), pa.int64()),
            }
        )

    parts = joined.map_batches(partials, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("o_orderpriority", as_index=False)
        .agg(n_items=("n", "sum"), sum_days=("s", "sum"), max_days=("m", "max"))
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    for c in ("n_items", "sum_days", "max_days"):
        out[c] = out[c].astype("int64")
    return out


def fulfillment_latency_sql() -> str:
    return """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                        // 86400000000) AS BIGINT) AS sum_days,
               CAST(MAX((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                        // 86400000000) AS BIGINT) AS max_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
        ORDER BY o.o_orderpriority
    """


def tpch_q3(sf_dir: str, num_partitions: int = 8, k: int = 10) -> pd.DataFrame:
    """TPC-H Q3 shape (shipping-priority top-k): revenue of orders from
    one market segment placed before a cutoff, counting only lineitems
    shipped after it; top-10 orders by discounted revenue.

    Distributed plan: the segment's customers are a broadcast Arrow
    semi-join applied to orders BEFORE the exchange; lineitems are
    date-filtered and revenue-quantized per row (same float-op order
    as the SQL twin, see local_supplier_revenue) before the single
    big x big hash-partitioned join on orderkey; per-batch partial
    sums collapse the join output to one row per (orderkey, date,
    priority); a 64-way coarse-shard reduce finishes the per-order
    totals and each shard emits only its local top-k — the driver
    merges 64*k candidate rows."""
    import numpy as np

    CUT = pd.Timestamp("1998-01-01")
    SEG = "BUILDING"

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(pc.equal(cust["c_mktsegment"], SEG)).select(["c_custkey"])
    cust_ref = ray.put(cust)

    def prep_orders(t: pa.Table, *, cust_ref) -> pa.Table:
        ckeys = ray.get(cust_ref)
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(CUT, type=pa.timestamp("us"))))
        t = t.filter(pc.is_in(t["o_custkey"], ckeys["c_custkey"].combine_chunks()))
        return t.select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    def prep_lineitem(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(CUT, type=pa.timestamp("us"))))
        disc = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_cents": pc.cast(
                    pc.round(disc, round_mode="half_towards_infinity"), pa.int64()
                ),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(prep_lineitem, batch_format="pyarrow")
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(prep_orders, batch_format="pyarrow", fn_kwargs={"cust_ref": cust_ref})

    joined = li.join(
        od,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(),
                "date_us": t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "prio": t["o_orderpriority"].to_pylist(),
                "rev": t["rev_cents"].to_numpy(),
            }
        )
        agg = (
            df.groupby(["l_orderkey", "date_us", "prio"], sort=False)["rev"]
            .sum()
            .reset_index()
        )
        agg["_shard"] = (agg["l_orderkey"] % 64).astype("int32")
        return pa.Table.from_pandas(agg, preserve_index=False)

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = (
            g.groupby(["l_orderkey", "date_us", "prio"], sort=False)["rev"]
            .sum()
            .reset_index()
        )
        tot = tot.sort_values(
            ["rev", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return tot

    cand = (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_topk, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["rev", "l_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out = pd.DataFrame(
        {
            "l_orderkey": cand["l_orderkey"].astype("int64"),
            "o_orderdate": pd.to_datetime(cand["date_us"].astype("int64"), unit="us"),
            "o_orderpriority": cand["prio"],
            "revenue_cents": cand["rev"].astype("int64"),
        }
    )
    return out.reset_index(drop=True)


def tpch_q3_sql(k: int = 10) -> str:
    return f"""
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue_cents DESC, l.l_orderkey
        LIMIT {k}
    """


def ntile_quartiles(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) bucketing of customers by account balance within each
    market segment, with per-quartile balance stats in exact cents.
    Tie order is pinned (ORDER BY c_acctbal, c_custkey) so the bucket
    assignment is deterministic on both sides.

    Segments are the natural partition: groupby(segment).map_groups
    sorts each group once and assigns NTILE's uneven-bucket rule
    (first n % 4 buckets take the extra row) via np.repeat — no
    per-row window dispatch."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    )

    def per_segment(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"], kind="mergesort").reset_index(drop=True)
        n = len(g)
        base, rem = divmod(n, 4)
        sizes = [base + (1 if i < rem else 0) for i in range(4)]
        q = np.repeat(np.arange(1, 5, dtype=np.int64), sizes)
        cents = np.round(g["c_acctbal"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"q": q, "cents": cents})
        agg = df.groupby("q")["cents"].agg(["size", "sum", "min", "max"]).reset_index()
        return pd.DataFrame(
            {
                "c_mktsegment": g["c_mktsegment"].iloc[0],
                "quartile": agg["q"].astype("int64"),
                "n_customers": agg["size"].astype("int64"),
                "sum_cents": agg["sum"].astype("int64"),
                "min_cents": agg["min"].astype("int64"),
                "max_cents": agg["max"].astype("int64"),
            }
        )

    out = (
        ds.groupby("c_mktsegment")
        .map_groups(per_segment, batch_format="pandas")
        .to_pandas()
        .sort_values(["c_mktsegment", "quartile"])
        .reset_index(drop=True)
    )
    return out


def ntile_quartiles_sql() -> str:
    return """
        WITH t AS (
            SELECT c_mktsegment,
                   NTILE(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal, c_custkey) AS quartile,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer
        )
        SELECT c_mktsegment, CAST(quartile AS BIGINT) AS quartile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents
        FROM t GROUP BY 1, 2 ORDER BY 1, 2
    """


def cumulative_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Cumulative distinct active users per activity day (the
    users-to-date curve). Windowed COUNT(DISTINCT) doesn't exist as a
    window function; the exact distributed form is the first-touch
    trick: distinct users-to-date on day d == # users whose FIRST
    event day <= d. groupby(user).min(day) is the only exchange (one
    row per user); the per-first-day counts and the running sum over
    the tiny day axis fold on the driver."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        d = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"user_id": u, "day": d})
        # per-batch combiner: one row per (user) with its min day, plus
        # the batch's observed-day set so the day axis needs no 2nd read
        m = df.groupby("user_id", sort=False)["day"].min().reset_index()
        seen = np.unique(d)
        # observed days ride the same exchange as one sentinel key per
        # day (-day-1): distinct under the groupby, recoverable after
        return pa.table(
            {
                "user_id": pa.array(
                    np.r_[m["user_id"].to_numpy(), -seen - 1], pa.int64()
                ),
                "day": pa.array(np.r_[m["day"].to_numpy(), seen], pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    firsts = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="first_day"))
        .to_pandas()
    )
    observed = np.unique(firsts.loc[firsts["user_id"] < 0, "first_day"].to_numpy())
    per_day = (
        firsts[firsts["user_id"] >= 0].groupby("first_day").size().sort_index()
    )
    days = per_day.index.to_numpy()
    cum = per_day.to_numpy().cumsum()
    at = np.searchsorted(days, observed, side="right") - 1
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(observed.astype("datetime64[D]")),
            "cum_users": pd.Series(cum[at], dtype="int64"),
        }
    )
    return out.reset_index(drop=True)


def cumulative_distinct_users_sql() -> str:
    return """
        WITH f AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS fd FROM events GROUP BY 1
        ), d AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
        )
        SELECT CAST(d.day AS TIMESTAMP) AS day,
               CAST((SELECT COUNT(*) FROM f WHERE f.fd <= d.day) AS BIGINT)
                   AS cum_users
        FROM d ORDER BY d.day
    """


def last_touch_attribution(sf_dir: str, lookback_hours: int = 24) -> pd.DataFrame:
    """Marketing attribution: every purchase is credited to the user's
    most recent PRIOR click/view within a lookback window ('direct'
    when none). Row order is the SQL window order (ts, event_id), so
    same-timestamp earlier-id touches count, exactly like the
    LAST_VALUE IGNORE NULLS ... 1 PRECEDING frame in the twin.

    One user-keyed coarse-bucket shuffle; inside a bucket one sort +
    np.maximum.accumulate forward-fills the latest touch row index for
    ALL users at once (contiguous user segments make the cross-user
    guard a per-row start-index compare). Per-channel (count, cents)
    partials fold on the driver."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )

    def shard(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column(
            "_shard", pa.array((u % 64).astype(np.int32), pa.int32())
        )

    win_us = lookback_hours * 3_600_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        n = len(g)
        if not n:
            return pd.DataFrame(
                {
                    "channel": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                    "cents": pd.Series([], dtype="int64"),
                }
            )
        user = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        et = g["event_type"].to_numpy()
        touch = (et == "click") | (et == "view")
        idx = np.arange(n, dtype=np.int64)
        acc = np.maximum.accumulate(np.where(touch, idx, -1))
        prev = np.empty(n, dtype=np.int64)
        prev[0] = -1
        prev[1:] = acc[:-1]  # latest touch STRICTLY before this row
        opening = np.r_[True, user[1:] != user[:-1]]
        start = np.maximum.accumulate(np.where(opening, idx, -1))
        purch = et == "purchase"
        valid = purch & (prev >= start) & (ts[np.maximum(prev, 0)] >= ts - win_us)
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        channel = np.where(valid, et[np.maximum(prev, 0)], "direct")
        df = pd.DataFrame({"channel": channel[purch], "cents": cents[purch]})
        agg = df.groupby("channel")["cents"].agg(["size", "sum"]).reset_index()
        return pd.DataFrame(
            {
                "channel": agg["channel"],
                "n": agg["size"].astype("int64"),
                "cents": agg["sum"].astype("int64"),
            }
        )

    parts = (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("channel", as_index=False)
        .agg(n_purchases=("n", "sum"), revenue_cents=("cents", "sum"))
        .sort_values("channel")
        .reset_index(drop=True)
    )
    for c in ("n_purchases", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out


def last_touch_attribution_sql(lookback_hours: int = 24) -> str:
    return f"""
        WITH e AS (
            SELECT event_id, user_id, ts, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   CASE WHEN event_type IN ('click', 'view')
                        THEN event_type END AS touch_type,
                   CASE WHEN event_type IN ('click', 'view')
                        THEN ts END AS touch_ts
            FROM events
        ), w AS (
            SELECT *,
                   LAST_VALUE(touch_type IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt,
                   LAST_VALUE(touch_ts IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lts
            FROM e
        )
        SELECT COALESCE(CASE WHEN lts >= ts - INTERVAL {lookback_hours} HOURS
                             THEN lt END, 'direct') AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM w WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY 1
    """


def rolling_median_value(sf_dir: str, window: int = 7) -> pd.DataFrame:
    """Per-user trailing-window median of event value (cents) over the
    last 7 events — the robust-baseline twin of the sliding averages.
    ROWS frame (6 PRECEDING..CURRENT), partial windows at the head.

    Medians don't decompose, so the exact distributed form co-locates
    each user (coarse-bucket shuffle) and computes all full windows of
    a bucket with one numpy sliding_window_view + partition (no Python
    loop per row); only the <window-1 head rows per user take the
    short path."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def shard(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column(
            "_shard", pa.array((u % 64).astype(np.int32), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        n = len(g)
        med = np.empty(n, dtype=np.float64)
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        user = g["user_id"].to_numpy()
        starts = np.r_[0, np.nonzero(user[1:] != user[:-1])[0] + 1, n]
        for a, b in zip(starts[:-1], starts[1:]):
            seg = cents[a:b]
            m = len(seg)
            head = min(window - 1, m)
            for i in range(head):
                med[a + i] = np.median(seg[: i + 1])
            if m >= window:
                sw = np.lib.stride_tricks.sliding_window_view(seg, window)
                med[a + window - 1 : a + m] = np.median(sw, axis=1)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "med_cents": med,
            }
        )

    out = (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out["event_id"] = out["event_id"].astype("int64")
    return out


def rolling_median_value_sql(window: int = 7) -> str:
    return f"""
        SELECT event_id,
               MEDIAN(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW
               ) AS med_cents
        FROM events ORDER BY event_id
    """


def mv_incremental_daily_revenue(sf_dir: str) -> pd.DataFrame:
    """Incremental materialized-view maintenance: the daily
    (event_type, day) -> (n, revenue) rollup is first built from the
    base partition (event_id % 10 != 0), then a CDC delta batch (the
    remaining rows) is aggregated SEPARATELY and merged by key
    addition — the base is never rescanned, which is the whole point
    of MV maintenance at 100 TB. The merged view is verified against a
    full recompute by the SQL twin.

    Both passes are per-batch partial aggregations (the MV key space
    is |types| x |days| — tiny), folded on the driver; no shuffle."""
    import numpy as np

    def agg_partition(pred):
        ds = rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type", "value"],
        )

        def partial(t: pa.Table) -> pa.Table:
            eid = t["event_id"].to_numpy()
            keep = pred(eid)
            day = (
                t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)[keep]
            )
            cents = np.round(t["value"].to_numpy() * 100).astype(np.int64)[keep]
            et = t["event_type"].to_numpy()[keep]
            df = pd.DataFrame({"event_type": et, "day": day, "cents": cents})
            agg = (
                df.groupby(["event_type", "day"], sort=False)["cents"]
                .agg(["size", "sum"])
                .reset_index()
            )
            return pa.table(
                {
                    "event_type": pa.array(agg["event_type"], pa.string()),
                    "day": pa.array(agg["day"].astype("int64"), pa.int64()),
                    "n": pa.array(agg["size"].astype("int64"), pa.int64()),
                    "cents": pa.array(agg["sum"].astype("int64"), pa.int64()),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        return (
            parts.groupby(["event_type", "day"], as_index=False)
            .agg(n=("n", "sum"), cents=("cents", "sum"))
        )

    base = agg_partition(lambda eid: eid % 10 != 0)
    delta = agg_partition(lambda eid: eid % 10 == 0)
    merged = (
        pd.concat([base, delta])
        .groupby(["event_type", "day"], as_index=False)
        .agg(n_events=("n", "sum"), revenue_cents=("cents", "sum"))
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    out = pd.DataFrame(
        {
            "event_type": merged["event_type"],
            "day": pd.to_datetime(merged["day"].astype("int64"), unit="D"),
            "n_events": merged["n_events"].astype("int64"),
            "revenue_cents": merged["revenue_cents"].astype("int64"),
        }
    )
    return out


def mv_incremental_daily_revenue_sql() -> str:
    return """
        SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """


def experiment_lift(sf_dir: str) -> pd.DataFrame:
    """A/B experiment readout with deterministic hash assignment:
    users split into two variants by md5(user_id) % 2; per variant the
    exposed-user count, converting-user count (>= 1 purchase),
    purchase count, revenue cents and the conversion rate in exact
    integer ppm. The per-user rollup (needed for "converted = any
    purchase") happens inside a user-keyed coarse-shard reduce; each
    shard emits 2 variant partial rows, so the driver folds 64 x 2
    rows regardless of user count."""
    import hashlib as _h

    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        et = t["event_type"].to_numpy()
        cents = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        purch = et == "purchase"
        df = pd.DataFrame(
            {"user_id": u, "p": purch.astype(np.int64), "cents": np.where(purch, cents, 0)}
        )
        agg = df.groupby("user_id", sort=False).agg(
            n_purch=("p", "sum"), cents=("cents", "sum")
        ).reset_index()
        agg["_shard"] = (agg["user_id"] % 64).astype("int32")
        return pa.Table.from_pandas(agg, preserve_index=False)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        pu = g.groupby("user_id", as_index=False).agg(
            n_purch=("n_purch", "sum"), cents=("cents", "sum")
        )
        h = np.fromiter(
            (
                int.from_bytes(_h.md5(str(int(u)).encode()).digest()[:4], "big")
                for u in pu["user_id"]
            ),
            dtype=np.uint64,
            count=len(pu),
        )
        pu["variant"] = np.where(h % 2 == 0, "A", "B")
        out = pu.groupby("variant", as_index=False).agg(
            n_users=("user_id", "count"),
            n_converted=("n_purch", lambda s: int((s > 0).sum())),
            n_purchases=("n_purch", "sum"),
            revenue_cents=("cents", "sum"),
        )
        for c in ("n_users", "n_converted", "n_purchases", "revenue_cents"):
            out[c] = out[c].astype("int64")
        return out

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
        .to_pandas()
    )
    g = parts.groupby("variant", as_index=False).agg(
        n_users=("n_users", "sum"),
        n_converted=("n_converted", "sum"),
        n_purchases=("n_purchases", "sum"),
        revenue_cents=("revenue_cents", "sum"),
    )
    g["conv_ppm"] = (g["n_converted"] * 1_000_000) // g["n_users"]
    for c in ("n_users", "n_converted", "n_purchases", "revenue_cents", "conv_ppm"):
        g[c] = g[c].astype("int64")
    return g.sort_values("variant").reset_index(drop=True)


def experiment_lift_sql() -> str:
    return """
        WITH pu AS (
            SELECT user_id,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                        1, 8)) AS UBIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
                   SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END) AS cents
            FROM events GROUP BY 1, 2
        )
        SELECT variant,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_converted,
               CAST(SUM(np) AS BIGINT) AS n_purchases,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents,
               CAST(SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS conv_ppm
        FROM pu GROUP BY 1 ORDER BY 1
    """


def dod_growth(sf_dir: str) -> pd.DataFrame:
    """Day-over-day growth per event type: daily event counts plus the
    change vs the previous CALENDAR day in exact integer ppm
    (1_000_000 * (today - yesterday) // yesterday; -1_000_000 marks a
    day whose predecessor had no events of that type, matching the
    NULL->-1e6 sentinel in the twin). The (type, day) count matrix is
    tiny, so per-batch partials fold on the driver and the LAG runs
    there — no shuffle."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(), "day": day})
        agg = df.groupby(["event_type", "day"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
    )
    rows = []
    for ty, g in parts.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        days = g["day"].to_numpy()
        n = g["n"].to_numpy().astype(np.int64)
        prev = np.full(len(g), -1, dtype=np.int64)
        has_prev = np.isin(days - 1, days)
        idx = np.searchsorted(days, days - 1)
        prev[has_prev] = n[idx[has_prev]]
        num = 1_000_000 * (n - prev)
        # DuckDB's // truncates toward zero; numpy floors — match DuckDB
        q = np.sign(num) * (np.abs(num) // np.maximum(prev, 1))
        growth = np.where(prev > 0, q, -1_000_000)
        for d, cnt, gr in zip(days, n, growth):
            rows.append((ty, d, int(cnt), int(gr)))
    out = pd.DataFrame(rows, columns=["event_type", "day", "n_events", "growth_ppm"])
    out["day"] = pd.to_datetime(out["day"].astype("int64"), unit="D")
    for c in ("n_events", "growth_ppm"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def dod_growth_sql() -> str:
    return """
        WITH d AS (
            SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ), w AS (
            SELECT *, LAG(n_events) OVER (PARTITION BY event_type
                                          ORDER BY day) AS pn,
                      LAG(day) OVER (PARTITION BY event_type
                                     ORDER BY day) AS pd
            FROM d
        )
        SELECT event_type, day, n_events,
               CAST(CASE WHEN pd = day - INTERVAL 1 DAY
                         THEN 1000000 * (n_events - pn) // pn
                         ELSE -1000000 END AS BIGINT) AS growth_ppm
        FROM w ORDER BY event_type, day
    """


def distinct_types_so_far(sf_dir: str) -> pd.DataFrame:
    """Running COUNT(DISTINCT event_type) per user at every event —
    the "breadth-so-far" engagement curve. No window function computes
    windowed distinct; the exact form flags each (user, type)'s FIRST
    occurrence (in (ts, event_id) order) and takes a running SUM of
    the flags. One user-bucket shuffle; first-occurrence flags and the
    per-user cumulative sums are vectorized over whole buckets."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def shard(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column(
            "_shard", pa.array((u % 64).astype(np.int32), pa.int32())
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        first = (~g.duplicated(["user_id", "event_type"])).to_numpy().astype(np.int64)
        user = g["user_id"].to_numpy()
        csum = np.cumsum(first)
        opening = np.r_[True, user[1:] != user[:-1]]
        idx = np.arange(len(g), dtype=np.int64)
        starts = np.nonzero(opening)[0]
        base = np.zeros(len(g), dtype=np.int64)
        base[starts] = csum[starts] - first[starts]
        run = csum - np.maximum.accumulate(base)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "n_types_so_far": pd.Series(run, dtype="int64"),
            }
        )

    out = (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for c in ("event_id", "n_types_so_far"):
        out[c] = out[c].astype("int64")
    return out


def distinct_types_so_far_sql() -> str:
    return """
        WITH f AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN ROW_NUMBER() OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) = 1
                        THEN 1 ELSE 0 END AS is_first
            FROM events
        )
        SELECT event_id,
               CAST(SUM(is_first) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_types_so_far
        FROM f ORDER BY event_id
    """


def order_backlog_curve(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """Open-order backlog over time: an order is open from its order
    date until its LAST lineitem ship date; the curve counts open
    orders at each day either endpoint occurs. Third consumer of the
    big x big lineitem x orders join: per-order last-ship reduces
    inside the join partitions (coarse orderkey shard), each shard
    emits +1/-1 day deltas, and the prefix scan over the tiny day axis
    runs on the driver."""
    import numpy as np

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    od = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(),
                "ship": t["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64),
            }
        )
        agg = df.groupby("l_orderkey", sort=False)["ship"].max().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    joined = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .join(
            od,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
    )

    def deltas(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(),
                "ship": t["ship"].to_numpy(),
                "open": t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64),
            }
        )
        # the join output may still split one orderkey across batches;
        # reduce locally, finish per coarse shard
        agg = df.groupby(["l_orderkey", "open"], sort=False)["ship"].max().reset_index()
        agg["_shard"] = (agg["l_orderkey"] % 64).astype("int32")
        return pa.Table.from_pandas(agg, preserve_index=False)

    def shard_deltas(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["l_orderkey", "open"], sort=False)["ship"].max().reset_index()
        opens = per.groupby("open").size()
        closes = per.groupby("ship").size()
        days = np.union1d(opens.index.to_numpy(), closes.index.to_numpy())
        d = pd.DataFrame(
            {
                "day": days,
                "delta": [
                    int(opens.get(x, 0)) - int(closes.get(x, 0)) for x in days
                ],
            }
        )
        return d

    parts = (
        joined.map_batches(deltas, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_deltas, batch_format="pandas")
        .to_pandas()
    )
    fold = parts.groupby("day", as_index=False)["delta"].sum().sort_values("day")
    fold["open_orders"] = fold["delta"].cumsum()
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(fold["day"].astype("int64"), unit="D"),
            "open_orders": fold["open_orders"].astype("int64"),
        }
    )
    return out.reset_index(drop=True)


def order_backlog_curve_sql() -> str:
    return """
        WITH per AS (
            SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS open_d,
                   MAX(CAST(l.l_shipdate AS DATE)) AS close_d
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2
        ), deltas AS (
            SELECT open_d AS day, CAST(1 AS BIGINT) AS delta FROM per
            UNION ALL
            SELECT close_d, -1 FROM per
        ), folded AS (
            SELECT day, SUM(delta) AS delta FROM deltas GROUP BY day
        )
        SELECT CAST(day AS TIMESTAMP) AS day,
               CAST(SUM(delta) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS open_orders
        FROM folded ORDER BY day
    """


def bloom_join_revenue(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """Bloom-pushdown join (the runtime-filter optimization every
    warehouse applies to selective joins): high-priority orders build
    a mergeable Bloom filter of their orderkeys (stages/sketches
    partials, OR-merged, ~128 KiB total); the filter broadcasts to the
    lineitem scan, which drops non-matching rows BEFORE the
    hash-partitioned exchange. False positives are eliminated by the
    exact join itself, so the result is exact while the shuffle moves
    only ~|matching| + epsilon rows instead of the whole fact table.
    Output: revenue by priority for the filtered subset, plus nothing
    about the filter (the optimization must be invisible)."""
    import numpy as np

    from pdfrust_ray.stages.sketches import bloom_contains, bloom_merge, bloom_partial

    PRIO = ("1-URGENT", "2-HIGH")

    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def od_prep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["o_orderpriority"], pa.array(list(PRIO))))

    filtered_orders = od.map_batches(od_prep, batch_format="pyarrow")

    def od_bloom(t: pa.Table) -> pa.Table:
        blob = bloom_partial(t["o_orderkey"].to_numpy().astype(np.uint64))
        return pa.table({"blob": pa.array([blob], pa.binary())})

    blobs = filtered_orders.map_batches(od_bloom, batch_format="pyarrow").to_pandas()
    bits = bloom_merge(list(blobs["blob"]))
    bits_ref = ray.put(bits)

    def li_prep(t: pa.Table, *, bits_ref) -> pa.Table:
        bits = ray.get(bits_ref)
        keep = bloom_contains(bits, t["l_orderkey"].to_numpy().astype(np.uint64))
        t = t.filter(pa.array(keep))
        cents = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
                    ),
                    pa.scalar(100.0),
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"l_orderkey": t["l_orderkey"], "cents": cents})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow", fn_kwargs={"bits_ref": bits_ref})

    joined = li.join(
        filtered_orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_pylist(),
                "cents": t["cents"].to_numpy(),
            }
        )
        agg = df.groupby("o_orderpriority")["cents"].agg(["size", "sum"]).reset_index()
        return pa.table(
            {
                "o_orderpriority": pa.array(agg["o_orderpriority"], pa.string()),
                "n": pa.array(agg["size"].astype("int64"), pa.int64()),
                "s": pa.array(agg["sum"].astype("int64"), pa.int64()),
            }
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("o_orderpriority", as_index=False)
        .agg(n_items=("n", "sum"), revenue_cents=("s", "sum"))
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    for c in ("n_items", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out


def bloom_join_revenue_sql() -> str:
    return """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY 1 ORDER BY 1
    """


def winsorized_mean_value(sf_dir: str) -> pd.DataFrame:
    """Winsorized robust aggregate: per event type, the mean of value
    cents after clamping to the type's discrete p5/p95 (rank
    floor((n-1)*q) convention) — integer-exact as (sum of clamped
    cents, count). Cent values are a bounded domain, so the exact
    distributed form is the frequency-table fold (same shape as
    role_length_quantiles): per-batch (type, cents, n) partials, a
    driver fold over the small domain, clamp + weighted sum there."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "cents": np.round(t["value"].to_numpy() * 100).astype(np.int64),
            }
        )
        agg = df.groupby(["event_type", "cents"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "cents"], as_index=False)["n"]
        .sum()
    )
    rows = []
    for ty, g in parts.groupby("event_type"):
        g = g.sort_values("cents")
        vals = g["cents"].to_numpy()
        cnt = g["n"].to_numpy()
        cum = cnt.cumsum()
        n = int(cum[-1])
        lo = int(vals[np.searchsorted(cum, (n - 1) * 5 // 100 + 1)])
        hi = int(vals[np.searchsorted(cum, (n - 1) * 95 // 100 + 1)])
        clamped = np.clip(vals, lo, hi)
        total = int((clamped * cnt).sum())
        rows.append((ty, n, lo, hi, total))
    out = pd.DataFrame(
        rows, columns=["event_type", "n_events", "p5_cents", "p95_cents", "winsor_sum_cents"]
    ).sort_values("event_type").reset_index(drop=True)
    for c in ("n_events", "p5_cents", "p95_cents", "winsor_sum_cents"):
        out[c] = out[c].astype("int64")
    return out


def winsorized_mean_value_sql() -> str:
    return """
        WITH c AS (
            SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), ord AS (
            SELECT event_type, cents,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM c
        ), bounds AS (
            SELECT event_type,
                   MAX(n) AS n,
                   MAX(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN cents END)
                       AS lo,
                   MAX(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN cents END)
                       AS hi
            FROM ord GROUP BY event_type
        )
        SELECT c.event_type,
               CAST(MAX(b.n) AS BIGINT) AS n_events,
               CAST(MAX(b.lo) AS BIGINT) AS p5_cents,
               CAST(MAX(b.hi) AS BIGINT) AS p95_cents,
               CAST(SUM(GREATEST(b.lo, LEAST(b.hi, c.cents))) AS BIGINT)
                   AS winsor_sum_cents
        FROM c JOIN bounds b ON c.event_type = b.event_type
        GROUP BY c.event_type ORDER BY c.event_type
    """


def monthly_seasonality(sf_dir: str) -> pd.DataFrame:
    """Month-of-year seasonality over the multi-year orders history:
    order count and total price cents per calendar month (1-12),
    folding all years — the periodic-profile aggregate (events span
    one month, so orders is the right table for calendar analytics).
    Per-batch partials over a 12-key domain; driver fold."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        m = pc.month(t["o_orderdate"]).to_numpy().astype(np.int64)
        cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"month": m, "cents": cents})
        agg = df.groupby("month")["cents"].agg(["size", "sum"]).reset_index()
        return pa.table(
            {
                "month": pa.array(agg["month"].astype("int64"), pa.int64()),
                "n": pa.array(agg["size"].astype("int64"), pa.int64()),
                "s": pa.array(agg["sum"].astype("int64"), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("month", as_index=False)
        .agg(n_orders=("n", "sum"), total_cents=("s", "sum"))
        .sort_values("month")
        .reset_index(drop=True)
    )
    for c in ("month", "n_orders", "total_cents"):
        out[c] = out[c].astype("int64")
    return out


def monthly_seasonality_sql() -> str:
    return """
        SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM orders GROUP BY 1 ORDER BY 1
    """


def feature_snapshot(sf_dir: str, cutoff: str = "2024-01-25") -> pd.DataFrame:
    """Feature-store snapshot: per user, training features AS OF a
    cutoff (point-in-time correctness — no post-cutoff leakage):
    total events, events in the trailing 7 days, total purchases,
    distinct event types seen, and days since last activity. One
    user-keyed coarse-shard reduce computes every feature vectorized
    per shard; nothing after the cutoff is ever read into a feature."""
    import numpy as np

    CUT = pd.Timestamp(cutoff)
    cut_us = CUT.value // 1000
    week_us = 7 * 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        t = t.append_column("ts_us", us)
        t = t.filter(pc.less(t["ts_us"], pa.scalar(cut_us, pa.int64())))
        u = t["user_id"].to_numpy()
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts_us"],
                "event_type": t["event_type"],
                "_shard": pa.array((u % 64).astype(np.int32), pa.int32()),
            }
        )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"]
        agg = g.groupby("user_id").agg(
            n_events=("ts_us", "size"),
            last_us=("ts_us", "max"),
        )
        agg["n_last_7d"] = g[g["ts_us"] >= cut_us - week_us].groupby("user_id")[
            "ts_us"
        ].size().reindex(agg.index, fill_value=0)
        agg["n_purchases"] = g[et == "purchase"].groupby("user_id")["ts_us"].size().reindex(
            agg.index, fill_value=0
        )
        agg["n_types"] = g.groupby("user_id")["event_type"].nunique().reindex(agg.index)
        agg["days_since_last"] = (cut_us - agg["last_us"]) // 86_400_000_000
        out = agg.reset_index()[
            ["user_id", "n_events", "n_last_7d", "n_purchases", "n_types", "days_since_last"]
        ]
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out


def feature_snapshot_sql(cutoff: str = "2024-01-25") -> str:
    return f"""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{cutoff}' - INTERVAL 7 DAYS
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_last_7d,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST((epoch_us(TIMESTAMP '{cutoff}') - MAX(epoch_us(ts)))
                    // 86400000000 AS BIGINT) AS days_since_last
        FROM events WHERE ts < TIMESTAMP '{cutoff}'
        GROUP BY user_id ORDER BY user_id
    """


def k_anonymity_check(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Privacy release gate: treating (event_type, day) as the
    quasi-identifier, report per event_type how many QI groups exist,
    how many fall below k distinct users (must be suppressed before
    release), and how many user-rows those suppressed cells cover —
    the k-anonymity audit run before publishing an aggregate cut.
    Distinct (type, day, user) triples reduce in a coarse shard keyed
    on the packed (day, user) int64; per-type partials fold."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "user_id"]
    )

    def pairs(t: pa.Table) -> pa.Table:
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        u = t["user_id"].to_numpy().astype(np.int64)
        if len(u) and (int(u.max()) >= (1 << 31) or int(day.max()) >= (1 << 31)):
            raise ValueError("packing bound exceeded")
        key = (day << np.int64(31)) | u
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(), "key": key})
        df = df.drop_duplicates()
        df["_shard"] = (df["key"] % 64).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["event_type", "key"]).copy()
        g["day"] = g["key"].to_numpy() >> np.int64(31)
        cell = g.groupby(["event_type", "day"]).size().reset_index(name="n_users")
        return cell

    cells = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)["n_users"]
        .sum()
    )
    rows = []
    for ty, g in cells.groupby("event_type"):
        small = g[g["n_users"] < k]
        rows.append((ty, len(g), len(small), int(small["n_users"].sum())))
    out = pd.DataFrame(
        rows, columns=["event_type", "n_cells", "n_suppressed", "suppressed_user_rows"]
    ).sort_values("event_type").reset_index(drop=True)
    for c in ("n_cells", "n_suppressed", "suppressed_user_rows"):
        out[c] = out[c].astype("int64")
    return out


def k_anonymity_check_sql(k: int = 5) -> str:
    return f"""
        WITH cells AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(CASE WHEN n_users < {k} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_suppressed,
               CAST(COALESCE(SUM(n_users) FILTER (WHERE n_users < {k}), 0)
                    AS BIGINT) AS suppressed_user_rows
        FROM cells GROUP BY 1 ORDER BY 1
    """


def embedding_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension profile of the embedding column (the feature-drift
    monitor a vector pipeline runs): count, min/max and sum per
    dimension, all on values quantized to integer millionths so the
    distributed fold is bit-exact and SQL-comparable (float summation
    order would otherwise differ). Vectors unpack zero-copy via the
    list offsets into an [n, d] matrix; per-batch partials are 64
    rows."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        d = len(flat) // max(n, 1)
        m = np.round(flat.astype(np.float64) * 1_000_000).astype(np.int64).reshape(n, d)
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                "n": pa.array(np.full(d, n, dtype=np.int64), pa.int64()),
                "mn": pa.array(m.min(axis=0), pa.int64()),
                "mx": pa.array(m.max(axis=0), pa.int64()),
                "s": pa.array(m.sum(axis=0), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("dim", as_index=False)
        .agg(n_vecs=("n", "sum"), min_q=("mn", "min"), max_q=("mx", "max"), sum_q=("s", "sum"))
        .sort_values("dim")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def embedding_dim_stats_sql() -> str:
    return """
        WITH f AS (
            SELECT CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
                   CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                        AS BIGINT) AS q
            FROM embeddings
        )
        SELECT dim,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(MIN(q) AS BIGINT) AS min_q,
               CAST(MAX(q) AS BIGINT) AS max_q,
               CAST(SUM(q) AS BIGINT) AS sum_q
        FROM f GROUP BY dim ORDER BY dim
    """


def label_centroid_profile(sf_dir: str) -> pd.DataFrame:
    """Inter-label centroid similarity matrix over the embedding table —
    the label-confusion / cluster-separation diagnostic an embedding
    pipeline runs after training. Values quantize to integer
    thousandths so the per-label per-dimension sums (the sufficient
    statistics) fold bit-exactly; the pairwise centroid dot products
    are then pure int64 arithmetic over a [n_labels, d] table that is
    tiny regardless of corpus size — the classic sufficient-statistics
    reduce (same skeleton as embedding_second_moment, grouped by
    label). One streaming pass, no shuffle: each batch emits at most
    n_labels * d partial rows."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        d = len(flat) // max(n, 1)
        q = np.round(flat.astype(np.float64) * 1000.0).astype(np.int64).reshape(n, d)
        lab = t["label"].to_numpy().astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), d), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(ulab)), pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    fold = (
        parts.groupby(["label", "dim"], as_index=False)
        .agg(s=("s", "sum"), n=("n", "sum"))
        .sort_values(["label", "dim"])
    )
    labels = np.sort(fold["label"].unique())
    d = int(fold["dim"].max()) + 1
    S = fold["s"].to_numpy().reshape(len(labels), d)
    N = fold["n"].to_numpy().reshape(len(labels), d)[:, 0]
    dots = S @ S.T
    ia, ib = np.triu_indices(len(labels))
    out = pd.DataFrame(
        {
            "label_a": labels[ia],
            "label_b": labels[ib],
            "n_a": N[ia],
            "n_b": N[ib],
            "dot_q": dots[ia, ib],
        }
    ).sort_values(["label_a", "label_b"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def label_centroid_profile_sql() -> str:
    return """
        WITH f AS (
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
                   CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000)
                        AS BIGINT) AS q
            FROM embeddings
        ), s AS (
            SELECT label, dim, CAST(SUM(q) AS BIGINT) AS sq
            FROM f GROUP BY 1, 2
        ), n AS (
            SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n
            FROM embeddings GROUP BY 1
        )
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
               CAST(SUM(a.sq * b.sq) AS BIGINT) AS dot_q
        FROM s a
        JOIN s b ON a.dim = b.dim AND a.label <= b.label
        JOIN n na ON na.label = a.label
        JOIN n nb ON nb.label = b.label
        GROUP BY 1, 2, 3, 4
        ORDER BY 1, 2
    """


def contract_violations(sf_dir: str) -> pd.DataFrame:
    """Data-contract validation pass over the events table: count, per
    rule, the rows violating the published contract (value within
    [0, 250], ts inside the January window, event_type drawn from the
    allowed enum, the JSON props `k` field at most 89), plus the
    rows-with-any-violation and total-rows-checked lines a data-quality
    gate reports. All rules evaluate row-locally and vectorized; each
    batch emits one six-row partial and only those fold — zero
    shuffle, the cheapest possible full-table audit."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value", "props"]
    )
    allowed = {"click", "view", "purchase", "signup"}
    lo, hi = np.datetime64("2024-01-01"), np.datetime64("2024-01-29")

    def partial(t: pa.Table) -> pa.Table:
        val = t["value"].to_numpy()
        ts = t["ts"].to_numpy()
        ety = t["event_type"].to_pylist()
        k = (
            pd.Series(t["props"].to_pylist())
            .str.extract(r'"k":\s*(-?\d+)', expand=False)
            .astype("int64")
            .to_numpy()
        )
        bad_value = (val < 0.0) | (val > 250.0)
        bad_ts = (ts < lo) | (ts >= hi)
        bad_type = np.array([e not in allowed for e in ety], dtype=bool)
        bad_k = k > 89
        any_bad = bad_value | bad_ts | bad_type | bad_k
        return pa.table(
            {
                "rule": pa.array(
                    ["any_violation", "props_k_max", "rows_checked",
                     "ts_window", "type_enum", "value_range"]
                ),
                "n_bad": pa.array(
                    [int(any_bad.sum()), int(bad_k.sum()), t.num_rows,
                     int(bad_ts.sum()), int(bad_type.sum()), int(bad_value.sum())],
                    pa.int64(),
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("rule", as_index=False)["n_bad"]
        .sum()
        .sort_values("rule")
        .reset_index(drop=True)
    )
    out["n_bad"] = out["n_bad"].astype("int64")
    return out


def contract_violations_sql() -> str:
    return """
        WITH checks AS (
            SELECT (value < 0 OR value > 250) AS bad_value,
                   (ts < TIMESTAMP '2024-01-01'
                    OR ts >= TIMESTAMP '2024-01-29') AS bad_ts,
                   event_type NOT IN ('click', 'view', 'purchase', 'signup')
                       AS bad_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) > 89 AS bad_k
            FROM events
        )
        SELECT rule, n_bad FROM (
            SELECT 'any_violation' AS rule,
                   CAST(SUM(CASE WHEN bad_value OR bad_ts OR bad_type OR bad_k
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
            FROM checks
            UNION ALL
            SELECT 'props_k_max',
                   CAST(SUM(CASE WHEN bad_k THEN 1 ELSE 0 END) AS BIGINT)
            FROM checks
            UNION ALL
            SELECT 'rows_checked', CAST(COUNT(*) AS BIGINT) FROM checks
            UNION ALL
            SELECT 'ts_window',
                   CAST(SUM(CASE WHEN bad_ts THEN 1 ELSE 0 END) AS BIGINT)
            FROM checks
            UNION ALL
            SELECT 'type_enum',
                   CAST(SUM(CASE WHEN bad_type THEN 1 ELSE 0 END) AS BIGINT)
            FROM checks
            UNION ALL
            SELECT 'value_range',
                   CAST(SUM(CASE WHEN bad_value THEN 1 ELSE 0 END) AS BIGINT)
            FROM checks
        ) ORDER BY rule
    """


def customer_order_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: the distribution of customers by how many
    orders they placed, INCLUDING the zero-order customers a plain
    inner join would drop. One custkey-keyed exchange produces
    per-customer order counts; each result block then collapses to
    (order_count, n_customers) histogram partials that fold on the
    driver, and the zero bucket is total customers minus customers
    seen in orders — the LEFT JOIN realized without ever shipping the
    customer table anywhere."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    per_cust = orders.groupby("o_custkey").aggregate(Count(alias_name="c_count"))

    def hist_partial(t: pa.Table) -> pa.Table:
        import numpy as np

        c = t["c_count"].to_numpy().astype(np.int64)
        vals, cnts = np.unique(c, return_counts=True)
        return pa.table(
            {
                "n_orders": pa.array(vals, pa.int64()),
                "n_customers": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    parts = per_cust.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("n_orders", as_index=False)["n_customers"].sum()
    n_total = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    n_with = int(out["n_customers"].sum())
    if n_total > n_with:
        out = pd.concat(
            [pd.DataFrame({"n_orders": [0], "n_customers": [n_total - n_with]}), out],
            ignore_index=True,
        )
    out = out.sort_values("n_orders").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def customer_order_distribution_sql() -> str:
    return """
        SELECT c_count AS n_orders, COUNT(*) AS n_customers
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        )
        GROUP BY c_count ORDER BY n_orders
    """


def nation_pair_trade(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """TPC-H Q7 shape: bilateral trade — discounted revenue per
    (supplier nation, customer nation) pair where the two nations
    DIFFER, over a two-year order window. Same plan skeleton as
    local_supplier_revenue (Q5): supplier->nation and customer->nation
    broadcast maps attach nationkeys inside the scans, the only
    all-to-all is the date-prefiltered lineitem x orders
    hash-partitioned join, and the != colocation predicate plus the
    pair groupby run post-join (pair cardinality <= |nations|^2, so
    the final aggregate is tiny)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    names = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    supp_ref = ray.put(supp)
    cust_ref = ray.put(cust)

    lo = pd.Timestamp("1995-01-01")
    hi = pd.Timestamp("1997-01-01")

    def prep_lineitem(t: pa.Table, *, supp_ref) -> pa.Table:
        supp = ray.get(supp_ref)
        disc = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        left = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "disc_cents": pc.cast(
                    pc.round(disc, round_mode="half_towards_infinity"), pa.int64()
                ),
            }
        )
        j = left.join(supp, keys="l_suppkey", right_keys="s_suppkey", join_type="inner")
        return j.select(["l_orderkey", "s_nationkey", "disc_cents"])

    def prep_orders(t: pa.Table, *, cust_ref) -> pa.Table:
        cust = ray.get(cust_ref)
        mask = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo, type=pa.timestamp("us"))),
            pc.less(t["o_orderdate"], pa.scalar(hi, type=pa.timestamp("us"))),
        )
        t = t.filter(mask)
        j = t.join(cust, keys="o_custkey", right_keys="c_custkey", join_type="inner")
        return j.select(["o_orderkey", "c_nationkey"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(prep_lineitem, batch_format="pyarrow", fn_kwargs={"supp_ref": supp_ref})
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow", fn_kwargs={"cust_ref": cust_ref})

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    names_ref = ray.put(names)

    def finish(t: pa.Table, *, names_ref) -> pa.Table:
        names = ray.get(names_ref)
        t = t.filter(
            pc.not_equal(
                pc.cast(t["s_nationkey"], pa.int32()),
                pc.cast(t["c_nationkey"], pa.int32()),
            )
        )
        sk = t["s_nationkey"].to_pylist()
        ck = t["c_nationkey"].to_pylist()
        return pa.table(
            {
                "supp_nation": pa.array([names[int(k)] for k in sk], pa.string()),
                "cust_nation": pa.array([names[int(k)] for k in ck], pa.string()),
                "disc_cents": t["disc_cents"],
            }
        )

    out = (
        joined.map_batches(finish, batch_format="pyarrow", fn_kwargs={"names_ref": names_ref})
        .groupby(["supp_nation", "cust_nation"])
        .aggregate(Sum("disc_cents", alias_name="revenue_cents"), Count(alias_name="n_items"))
        .to_pandas()
    )
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values(["supp_nation", "cust_nation"]).reset_index(drop=True)


def nation_pair_trade_sql() -> str:
    return """
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        WHERE ns.n_nationkey != nc.n_nationkey
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


def latest_event_per_user(sf_dir: str) -> pd.DataFrame:
    """Log compaction / QUALIFY ROW_NUMBER() = 1: the current state per
    user from the append-only event log — the latest event by (ts,
    event_id) per user_id. Each batch first compacts locally to at most
    one row per user (vectorized lexsort + first-occurrence mask), so
    the user-keyed exchange moves <= |users| rows per block no matter
    how deep the log is; the per-user groupby then repeats the same
    argmax group-locally. This is exactly how a 100-TB CDC log folds to
    a current-state snapshot: partial compaction before the shuffle,
    final compaction inside it."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def compact_pd(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((-df["event_id"].to_numpy(), -df["ts_us"].to_numpy(),
                            df["user_id"].to_numpy()))
        df = df.iloc[order]
        keep = df["user_id"].to_numpy()
        mask = np.ones(len(keep), dtype=bool)
        mask[1:] = keep[1:] != keep[:-1]
        return df[mask]

    def compact(t: pa.Table) -> pd.DataFrame:
        return compact_pd(
            pd.DataFrame(
                {
                    "user_id": t["user_id"].to_numpy(),
                    "ts_us": pc.cast(t["ts"], pa.int64()).to_numpy(),
                    "event_id": t["event_id"].to_numpy(),
                    "event_type": t["event_type"].to_pylist(),
                    "value_cents": _cents(t["value"]).to_numpy(),
                }
            )
        )

    out = (
        ds.map_batches(compact, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(compact_pd, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    out = out[["user_id", "ts_us", "event_id", "event_type", "value_cents"]]
    for c in ("user_id", "ts_us", "event_id", "value_cents"):
        out[c] = out[c].astype("int64")
    return out


def latest_event_per_user_sql() -> str:
    return """
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1 ORDER BY user_id
    """


_NEG_PROBES = 64  # deterministic probe-sequence length cap


def negative_samples(sf_dir: str, k: int = 3, num_partitions: int = 8) -> pd.DataFrame:
    """Recommendation negative sampling: for every customer, the first
    k never-ordered parts along a deterministic probe sequence
    (candidate r = part_ids[md5_u32(custkey:r) % |parts|], r = 0,1,…)
    — rejection sampling with a reproducible pseudo-random stream, so
    the sample is stable across runs and cluster sizes AND the work is
    O(k + rejections) per customer, NOT O(|parts|): a customer touches
    ~k probes regardless of catalog size (an earlier rank-all-parts
    formulation cost 279 s at sf0.1; this runs in ~2 s). Duplicate
    probe hits keep their first occurrence; the probe cap bounds the
    SQL twin (never reached: rejection probability is the customer's
    catalog-interaction share). Interacted pairs come from the
    lineitem x orders hash join reduced per batch; the sampler runs in
    a coarse customer shard with all probe hashes for the shard
    computed in one vectorized md5 lane."""
    import numpy as np

    from pdfrust_ray.functions.md5vec import md5_prefix_u32

    parts_t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    part_ids = np.sort(parts_t["p_partkey"].to_numpy().astype(np.int64))
    parts_ref = ray.put(part_ids)
    cust_t = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    all_cust = np.sort(cust_t["c_custkey"].to_numpy().astype(np.int64))
    cust_ref = ray.put(all_cust)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    n_shards = 64

    def pairs(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "custkey": t["o_custkey"].to_numpy().astype(np.int64),
                "partkey": t["l_partkey"].to_numpy().astype(np.int64),
            }
        ).drop_duplicates()
        df["_shard"] = (df["custkey"] % n_shards).astype("int32")
        return df

    def sample_shard(g: pd.DataFrame, *, parts_ref, cust_ref) -> pd.DataFrame:
        part_ids = ray.get(parts_ref)
        all_cust = ray.get(cust_ref)
        shard_id = int(g["_shard"].iloc[0])
        # every customer of this shard, including zero-interaction ones
        custs = all_cust[all_cust % n_shards == shard_id]
        interacted = set(
            zip(g["custkey"].to_numpy().tolist(), g["partkey"].to_numpy().tolist())
        )
        # all probe hashes for the shard in one vectorized lane:
        # [custs, _NEG_PROBES] candidate part positions
        msgs = [
            f"{c}:{r}".encode()
            for c in custs.tolist()
            for r in range(_NEG_PROBES)
        ]
        pos = (md5_prefix_u32(msgs) % np.uint64(len(part_ids))).astype(np.int64)
        cand = part_ids[pos].reshape(len(custs), _NEG_PROBES)
        rows = []
        for i, c in enumerate(custs.tolist()):
            seen: set[int] = set()
            taken = 0
            for p in cand[i].tolist():
                if p in seen or (c, p) in interacted:
                    continue
                seen.add(p)
                taken += 1
                rows.append((c, taken, p))
                if taken == k:
                    break
        return pd.DataFrame(rows, columns=["custkey", "rank", "partkey"])

    out = (
        joined.map_batches(pairs, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(
            sample_shard,
            batch_format="pandas",
            fn_kwargs={"parts_ref": parts_ref, "cust_ref": cust_ref},
        )
        .to_pandas()
        .sort_values(["custkey", "rank"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def negative_samples_sql(k: int = 3) -> str:
    return f"""
        WITH interacted AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ), plist AS (
            SELECT p_partkey,
                   row_number() OVER (ORDER BY p_partkey) - 1 AS idx
            FROM part
        ), np AS (SELECT COUNT(*) AS n FROM part),
        probes AS (
            SELECT c.c_custkey AS custkey, r.probe,
                   CAST(('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR) || ':' ||
                                        CAST(r.probe AS VARCHAR)), 1, 8))
                        AS UBIGINT) % (SELECT n FROM np) AS idx
            FROM customer c
            CROSS JOIN (SELECT unnest(generate_series(0, {_NEG_PROBES - 1}))
                            AS probe) r
        ), cand AS (
            SELECT pr.custkey, pr.probe, pl.p_partkey AS partkey
            FROM probes pr JOIN plist pl ON pl.idx = pr.idx
            WHERE NOT EXISTS (
                SELECT 1 FROM interacted i
                WHERE i.c = pr.custkey AND i.p = pl.p_partkey
            )
        ), dedup AS (
            SELECT custkey, probe, partkey,
                   row_number() OVER (PARTITION BY custkey, partkey
                                      ORDER BY probe) AS occ
            FROM cand
        ), ranked AS (
            SELECT custkey, partkey,
                   row_number() OVER (PARTITION BY custkey ORDER BY probe) AS rank
            FROM dedup WHERE occ = 1
        )
        SELECT custkey, rank, partkey FROM ranked WHERE rank <= {k}
        ORDER BY custkey, rank
    """


def leave_last_out_split(sf_dir: str) -> pd.DataFrame:
    """Leave-last-out temporal holdout per user — the standard recsys /
    sequence-model evaluation split: each user's latest event (by ts,
    event_id) becomes the test example, everything earlier is train.
    Same two-level compaction as latest_event_per_user, with the train
    count carried alongside the argmax so one pass produces both."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy().astype(np.int64),
                "ts_us": pc.cast(t["ts"], pa.int64()).to_numpy(),
                "event_id": t["event_id"].to_numpy().astype(np.int64),
            }
        )
        order = np.lexsort((-df["event_id"].to_numpy(), -df["ts_us"].to_numpy(),
                            df["user_id"].to_numpy()))
        df = df.iloc[order]
        u = df["user_id"].to_numpy()
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        top = df[first].copy()
        top["n"] = np.diff(np.append(np.nonzero(first)[0], len(u)))
        return top

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((-g["event_id"].to_numpy(), -g["ts_us"].to_numpy()))
        best = g.iloc[order[0]]
        return pd.DataFrame(
            {
                "user_id": [int(best["user_id"])],
                "n_train": [int(g["n"].sum()) - 1],
                "test_event_id": [int(best["event_id"])],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def leave_last_out_split_sql() -> str:
    return """
        SELECT user_id, CAST(cnt - 1 AS BIGINT) AS n_train,
               event_id AS test_event_id
        FROM (
            SELECT user_id, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS cnt
            FROM events
        )
        WHERE rn = 1 ORDER BY user_id
    """


def events_weekly_weekend(sf_dir: str) -> pd.DataFrame:
    """Calendar-dimension rollup: event volume and exact value cents by
    ISO week start and weekday/weekend class — the enrichment every
    BI pipeline does with a date dimension, computed here from pure
    epoch-day arithmetic (no calendar table shipped anywhere). Partial
    fold per batch, one tiny groupby."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        dow = (days + 3) % 7  # epoch day 0 = Thursday; 0 = Monday
        week_start = days - dow
        is_weekend = dow >= 5
        cents = _cents(t["value"]).to_numpy()
        df = pd.DataFrame(
            {"week_day": week_start, "is_weekend": is_weekend, "cents": cents}
        )
        return (
            df.groupby(["week_day", "is_weekend"], as_index=False)
            .agg(n_events=("cents", "size"), sum_value_cents=("cents", "sum"))
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby(["week_day", "is_weekend"], as_index=False)[
            ["n_events", "sum_value_cents"]
        ]
        .sum()
        .sort_values(["week_day", "is_weekend"])
        .reset_index(drop=True)
    )
    out["week_start"] = pd.to_datetime(out.pop("week_day"), unit="D")
    out = out[["week_start", "is_weekend", "n_events", "sum_value_cents"]]
    out["is_weekend"] = out["is_weekend"].astype(bool)
    for c in ("n_events", "sum_value_cents"):
        out[c] = out[c].astype("int64")
    return out


def events_weekly_weekend_sql() -> str:
    return """
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
               (isodow(ts) >= 6) AS is_weekend,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """


def events_grouping_sets(sf_dir: str) -> pd.DataFrame:
    """GROUPING SETS ((type, day), (type), (day), ()) computed from ONE
    finest-grain aggregate — the multi-granularity report pattern: the
    (type, day) partial fold is the only distributed work, and every
    coarser set derives from it driver-side by re-summing the bounded
    lattice (|types| x |days| rows regardless of corpus size). Absent
    dimensions surface as the literal 'ALL' so the result is a single
    well-typed table."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = t["ts"].to_numpy().astype("datetime64[D]")
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "day": np.datetime_as_string(days, unit="D"),
                "cents": _cents(t["value"]).to_numpy(),
            }
        )
        return df.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("cents", "size"), sum_value_cents=("cents", "sum")
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)[["n_events", "sum_value_cents"]]
        .sum()
    )

    def roll(keys: list[str]) -> pd.DataFrame:
        g = fine.copy()
        for k in ("event_type", "day"):
            if k not in keys:
                g[k] = "ALL"
        return g.groupby(["event_type", "day"], as_index=False)[
            ["n_events", "sum_value_cents"]
        ].sum()

    out = pd.concat(
        [roll(["event_type", "day"]), roll(["event_type"]), roll(["day"]), roll([])],
        ignore_index=True,
    ).sort_values(["event_type", "day"]).reset_index(drop=True)
    for c in ("n_events", "sum_value_cents"):
        out[c] = out[c].astype("int64")
    return out


def events_grouping_sets_sql() -> str:
    return """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(strftime(CAST(ts AS DATE), '%Y-%m-%d'), 'ALL') AS day,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events
        GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)),
                                (event_type), (CAST(ts AS DATE)), ())
        ORDER BY 1, 2
    """


def daily_count_anomalies(sf_dir: str) -> pd.DataFrame:
    """Per-type daily-volume anomaly flags at the 2-sigma level, with
    the z-score comparison carried out in EXACT integer arithmetic —
    (x*D - S)^2 > 4*(SS*D - S^2) with D/S/SS the per-type day count,
    count sum and count square-sum — so the distributed fold is
    bit-stable and SQL-comparable (no float mean/stddev op-order). The
    only distributed work is the (type, day) count fold; the flag math
    runs over the bounded type x day lattice."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = t["ts"].to_numpy().astype("datetime64[D]")
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "day": np.datetime_as_string(days, unit="D"),
            }
        )
        return df.groupby(["event_type", "day"], as_index=False).size().rename(
            columns={"size": "n_events"}
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)["n_events"]
        .sum()
    )
    parts = []
    for ty, g in fine.groupby("event_type"):
        x = g["n_events"].to_numpy().astype(np.int64)
        D, S, SS = np.int64(len(x)), x.sum(), (x * x).sum()
        g = g.copy()
        g["is_anomaly"] = (x * D - S) ** 2 > 4 * (SS * D - S * S)
        parts.append(g)
    out = pd.concat(parts, ignore_index=True).sort_values(
        ["event_type", "day"]
    ).reset_index(drop=True)
    out["n_events"] = out["n_events"].astype("int64")
    out["is_anomaly"] = out["is_anomaly"].astype(bool)
    return out


def daily_count_anomalies_sql() -> str:
    return """
        WITH d AS (
            SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ), s AS (
            SELECT *,
                   COUNT(*) OVER (PARTITION BY event_type) AS dd,
                   SUM(n_events) OVER (PARTITION BY event_type) AS ss,
                   SUM(n_events * n_events) OVER (PARTITION BY event_type) AS sq
            FROM d
        )
        SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
               (n_events * dd - ss) * (n_events * dd - ss)
                   > 4 * (sq * dd - ss * ss) AS is_anomaly
        FROM s ORDER BY event_type, day
    """


def type_stats_salted(sf_dir: str, n_salts: int = 32) -> pd.DataFrame:
    """Hot-key aggregation with explicit salting: event_type has a
    handful of values, so at 10^12 rows a plain groupby(event_type)
    funnels everything into |types| reducers. The salt (event_id %
    n_salts) fans each hot key across n_salts reducers; the per-salt
    partials (count, sum, min, max — all mergeable) then fold to the
    true per-type result in a |types| x n_salts driver pass. Result is
    IDENTICAL to the unsalted groupby — the op exists to pin the skew
    pattern with an oracle."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        import numpy as np

        salt = (t["event_id"].to_numpy() % n_salts).astype(np.int64)
        types = t["event_type"].to_pylist()
        return pa.table(
            {
                "skey": pa.array(
                    [f"{ty}|{s}" for ty, s in zip(types, salt)], pa.string()
                ),
                "cents": _cents(t["value"]),
            }
        )

    per_salt = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("skey")
        .aggregate(
            Count(alias_name="n"),
            Sum("cents", alias_name="s"),
            Min("cents", alias_name="mn"),
            Max("cents", alias_name="mx"),
        )
        .to_pandas()
    )
    per_salt["event_type"] = per_salt["skey"].str.split("|").str[0]
    out = (
        per_salt.groupby("event_type", as_index=False)
        .agg(
            n_events=("n", "sum"),
            sum_value_cents=("s", "sum"),
            min_value_cents=("mn", "min"),
            max_value_cents=("mx", "max"),
        )
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in out.columns:
        if c != "event_type":
            out[c] = out[c].astype("int64")
    return out


def type_stats_salted_sql() -> str:
    return """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents,
               CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS min_value_cents,
               CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS max_value_cents
        FROM events GROUP BY event_type ORDER BY event_type
    """


def quarantine_split(sf_dir: str) -> pd.DataFrame:
    """Dead-letter routing: one streaming pass splits events into the
    main output and a quarantine output using the contract_violations
    rules (any rule hit -> quarantine), reporting per destination the
    row count and an order-independent md5-u32 checksum over event_id —
    the split-sink pattern where bad rows are preserved for replay
    instead of dropped. At scale each side writes its own partitioned
    parquet; the checksums prove the split is a partition (no row lost
    or duplicated). Zero shuffle."""
    import hashlib
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value", "props"],
    )
    allowed = {"click", "view", "purchase", "signup"}
    lo, hi = np.datetime64("2024-01-01"), np.datetime64("2024-01-29")

    def partial(t: pa.Table) -> pa.Table:
        val = t["value"].to_numpy()
        ts = t["ts"].to_numpy()
        ety = t["event_type"].to_pylist()
        k = (
            pd.Series(t["props"].to_pylist())
            .str.extract(r'"k":\s*(-?\d+)', expand=False)
            .astype("int64")
            .to_numpy()
        )
        bad = (
            (val < 0.0) | (val > 250.0)
            | (ts < lo) | (ts >= hi)
            | np.array([e not in allowed for e in ety], dtype=bool)
            | (k > 89)
        )
        eids = t["event_id"].to_pylist()
        sums = [0, 0]
        ns = [0, 0]
        for e, b in zip(eids, bad.tolist()):
            h = int.from_bytes(hashlib.md5(str(e).encode()).digest()[:4], "big")
            sums[b] += h
            ns[b] += 1
        return pa.table(
            {
                "dest": pa.array(["main", "quarantine"]),
                "n_rows": pa.array(ns, pa.int64()),
                "checksum": pa.array(sums, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("dest", as_index=False)[["n_rows", "checksum"]]
        .sum()
        .sort_values("dest")
        .reset_index(drop=True)
    )
    for c in ("n_rows", "checksum"):
        out[c] = out[c].astype("int64")
    return out


def quarantine_split_sql() -> str:
    return """
        WITH checks AS (
            SELECT event_id,
                   ((value < 0 OR value > 250)
                    OR ts < TIMESTAMP '2024-01-01'
                    OR ts >= TIMESTAMP '2024-01-29'
                    OR event_type NOT IN ('click', 'view', 'purchase', 'signup')
                    OR CAST(json_extract_string(props, '$.k') AS BIGINT) > 89)
                       AS bad
            FROM events
        )
        SELECT CASE WHEN bad THEN 'quarantine' ELSE 'main' END AS dest,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                             AS UBIGINT)) AS BIGINT) AS checksum
        FROM checks GROUP BY 1 ORDER BY 1
    """


def events_value_zscore(sf_dir: str) -> pd.DataFrame:
    """Feature scaling: global z-score normalization of `value` as the
    canonical two-pass distributed map — pass 1 folds the exact integer
    moments (n, sum_cents, sumsq_cents), pass 2 is an embarrassingly
    parallel normalize with the float finalize pinned to one op order
    (mu = S/n; var = SS/n - mu*mu; z = (x - mu)/sqrt(var)) and the
    result quantized floor(z*1e6 + 0.5) so engine and SQL agree
    bit-for-bit (libm sqrt == DuckDB sqrt, same precedent as
    bigram_lm_scores). Output keeps the event_id grain."""
    import math

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def moments(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy()
        return pa.table(
            {
                "n": pa.array([len(c)], pa.int64()),
                "s": pa.array([int(c.sum())], pa.int64()),
                "ss": pa.array([int((c * c).sum())], pa.int64()),
            }
        )

    m = ds.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n, s, ss = int(m["n"]), int(m["s"]), int(m["ss"])
    mu = s / n
    var = ss / n - mu * mu
    sigma = math.sqrt(var)

    def normalize(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy().astype(np.float64)
        z = (c - mu) / sigma
        return pa.table(
            {
                "event_id": t["event_id"],
                "z_micro": pa.array(
                    np.floor(z * 1_000_000.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    out = ds.map_batches(normalize, batch_format="pyarrow").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def events_value_zscore_sql() -> str:
    return """
        WITH c AS (
            SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(SUM(cents * cents) AS BIGINT) AS ss
            FROM c
        )
        SELECT event_id,
               CAST(FLOOR((CAST(cents AS DOUBLE)
                           - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                          / sqrt(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                                 - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                   * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                          * 1000000 + 0.5) AS BIGINT) AS z_micro
        FROM c, m ORDER BY event_id
    """


def embedding_int8_quantize(sf_dir: str) -> pd.DataFrame:
    """Vector compression prep: symmetric int8 quantization of every
    embedding (code_i = floor(x_i * 127 / max|x| + 0.5), the storage
    format ANN services ship to disk). Entirely row-local — zero
    shuffle at any corpus size. The query surfaces per vector the
    quantization scale in exact micro units plus the code sum and
    absolute-code sum, which pin every code's value against the SQL
    twin without hauling the code arrays through the compare."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def quantize(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(col)
        d = len(flat) // max(n, 1)
        x = flat.reshape(n, d)
        m = np.abs(x).max(axis=1)
        codes = np.floor(x * 127.0 / m[:, None] + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "scale_micro": pa.array(
                    np.floor(m * 1_000_000.0 + 0.5).astype(np.int64), pa.int64()
                ),
                "sum_codes": pa.array(codes.sum(axis=1), pa.int64()),
                "sum_abs_codes": pa.array(np.abs(codes).sum(axis=1), pa.int64()),
            }
        )

    out = ds.map_batches(quantize, batch_format="pyarrow").to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def embedding_int8_quantize_sql() -> str:
    return """
        WITH f AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ), m AS (
            SELECT vec_id, MAX(abs(x)) AS mx FROM f GROUP BY vec_id
        ), codes AS (
            SELECT f.vec_id,
                   CAST(FLOOR(f.x * 127 / m.mx + 0.5) AS BIGINT) AS code,
                   m.mx
            FROM f JOIN m ON f.vec_id = m.vec_id
        )
        SELECT vec_id,
               CAST(FLOOR(ANY_VALUE(mx) * 1000000 + 0.5) AS BIGINT)
                   AS scale_micro,
               CAST(SUM(code) AS BIGINT) AS sum_codes,
               CAST(SUM(abs(code)) AS BIGINT) AS sum_abs_codes
        FROM codes GROUP BY vec_id ORDER BY vec_id
    """


def categorical_encode(sf_dir: str) -> pd.DataFrame:
    """Categorical codebook build + apply: global distinct event_type
    values take stable dense codes (sorted order), then one streaming
    pass encodes the table — the label-encoding step every feature
    pipeline runs before training. The codebook is vocabulary-sized
    (folded via a tiny distinct aggregate, broadcast back); the apply
    emits per-code partials (count + md5-u32 checksum over event_id)
    proving every row got the right code without shipping the encoded
    table through the compare."""
    import hashlib

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])

    def distinct(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"event_type": pd.unique(pd.Series(t["event_type"].to_pylist()))})

    types = sorted(
        ds.map_batches(distinct, batch_format="pyarrow")
        .to_pandas()["event_type"]
        .unique()
        .tolist()
    )
    codebook = {t: i for i, t in enumerate(types)}
    book_ref = ray.put(codebook)

    def encode(t: pa.Table, *, book_ref) -> pd.DataFrame:
        book = ray.get(book_ref)
        rows: dict[int, list[int]] = {}
        for e, ty in zip(t["event_id"].to_pylist(), t["event_type"].to_pylist()):
            h = int.from_bytes(hashlib.md5(str(e).encode()).digest()[:4], "big")
            agg = rows.setdefault(book[ty], [0, 0])
            agg[0] += 1
            agg[1] += h
        return pd.DataFrame(
            {
                "code": pd.Series(list(rows), dtype="int64"),
                "n_events": pd.Series([v[0] for v in rows.values()], dtype="int64"),
                "checksum": pd.Series([v[1] for v in rows.values()], dtype="int64"),
            }
        )

    parts = ds.map_batches(
        encode, batch_format="pyarrow", fn_kwargs={"book_ref": book_ref}
    ).to_pandas()
    out = parts.groupby("code", as_index=False)[["n_events", "checksum"]].sum()
    out["event_type"] = [types[c] for c in out["code"]]
    out = out[["code", "event_type", "n_events", "checksum"]].sort_values("code")
    for c in ("code", "n_events", "checksum"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def categorical_encode_sql() -> str:
    return """
        WITH book AS (
            SELECT event_type,
                   CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS BIGINT)
                       AS code
            FROM (SELECT DISTINCT event_type FROM events)
        )
        SELECT b.code, e.event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
                             AS UBIGINT)) AS BIGINT) AS checksum
        FROM events e JOIN book b USING (event_type)
        GROUP BY 1, 2 ORDER BY 1
    """


def events_keyset_page(sf_dir: str, page_size: int = 50) -> pd.DataFrame:
    """Keyset (cursor) pagination: the page of `page_size` events after
    the cursor in (ts, event_id) order, fetched WITHOUT a global sort
    or OFFSET scan — the cursor predicate pushes into the read, each
    block keeps its local bottom-k, and the driver merges O(blocks*k)
    rows. This is how a 100-TB table serves "next page" in bounded
    work, where OFFSET would re-rank everything before the page."""
    import numpy as np

    cursor = pd.Timestamp("2024-01-15")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def local_page(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].to_numpy()
        keep = ts >= np.datetime64(cursor)
        df = pd.DataFrame(
            {
                "event_id": t["event_id"].to_numpy()[keep],
                "ts_us": ts[keep].astype("datetime64[us]").astype(np.int64),
            }
        )
        return df.sort_values(["ts_us", "event_id"], kind="mergesort").head(page_size)

    out = (
        ds.map_batches(local_page, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["ts_us", "event_id"], kind="mergesort")
        .head(page_size)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out = out[["rank", "event_id", "ts_us"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def events_keyset_page_sql(page_size: int = 50) -> str:
    return f"""
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) AS rank,
               event_id, epoch_us(ts) AS ts_us
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15'
        ORDER BY ts, event_id
        LIMIT {page_size}
    """


def ann_quantized_topk(
    sf_dir: str, query_ids=(0, 1, 2, 3, 4), k: int = 10
) -> pd.DataFrame:
    """Retrieval over QUANTIZED vectors: top-k by the exact int64 dot
    product of thousandth-quantized embeddings — the similarity a
    service computes over its int-compressed storage format (see
    embedding_int8_quantize). Unlike float cosine, the integer scores
    make engine and SQL agree bit-for-bit including every tie. Same
    broadcast-queries + local-top-k + tiny-merge plan as the float
    brute-force scan; zero shuffle."""
    import numpy as np

    query_ids = list(query_ids)
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", query_ids)],
    )
    qid = qt["vec_id"].to_numpy()
    qcol = qt["embedding"].combine_chunks()
    qm = qcol.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    qm = np.round(qm * 1000.0).astype(np.int64).reshape(len(qcol), -1)
    order = {int(v): i for i, v in enumerate(qid)}
    qm = qm[[order[q] for q in query_ids]]
    q_ref = ray.put(qm)

    def local_topk(t: pa.Table, *, q_ref) -> pd.DataFrame:
        q = ray.get(q_ref)
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.round(flat * 1000.0).astype(np.int64).reshape(len(col), -1)
        vid = t["vec_id"].to_numpy().astype(np.int64)
        dots = v @ q.T  # exact int64 [batch, Q]
        frames = []
        for qi in range(dots.shape[1]):
            colv = dots[:, qi]
            idx = np.lexsort((vid, -colv))[: min(k, len(colv))]
            frames.append(
                pd.DataFrame(
                    {"qpos": qi, "vec_id": vid[idx], "dot_q": colv[idx]}
                )
            )
        return pd.concat(frames, ignore_index=True)

    parts = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(local_topk, batch_format="pyarrow", fn_kwargs={"q_ref": q_ref})
        .to_pandas()
    )
    frames = []
    for qi, qv in enumerate(query_ids):
        g = parts[parts["qpos"] == qi].sort_values(
            ["dot_q", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        frames.append(
            pd.DataFrame(
                {
                    "query_id": qv,
                    "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                    "vec_id": g["vec_id"],
                    "dot_q": g["dot_q"],
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def ann_quantized_topk_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10) -> str:
    ids = ", ".join(str(q) for q in query_ids)
    return f"""
        WITH f AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                   CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000)
                        AS BIGINT) AS q
            FROM embeddings
        ), qv AS (
            SELECT vec_id AS query_id, dim, q FROM f WHERE vec_id IN ({ids})
        ), s AS (
            SELECT qv.query_id, f.vec_id, CAST(SUM(f.q * qv.q) AS BIGINT) AS dot_q
            FROM f JOIN qv ON f.dim = qv.dim
            GROUP BY 1, 2
        ), r AS (
            SELECT query_id, vec_id, dot_q,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot_q DESC, vec_id) AS rank
            FROM s
        )
        SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, dot_q
        FROM r WHERE rank <= {k} ORDER BY query_id, rank
    """


def returned_order_priority_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders have AT
    LEAST ONE returned lineitem — the big x big EXISTS semi-join. The
    probe side never joins row-for-row: the filtered lineitem scan
    reduces to DISTINCT orderkeys inside a coarse shard (the exchange
    carries keys once each, not one row per matching lineitem), the
    distinct key set is small relative to lineitem, and the orders
    scan joins against it per batch. Counts then fold per priority."""
    import numpy as np

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )

    def keys(t: pa.Table) -> pd.DataFrame:
        mask = pc.equal(t["l_returnflag"], "R")
        ok = t.filter(mask)["l_orderkey"].to_numpy().astype(np.int64)
        df = pd.DataFrame({"l_orderkey": np.unique(ok)})
        df["_shard"] = (df["l_orderkey"] % 64).astype("int32")
        return df

    def shard_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g[["l_orderkey"]].drop_duplicates()

    returned = (
        li.map_batches(keys, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_distinct, batch_format="pandas")
        .to_pandas()["l_orderkey"]
        .to_numpy()
    )
    keyset_ref = ray.put(np.sort(returned))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def count_partial(t: pa.Table, *, keyset_ref) -> pd.DataFrame:
        ks = ray.get(keyset_ref)
        ok = t["o_orderkey"].to_numpy().astype(np.int64)
        hit = ks[np.searchsorted(ks, ok).clip(max=len(ks) - 1)] == ok if len(ks) else np.zeros(len(ok), bool)
        df = pd.DataFrame({"o_orderpriority": t["o_orderpriority"].to_pylist(), "hit": hit})
        df = df[df["hit"]]
        return df.groupby("o_orderpriority", as_index=False).size().rename(
            columns={"size": "n_orders"}
        )

    parts = orders.map_batches(
        count_partial, batch_format="pyarrow", fn_kwargs={"keyset_ref": keyset_ref}
    ).to_pandas()
    out = (
        parts.groupby("o_orderpriority", as_index=False)["n_orders"]
        .sum()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def returned_order_priority_counts_sql() -> str:
    return """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
        )
        GROUP BY 1 ORDER BY 1
    """


def promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: per order-month, the share of discounted
    revenue coming from PROMO-type parts, in exact integer ppm. The
    part type map is dimension-sized and broadcast into the lineitem
    scan (is_promo becomes a bit before any exchange); lineitem joins
    orders on the hash-partitioned big x big path for the order month;
    per-month (promo_cents, total_cents) partials fold."""
    import numpy as np

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    promo = dict(
        zip(
            part["p_partkey"].to_pylist(),
            [t == "PROMO" for t in part["p_type"].to_pylist()],
        )
    )
    promo_ref = ray.put(promo)

    def prep_li(t: pa.Table, *, promo_ref) -> pa.Table:
        promo = ray.get(promo_ref)
        disc = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "is_promo": pa.array(
                    [promo[int(k)] for k in t["l_partkey"].to_pylist()], pa.bool_()
                ),
                "disc_cents": pc.cast(
                    pc.round(disc, round_mode="half_towards_infinity"), pa.int64()
                ),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(prep_li, batch_format="pyarrow", fn_kwargs={"promo_ref": promo_ref})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def prep_orders(t: pa.Table) -> pa.Table:
        import numpy as np

        d = t["o_orderdate"].to_numpy().astype("datetime64[M]")
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "month": pa.array(np.datetime_as_string(d, unit="M"), pa.string()),
            }
        )

    joined = li.join(
        orders.map_batches(prep_orders, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        promo_mask = t["is_promo"].to_numpy(zero_copy_only=False)
        cents = t["disc_cents"].to_numpy()
        df = pd.DataFrame(
            {
                "month": t["month"].to_pylist(),
                "pc": np.where(promo_mask, cents, 0),
                "tc": cents,
            }
        )
        return df.groupby("month", as_index=False).agg(
            promo_cents=("pc", "sum"), total_cents=("tc", "sum")
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("month", as_index=False)[["promo_cents", "total_cents"]].sum()
    out["promo_ppm"] = (
        out["promo_cents"].to_numpy().astype(np.int64) * 1_000_000
        // out["total_cents"].to_numpy().astype(np.int64)
    )
    out = out.sort_values("month").reset_index(drop=True)
    for c in ("promo_cents", "total_cents", "promo_ppm"):
        out[c] = out[c].astype("int64")
    return out


def promo_revenue_share_sql() -> str:
    return """
        SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
               CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                             * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS promo_cents,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS total_cents,
               CAST((SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                              * 100) AS BIGINT)
                              ELSE 0 END) * 1000000)
                    // SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                                AS BIGINT)) AS BIGINT) AS promo_ppm
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1 ORDER BY 1
    """


def value_drift_psi(sf_dir: str, n_bands: int = 10, band_cents: int = 5000) -> pd.DataFrame:
    """Population Stability Index between the first-week reference
    window and the rest of the stream — the feature-drift monitor for
    a deployed model. Values band into fixed 50-dollar buckets (last
    band open-ended); per band the PSI term
    (p - q) * ln(p / q) quantizes to micro-nats with the float ops in
    one pinned order (libm ln == DuckDB ln, the bigram_lm precedent).
    One bounded (band, window) count fold; zero shuffle."""
    import math

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    split = np.datetime64("2024-01-08")

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = _cents(t["value"]).to_numpy()
        band = np.minimum(cents // band_cents, n_bands - 1)
        ref = t["ts"].to_numpy() < split
        df = pd.DataFrame({"band": band, "is_ref": ref})
        return df.groupby(["band", "is_ref"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    fold = parts.groupby(["band", "is_ref"], as_index=False)["n"].sum()
    ref_n = {int(r["band"]): int(r["n"]) for _, r in fold[fold["is_ref"]].iterrows()}
    cur_n = {int(r["band"]): int(r["n"]) for _, r in fold[~fold["is_ref"]].iterrows()}
    ref_total = sum(ref_n.values())
    cur_total = sum(cur_n.values())
    rows = []
    for band in sorted(set(ref_n) | set(cur_n)):
        nr, nc = ref_n.get(band, 0), cur_n.get(band, 0)
        if nr == 0 or nc == 0:
            term = 0  # degenerate band: PSI undefined, reported as 0
        else:
            p = nr / ref_total
            q = nc / cur_total
            term = math.floor((p - q) * math.log(p / q) * 1_000_000 + 0.5)
        rows.append((band, nr, nc, term))
    out = pd.DataFrame(rows, columns=["band", "n_ref", "n_cur", "psi_term_micro"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def value_drift_psi_sql(n_bands: int = 10, band_cents: int = 5000) -> str:
    return f"""
        WITH b AS (
            SELECT LEAST(CAST(ROUND(value * 100) AS BIGINT) // {band_cents},
                         {n_bands - 1}) AS band,
                   (ts < TIMESTAMP '2024-01-08') AS is_ref
            FROM events
        ), f AS (
            SELECT band,
                   CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
                   CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
            FROM b GROUP BY band
        ), t AS (
            SELECT SUM(n_ref) AS rt, SUM(n_cur) AS ct FROM f
        )
        SELECT band, n_ref, n_cur,
               CASE WHEN n_ref = 0 OR n_cur = 0 THEN 0
                    ELSE CAST(FLOOR((CAST(n_ref AS DOUBLE) / t.rt
                                     - CAST(n_cur AS DOUBLE) / t.ct)
                                    * ln((CAST(n_ref AS DOUBLE) / t.rt)
                                         / (CAST(n_cur AS DOUBLE) / t.ct))
                                    * 1000000 + 0.5) AS BIGINT) END
                   AS psi_term_micro
        FROM f, t ORDER BY band
    """


def pseudonymize_users(sf_dir: str, salt: str = "pepper-v1") -> pd.DataFrame:
    """Keyed pseudonymization: replace user_id with a salted-hash token
    (md5(salt:id) prefix) — the GDPR-grade de-identification that
    PRESERVES joinability: the same user always maps to the same token,
    so grouped analytics survive the rename. The proof surfaced here:
    per-pseudonym event counts, which must be a bijective relabeling of
    the per-user counts. Hashing is row-local; the only exchange is the
    pseudonym-cardinality count fold."""
    import hashlib

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        tokens = [
            hashlib.md5(f"{salt}:{u}".encode()).hexdigest()[:16]
            for u in t["user_id"].to_pylist()
        ]
        vc = pd.Series(tokens).value_counts()
        return pd.DataFrame({"pseudonym": vc.index, "n": vc.to_numpy().astype("int64")})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("pseudonym", as_index=False)["n"]
        .sum()
        .rename(columns={"n": "n_events"})
        .sort_values("pseudonym")
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out


def pseudonymize_users_sql(salt: str = "pepper-v1") -> str:
    return f"""
        SELECT substr(md5('{salt}:' || CAST(user_id AS VARCHAR)), 1, 16)
                   AS pseudonym,
               COUNT(*) AS n_events
        FROM events GROUP BY 1 ORDER BY 1
    """


def type_value_similarity(sf_dir: str, n_bands: int = 10, band_cents: int = 5000) -> pd.DataFrame:
    """Distribution-similarity matrix across event types: pairwise
    histogram intersection sum(min(p_a, p_b)) over fixed value bands,
    in integer ppm with the min taken by exact cross-multiplied
    rational comparison (min(n_a/N_a, n_b/N_b) picked via
    n_a*N_b <=> n_b*N_a) and a single truncating division per term —
    zero float ops anywhere, so the fold is bit-stable at any scale.
    One bounded (type, band) count fold feeds the |types|^2 finalize."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = _cents(t["value"]).to_numpy()
        band = np.minimum(cents // band_cents, n_bands - 1)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(), "band": band})
        return df.groupby(["event_type", "band"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    fold = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "band"], as_index=False)["n"]
        .sum()
    )
    types = sorted(fold["event_type"].unique())
    counts = {
        ty: {int(r["band"]): int(r["n"]) for _, r in g.iterrows()}
        for ty, g in fold.groupby("event_type")
    }
    totals = {ty: sum(c.values()) for ty, c in counts.items()}
    rows = []
    for i, a in enumerate(types):
        for b in types[i:]:
            na, nb = totals[a], totals[b]
            inter = 0
            for band in range(n_bands):
                ca, cb = counts[a].get(band, 0), counts[b].get(band, 0)
                # min(ca/na, cb/nb) in ppm, exact rational compare
                if ca * nb <= cb * na:
                    inter += ca * 1_000_000 // na
                else:
                    inter += cb * 1_000_000 // nb
            rows.append((a, b, na, nb, inter))
    out = pd.DataFrame(
        rows, columns=["type_a", "type_b", "n_a", "n_b", "intersection_ppm"]
    ).sort_values(["type_a", "type_b"]).reset_index(drop=True)
    for c in ("n_a", "n_b", "intersection_ppm"):
        out[c] = out[c].astype("int64")
    return out


def type_value_similarity_sql(n_bands: int = 10, band_cents: int = 5000) -> str:
    return f"""
        WITH f AS (
            SELECT event_type,
                   LEAST(CAST(ROUND(value * 100) AS BIGINT) // {band_cents},
                         {n_bands - 1}) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), tot AS (
            SELECT event_type, CAST(SUM(n) AS BIGINT) AS total
            FROM f GROUP BY 1
        ), bands AS (
            SELECT DISTINCT band FROM f
        ), grid AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   a.total AS n_a, b.total AS n_b, bands.band
            FROM tot a JOIN tot b ON a.event_type <= b.event_type
            CROSS JOIN bands
        ), terms AS (
            SELECT g.type_a, g.type_b, g.n_a, g.n_b,
                   COALESCE(fa.n, 0) AS ca, COALESCE(fb.n, 0) AS cb
            FROM grid g
            LEFT JOIN f fa ON fa.event_type = g.type_a AND fa.band = g.band
            LEFT JOIN f fb ON fb.event_type = g.type_b AND fb.band = g.band
        )
        SELECT type_a, type_b, n_a, n_b,
               CAST(SUM(CASE WHEN ca * n_b <= cb * n_a
                             THEN ca * 1000000 // n_a
                             ELSE cb * 1000000 // n_b END) AS BIGINT)
                   AS intersection_ppm
        FROM terms GROUP BY 1, 2, 3, 4 ORDER BY 1, 2
    """


def returned_customer_revenue(sf_dir: str, k: int = 20, num_partitions: int = 8) -> pd.DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned
    items in a half-year window. The returned-lineitem scan joins
    orders on the hash-partitioned path (both sides pre-filtered), the
    per-customer revenue folds through a custkey groupby, and only the
    top-k by (revenue desc, custkey) leave via the mergeable top-k
    merge; customer names attach to just those k rows from the
    broadcast dimension."""
    import numpy as np

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    names = dict(zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist()))

    lo = pd.Timestamp("1995-01-01")
    hi = pd.Timestamp("1995-07-01")

    def prep_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        disc = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "disc_cents": pc.cast(
                    pc.round(disc, round_mode="half_towards_infinity"), pa.int64()
                ),
            }
        )

    def prep_orders(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo, type=pa.timestamp("us"))),
            pc.less(t["o_orderdate"], pa.scalar(hi, type=pa.timestamp("us"))),
        )
        t = t.filter(mask)
        return t.select(["o_orderkey", "o_custkey"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(prep_li, batch_format="pyarrow")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_cust = joined.groupby("o_custkey").aggregate(
        Sum("disc_cents", alias_name="revenue_cents")
    )

    def local_topk(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "custkey": t["o_custkey"].to_numpy(),
                "revenue_cents": t["revenue_cents"].to_numpy(),
            }
        )
        return df.sort_values(
            ["revenue_cents", "custkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    out = (
        per_cust.map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["revenue_cents", "custkey"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    out["c_name"] = [names[int(c)] for c in out["custkey"]]
    out = out[["custkey", "c_name", "revenue_cents"]]
    for c in ("custkey", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out


def returned_customer_revenue_sql(k: int = 20) -> str:
    return f"""
        SELECT CAST(o.o_custkey AS BIGINT) AS custkey,
               ANY_VALUE(c.c_name) AS c_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1995-07-01'
        GROUP BY o.o_custkey
        ORDER BY revenue_cents DESC, custkey
        LIMIT {k}
    """


def large_order_customers(sf_dir: str, min_qty: int = 300, num_partitions: int = 8) -> pd.DataFrame:
    """TPC-H Q18 shape: orders whose TOTAL lineitem quantity exceeds a
    threshold, with their customer — the HAVING-on-big-aggregate
    feeding a join. Per-order quantity folds through an orderkey
    groupby (single-key, so the aggregate output joins cleanly in ray
    2.49 — the multi-key-aggregate join hazard documented in
    stages/shard.py does not apply); the surviving order set is tiny
    and joins orders via an Arrow hash join per batch."""
    import numpy as np

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    per_order = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("qty", alias_name="total_qty"))
    )

    def keep_big(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["total_qty"], pa.scalar(min_qty)))

    big = per_order.map_batches(keep_big, batch_format="pyarrow").to_pandas()
    big = big.sort_values("l_orderkey")
    big_keys = big["l_orderkey"].to_numpy().astype(np.int64)
    big_qty = big["total_qty"].to_numpy().astype(np.int64)
    keys_ref = ray.put((big_keys, big_qty))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def attach(t: pa.Table, *, keys_ref) -> pd.DataFrame:
        keys, qty = ray.get(keys_ref)
        ok = t["o_orderkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, ok).clip(max=max(len(keys) - 1, 0))
        mask = (keys[pos] == ok) if len(keys) else np.zeros(len(ok), bool)
        sub = t.filter(pa.array(mask))
        return pd.DataFrame(
            {
                "o_orderkey": sub["o_orderkey"].to_numpy(),
                "o_custkey": sub["o_custkey"].to_numpy(),
                "price_cents": _cents(sub["o_totalprice"]).to_numpy(),
                "total_qty": qty[pos[mask]],
            }
        )

    out = (
        orders.map_batches(attach, batch_format="pyarrow", fn_kwargs={"keys_ref": keys_ref})
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def large_order_customers_sql(min_qty: int = 300) -> str:
    return f"""
        SELECT o.o_orderkey, CAST(o.o_custkey AS BIGINT) AS o_custkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents,
               big.total_qty
        FROM orders o
        JOIN (
            SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS total_qty
            FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > {min_qty}
        ) big ON big.l_orderkey = o.o_orderkey
        ORDER BY o.o_orderkey
    """


def orders_yearly_growth(sf_dir: str) -> pd.DataFrame:
    """Year-over-year revenue growth across the multi-year orders
    history (the annual-report rollup): yearly exact cents totals from
    a bounded fold, YoY delta in exact integer ppm with truncating
    division (the dod_growth convention at year grain)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        years = t["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64) + 1970
        df = pd.DataFrame({"year": years, "cents": _cents(t["o_totalprice"]).to_numpy()})
        return df.groupby("year", as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum")
        )

    fold = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("year", as_index=False)[["n_orders", "revenue_cents"]]
        .sum()
        .sort_values("year")
        .reset_index(drop=True)
    )
    prev = fold["revenue_cents"].shift(1)
    growth = np.zeros(len(fold), dtype=np.int64)
    mask = prev.notna().to_numpy()
    num = (
        fold.loc[mask, "revenue_cents"].to_numpy() - prev[mask].to_numpy().astype(np.int64)
    ) * 1_000_000
    den = prev[mask].to_numpy().astype(np.int64)
    # DuckDB's // truncates toward zero; numpy floors — match DuckDB
    growth[mask] = np.sign(num) * (np.abs(num) // den)
    fold["yoy_growth_ppm"] = growth
    for c in fold.columns:
        fold[c] = fold[c].astype("int64")
    return fold


def orders_yearly_growth_sql() -> str:
    return """
        WITH y AS (
            SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM orders GROUP BY 1
        )
        SELECT CAST(year AS BIGINT) AS year, n_orders, revenue_cents,
               CASE WHEN LAG(revenue_cents) OVER (ORDER BY year) IS NULL THEN 0
                    ELSE CAST(((revenue_cents - LAG(revenue_cents) OVER (ORDER BY year))
                               * 1000000)
                              // LAG(revenue_cents) OVER (ORDER BY year) AS BIGINT)
               END AS yoy_growth_ppm
        FROM y ORDER BY year
    """


def embedding_label_outliers(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Embedding anomaly detection: per label, the k vectors LEAST
    aligned with their own label centroid — score = exclusive integer
    dot dot_q(v, S_label) - dot_q(v, v) over thousandth-quantized
    values, so 'least aligned' is exact arithmetic with deterministic
    ties (score asc, vec_id asc). One streaming pass builds the
    per-label dim sums (same sufficient-statistics fold as
    label_centroid_profile); a second embarrassingly parallel pass
    scores every vector against the broadcast [L, d] sum matrix and
    keeps local bottom-k per label; the driver merges O(blocks*L*k)
    rows."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"])

    def sums_partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        d = len(flat) // max(n, 1)
        q = np.round(flat.astype(np.float64) * 1000.0).astype(np.int64).reshape(n, d)
        lab = t["label"].to_numpy().astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), d), dtype=np.int64)
        np.add.at(sums, inv, q)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(ulab)), pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
            }
        )

    fold = (
        ds.map_batches(sums_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["label", "dim"], as_index=False)["s"]
        .sum()
        .sort_values(["label", "dim"])
    )
    labels = np.sort(fold["label"].unique())
    d = int(fold["dim"].max()) + 1
    S = fold["s"].to_numpy().reshape(len(labels), d)
    lab_pos = {int(l): i for i, l in enumerate(labels)}
    S_ref = ray.put((S, lab_pos))

    def score(t: pa.Table, *, S_ref) -> pd.DataFrame:
        S, lab_pos = ray.get(S_ref)
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        dd = len(flat) // max(n, 1)
        q = np.round(flat.astype(np.float64) * 1000.0).astype(np.int64).reshape(n, dd)
        lab = t["label"].to_numpy().astype(np.int64)
        rows_S = S[[lab_pos[int(x)] for x in lab]]
        excl = (q * rows_S).sum(axis=1) - (q * q).sum(axis=1)
        df = pd.DataFrame(
            {
                "label": lab,
                "vec_id": t["vec_id"].to_numpy().astype(np.int64),
                "score_q": excl,
            }
        )
        return (
            df.sort_values(["label", "score_q", "vec_id"], kind="mergesort")
            .groupby("label", as_index=False)
            .head(k)
        )

    parts = ds.map_batches(score, batch_format="pyarrow", fn_kwargs={"S_ref": S_ref}).to_pandas()
    frames = []
    for lab, g in parts.groupby("label"):
        g = g.sort_values(["score_q", "vec_id"], kind="mergesort").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        frames.append(g)
    out = pd.concat(frames, ignore_index=True)[["label", "rank", "vec_id", "score_q"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["label", "rank"]).reset_index(drop=True)


def embedding_label_outliers_sql(k: int = 3) -> str:
    return f"""
        WITH f AS (
            SELECT vec_id, CAST(label AS BIGINT) AS label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
                   CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000)
                        AS BIGINT) AS q
            FROM embeddings
        ), s AS (
            SELECT label, dim, CAST(SUM(q) AS BIGINT) AS sq FROM f GROUP BY 1, 2
        ), scored AS (
            SELECT f.vec_id, f.label,
                   CAST(SUM(f.q * s.sq) - SUM(f.q * f.q) AS BIGINT) AS score_q
            FROM f JOIN s ON f.label = s.label AND f.dim = s.dim
            GROUP BY 1, 2
        ), ranked AS (
            SELECT label, vec_id, score_q,
                   row_number() OVER (PARTITION BY label
                                      ORDER BY score_q, vec_id) AS rank
            FROM scored
        )
        SELECT label, CAST(rank AS BIGINT) AS rank, vec_id, score_q
        FROM ranked WHERE rank <= {k} ORDER BY label, rank
    """


def supplier_part_coverage(sf_dir: str) -> pd.DataFrame:
    """Catalog coverage per supplier: how many distinct parts each
    supplier has actually shipped and that count as an exact
    parts-per-million share of the catalog. Distinct (suppkey,
    partkey) pairs reduce on a PACKED single int64 key inside a coarse
    shard (the ray-2.49 multi-key-aggregate pattern documented in
    stages/shard.py); per-supplier counts fold from the deduped
    pairs."""
    import numpy as np

    n_parts = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        p = t["l_partkey"].to_numpy().astype(np.int64)
        if len(s) and (int(s.max()) >= (1 << 31) or int(p.max()) >= (1 << 31)):
            raise ValueError("packing bound exceeded")
        key = (s << np.int64(31)) | p
        df = pd.DataFrame({"key": np.unique(key)})
        df["_shard"] = (df["key"] % 64).astype("int32")
        return df

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(g["key"].to_numpy())
        supp = keys >> np.int64(31)
        vc = pd.Series(supp).value_counts()
        return pd.DataFrame(
            {"suppkey": vc.index.astype("int64"), "n_parts": vc.to_numpy().astype("int64")}
        )

    parts = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
        .to_pandas()
        .groupby("suppkey", as_index=False)["n_parts"]
        .sum()
        .sort_values("suppkey")
        .reset_index(drop=True)
    )
    parts["coverage_ppm"] = parts["n_parts"] * 1_000_000 // n_parts
    for c in parts.columns:
        parts[c] = parts[c].astype("int64")
    return parts


def supplier_part_coverage_sql() -> str:
    return """
        WITH np AS (SELECT COUNT(*) AS n FROM part)
        SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT l_partkey) * 1000000 // (SELECT n FROM np)
                    AS BIGINT) AS coverage_ppm
        FROM lineitem GROUP BY 1 ORDER BY 1
    """


def dow_type_lift(sf_dir: str) -> pd.DataFrame:
    """Independence-lift table for (day-of-week, event_type): observed
    count vs the independence expectation, as exact integer ppm
    (n_obs * N * 1e6 // (n_dow * n_type)) — the affinity diagnostic
    behind 'do purchases skew to weekends'. One bounded (dow, type)
    fold; the lift finalize runs over the 7 x |types| lattice."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        dow = (days + 3) % 7  # 0 = Monday (matches isodow - 1)
        df = pd.DataFrame({"dow": dow, "event_type": t["event_type"].to_pylist()})
        return df.groupby(["dow", "event_type"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    fold = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["dow", "event_type"], as_index=False)["n"]
        .sum()
    )
    N = int(fold["n"].sum())
    n_dow = fold.groupby("dow")["n"].sum()
    n_type = fold.groupby("event_type")["n"].sum()
    fold["lift_ppm"] = [
        int(n) * N * 1_000_000 // (int(n_dow[d]) * int(n_type[t]))
        for d, t, n in zip(fold["dow"], fold["event_type"], fold["n"])
    ]
    out = fold.rename(columns={"n": "n_events"}).sort_values(
        ["dow", "event_type"]
    ).reset_index(drop=True)
    for c in ("dow", "n_events", "lift_ppm"):
        out[c] = out[c].astype("int64")
    return out[["dow", "event_type", "n_events", "lift_ppm"]]


def dow_type_lift_sql() -> str:
    return """
        WITH f AS (
            SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ), m AS (
            SELECT SUM(n_events) AS total FROM f
        ), d AS (
            SELECT dow, SUM(n_events) AS nd FROM f GROUP BY 1
        ), t AS (
            SELECT event_type, SUM(n_events) AS nt FROM f GROUP BY 1
        )
        SELECT f.dow, f.event_type, f.n_events,
               CAST(f.n_events * m.total * 1000000 // (d.nd * t.nt) AS BIGINT)
                   AS lift_ppm
        FROM f, m
        JOIN d ON d.dow = f.dow
        JOIN t ON t.event_type = f.event_type
        ORDER BY f.dow, f.event_type
    """


def shuffle_integrity(sf_dir: str, seed: int = 42) -> pd.DataFrame:
    """Dataset.random_shuffle exercised under a content invariant: a
    full seeded shuffle of events followed by the per-type count +
    value checksum, which must equal the unshuffled table's — the
    sanity gate a training pipeline runs after its epoch shuffle
    (shuffles move EVERY block; a lost or duplicated row here means a
    corrupted epoch). The result is order-independent by construction,
    so it is deterministic even though the row order is not."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).random_shuffle(seed=seed)

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = _cents(t["value"]).to_numpy()
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(), "cents": cents})
        return df.groupby("event_type", as_index=False).agg(
            n_events=("cents", "size"), sum_value_cents=("cents", "sum")
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type", as_index=False)[["n_events", "sum_value_cents"]]
        .sum()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("n_events", "sum_value_cents"):
        out[c] = out[c].astype("int64")
    return out


def shuffle_integrity_sql() -> str:
    return """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events GROUP BY 1 ORDER BY 1
    """


def multisource_events_union(sf_dir: str) -> pd.DataFrame:
    """Cross-format federation: the parquet HALF of events (event_id %
    2 = 0, filtered at scan) unioned with the CSV-ingested half
    (event_id % 2 = 1 from the CSV shard mirror), reduced to the
    per-type count + checksum — which must equal the single-source
    table's, proving the format boundary introduces no drift. The CSV
    side reuses the read_events_csv source (schema cast at ingest);
    Dataset.union concatenates the two streams without a shuffle."""
    import numpy as np

    from pdfrust_ray.sources.tabular import read_events_csv

    pq_side = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"])
    csv_side = read_events_csv(sf_dir)

    def even_half(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["event_id"], pa.scalar(1)), pa.scalar(0)))
        return t.select(["event_id", "event_type", "value"])

    def odd_half(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["event_id"], pa.scalar(1)), pa.scalar(1)))
        return t.select(["event_id", "event_type", "value"])

    u = pq_side.map_batches(even_half, batch_format="pyarrow").union(
        csv_side.map_batches(odd_half, batch_format="pyarrow")
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        import hashlib

        cents = _cents(t["value"]).to_numpy()
        chk = np.fromiter(
            (
                int.from_bytes(hashlib.md5(f"{e}|{c}".encode()).digest()[:4], "big")
                for e, c in zip(t["event_id"].to_pylist(), cents.tolist())
            ),
            dtype=np.int64,
            count=len(cents),
        )
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(), "chk": chk})
        return df.groupby("event_type", as_index=False).agg(
            n_events=("chk", "size"), checksum=("chk", "sum")
        )

    out = (
        u.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type", as_index=False)[["n_events", "checksum"]]
        .sum()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("n_events", "checksum"):
        out[c] = out[c].astype("int64")
    return out


def multisource_events_union_sql() -> str:
    return """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '|' ||
                    CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)), 1, 8))
                             AS UBIGINT)) AS BIGINT) AS checksum
        FROM events GROUP BY 1 ORDER BY 1
    """


def top_value_events_with_ties(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """RANK()-semantics top-k per event type: every event whose rank by
    (value desc) is <= k INCLUDING ties — the window variant where a
    tie at the boundary keeps all peers (ROW_NUMBER would cut
    arbitrarily). Values quantize to cents so tie detection is exact.
    Per-batch local candidates keep everything tied with their k-th
    best (safe over-approximation); the per-type finalize applies true
    RANK over the tiny candidate set."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def local_cands(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "event_id": t["event_id"].to_numpy(),
                "cents": _cents(t["value"]).to_numpy(),
            }
        )
        keep = []
        for ty, g in df.groupby("event_type"):
            vals = np.sort(g["cents"].unique())[::-1]
            cut = vals[min(k, len(vals)) - 1]
            keep.append(g[g["cents"] >= cut])
        return pd.concat(keep, ignore_index=True)

    cands = ds.map_batches(local_cands, batch_format="pyarrow").to_pandas()
    frames = []
    for ty, g in cands.groupby("event_type"):
        vals = np.sort(g["cents"].unique())[::-1]
        cut = vals[min(k, len(vals)) - 1]
        g = g[g["cents"] >= cut].copy()
        # dense set of distinct values above the cut defines RANK
        rank_of = {v: i + 1 for i, v in enumerate(np.sort(g["cents"].unique())[::-1])}
        # RANK (not DENSE_RANK): 1 + count of strictly-greater rows
        greater = g["cents"].to_numpy()[:, None] < g["cents"].to_numpy()[None, :]
        g["rank"] = 1 + greater.sum(axis=1)
        g = g[g["rank"] <= k]
        frames.append(g)
    out = (
        pd.concat(frames, ignore_index=True)[["event_type", "rank", "event_id", "cents"]]
        .rename(columns={"cents": "value_cents"})
        .sort_values(["event_type", "rank", "event_id"])
        .reset_index(drop=True)
    )
    for c in ("rank", "event_id", "value_cents"):
        out[c] = out[c].astype("int64")
    return out


def top_value_events_with_ties_sql(k: int = 3) -> str:
    return f"""
        SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id,
               value_cents
        FROM (
            SELECT event_type, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
                   RANK() OVER (PARTITION BY event_type
                                ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC)
                       AS rank
            FROM events
        )
        WHERE rank <= {k}
        ORDER BY event_type, rank, event_id
    """


def hourly_profile(sf_dir: str) -> pd.DataFrame:
    """Hour-of-day activity profile (the diurnal curve): event count
    and exact value cents per clock hour 0-23, folded from per-batch
    partials over the bounded 24-row lattice — zero shuffle."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        hour = (us // 3_600_000_000) % 24
        df = pd.DataFrame({"hour": hour, "cents": _cents(t["value"]).to_numpy()})
        return df.groupby("hour", as_index=False).agg(
            n_events=("cents", "size"), sum_value_cents=("cents", "sum")
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("hour", as_index=False)[["n_events", "sum_value_cents"]]
        .sum()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def hourly_profile_sql() -> str:
    return """
        SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events GROUP BY 1 ORDER BY 1
    """


def rolling_count_anomalies(sf_dir: str, window: int = 7) -> pd.DataFrame:
    """Trailing-window volume anomaly flags: per event type, each day
    compared against its OWN trailing `window`-day statistics (frame =
    the last `window` observed days including today) — the adaptive
    variant of daily_count_anomalies for drifting baselines. Same
    exact-integer 2-sigma test, (x*W - S)^2 > 4*(SS*W - S^2), computed
    over cumulative sums on the bounded per-type day lattice; the only
    distributed work is the (type, day) count fold."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = t["ts"].to_numpy().astype("datetime64[D]")
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "day": np.datetime_as_string(days, unit="D"),
            }
        )
        return df.groupby(["event_type", "day"], as_index=False).size().rename(
            columns={"size": "n_events"}
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)["n_events"]
        .sum()
    )
    frames = []
    for ty, g in fine.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        x = g["n_events"].to_numpy().astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(x)])
        cs2 = np.concatenate([[0], np.cumsum(x * x)])
        idx = np.arange(len(x))
        lo = np.maximum(0, idx - window + 1)
        W = idx - lo + 1
        S = cs[idx + 1] - cs[lo]
        SS = cs2[idx + 1] - cs2[lo]
        g["is_anomaly"] = (x * W - S) ** 2 > 4 * (SS * W - S * S)
        frames.append(g)
    out = pd.concat(frames, ignore_index=True).sort_values(
        ["event_type", "day"]
    ).reset_index(drop=True)
    out["n_events"] = out["n_events"].astype("int64")
    out["is_anomaly"] = out["is_anomaly"].astype(bool)
    return out


def rolling_count_anomalies_sql(window: int = 7) -> str:
    return f"""
        WITH d AS (
            SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ), s AS (
            SELECT *,
                   COUNT(*) OVER w AS ww,
                   SUM(n_events) OVER w AS ss,
                   SUM(n_events * n_events) OVER w AS sq
            FROM d
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
               (n_events * ww - ss) * (n_events * ww - ss)
                   > 4 * (sq * ww - ss * ss) AS is_anomaly
        FROM s ORDER BY event_type, day
    """


def order_fanout_histogram(sf_dir: str) -> pd.DataFrame:
    """Fanout profile of the orders->lineitem relationship: how many
    orders have 1, 2, ... line items (the join-cardinality histogram a
    planner would sample). One orderkey count fold, then a bounded
    count-of-counts finalize from per-block partials."""
    import numpy as np

    per_order = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
        .groupby("l_orderkey")
        .aggregate(Count(alias_name="n_lines"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, cnts = np.unique(t["n_lines"].to_numpy().astype(np.int64), return_counts=True)
        return pa.table(
            {
                "n_lines": pa.array(vals, pa.int64()),
                "n_orders": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    out = (
        per_order.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("n_lines", as_index=False)["n_orders"]
        .sum()
        .sort_values("n_lines")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def order_fanout_histogram_sql() -> str:
    return """
        SELECT n_lines, COUNT(*) AS n_orders
        FROM (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
              FROM lineitem GROUP BY 1)
        GROUP BY 1 ORDER BY 1
    """


def dnf_filter_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: discounted revenue under a DISJUNCTION of
    conjunctive part/lineitem predicates ((Brand#1, qty < 25) OR
    (Brand#2, qty >= 25) OR (Brand#3, any qty)) — the OR-of-ANDs
    filter that defeats naive single-range pushdown. The part
    attributes are a broadcast map attached in the scan; each branch
    evaluates vectorized and the union mask filters BEFORE any
    exchange; one scalar (cents, count) partial per batch folds."""
    import numpy as np

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    brand = dict(zip(part["p_partkey"].to_pylist(), part["p_brand"].to_pylist()))
    brand_ref = ray.put(brand)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table, *, brand_ref) -> pa.Table:
        brand = ray.get(brand_ref)
        b = np.array([brand[int(k)] for k in t["l_partkey"].to_pylist()])
        qty = t["l_quantity"].to_numpy()
        m = (
            ((b == "Brand#1") & (qty < 25))
            | ((b == "Brand#2") & (qty >= 25))
            | (b == "Brand#3")
        )
        disc = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        cents = pc.cast(pc.round(disc, round_mode="half_towards_infinity"), pa.int64()).to_numpy()
        return pa.table(
            {
                "n": pa.array([int(m.sum())], pa.int64()),
                "cents": pa.array([int(cents[m].sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", fn_kwargs={"brand_ref": brand_ref}
    ).to_pandas()
    return pd.DataFrame(
        {
            "n_items": pd.Series([int(parts["n"].sum())], dtype="int64"),
            "revenue_cents": pd.Series([int(parts["cents"].sum())], dtype="int64"),
        }
    )


def dnf_filter_revenue_sql() -> str:
    return """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND l.l_quantity < 25)
           OR (p.p_brand = 'Brand#2' AND l.l_quantity >= 25)
           OR p.p_brand = 'Brand#3'
    """


def user_longest_streak(sf_dir: str) -> pd.DataFrame:
    """Longest consecutive-active-day streak per user (the habit /
    retention metric) via gaps-and-islands at day grain: distinct
    active days reduce in a packed-key coarse shard, then each user's
    sorted day list splits into runs wherever the gap exceeds one day —
    vectorized diff, no per-day loop."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        key = (u << np.int64(31)) | day
        df = pd.DataFrame({"key": np.unique(key)})
        # shard by USER (key >> 31) so every day of a user lands in the
        # same group — streaks are whole-user computations
        df["_shard"] = ((df["key"].to_numpy() >> np.int64(31)) % 64).astype("int32")
        return df

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(g["key"].to_numpy())
        u = keys >> np.int64(31)
        day = keys & np.int64((1 << 31) - 1)
        out = []
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        start = 0
        for i in range(1, len(u) + 1):
            if i == len(u) or u[i] != u[start]:
                days = day[start:i]
                runs = np.split(np.arange(len(days)), np.nonzero(np.diff(days) > 1)[0] + 1)
                longest = max(len(r) for r in runs)
                out.append((int(u[start]), len(days), int(longest)))
                start = i
        return pd.DataFrame(out, columns=["user_id", "n_active_days", "longest_streak"])

    out = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def user_longest_streak_sql() -> str:
    return """
        WITH d AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), g AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (PARTITION BY user_id
                                                 ORDER BY day) AS INTEGER)
                       AS island
            FROM d
        ), runs AS (
            SELECT user_id, island, COUNT(*) AS len FROM g GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(SUM(len) AS BIGINT) AS n_active_days,
               CAST(MAX(len) AS BIGINT) AS longest_streak
        FROM runs GROUP BY 1 ORDER BY 1
    """


def events_type_share_trend(sf_dir: str) -> pd.DataFrame:
    """Share-of-type trend: per day, each event type's share of that
    day's volume in exact integer ppm (the stacked-area dashboard
    table). One bounded (day, type) fold; shares by truncating
    division against the per-day totals."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        days = t["ts"].to_numpy().astype("datetime64[D]")
        df = pd.DataFrame(
            {
                "day": np.datetime_as_string(days, unit="D"),
                "event_type": t["event_type"].to_pylist(),
            }
        )
        return df.groupby(["day", "event_type"], as_index=False).size().rename(
            columns={"size": "n_events"}
        )

    fold = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["day", "event_type"], as_index=False)["n_events"]
        .sum()
    )
    totals = fold.groupby("day")["n_events"].sum()
    fold["share_ppm"] = [
        int(n) * 1_000_000 // int(totals[d]) for d, n in zip(fold["day"], fold["n_events"])
    ]
    out = fold.sort_values(["day", "event_type"]).reset_index(drop=True)
    for c in ("n_events", "share_ppm"):
        out[c] = out[c].astype("int64")
    return out


def events_type_share_trend_sql() -> str:
    return """
        WITH f AS (
            SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ), t AS (
            SELECT day, SUM(n_events) AS total FROM f GROUP BY 1
        )
        SELECT f.day, f.event_type, f.n_events,
               CAST(f.n_events * 1000000 // t.total AS BIGINT) AS share_ppm
        FROM f JOIN t ON f.day = t.day
        ORDER BY f.day, f.event_type
    """


def embedding_norm_histogram(sf_dir: str, band_width: int = 200_000) -> pd.DataFrame:
    """Vector-store intake gate: the distribution of squared embedding
    norms, computed EXACTLY as the integer sum of squared
    thousandth-quantized components and banded into fixed-width
    buckets — the check that catches unnormalized, zero, or exploding
    vectors before they poison a cosine index. Row-local, zero
    shuffle."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        d = len(flat) // max(n, 1)
        q = np.round(flat.astype(np.float64) * 1000.0).astype(np.int64).reshape(n, d)
        norm2 = (q * q).sum(axis=1)
        band = norm2 // band_width
        vc = pd.Series(band).value_counts()
        return pd.DataFrame({"band": vc.index.astype("int64"), "n": vc.to_numpy()})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("band", as_index=False)["n"]
        .sum()
        .rename(columns={"n": "n_vecs"})
        .sort_values("band")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def embedding_norm_histogram_sql(band_width: int = 200_000) -> str:
    return f"""
        WITH f AS (
            SELECT vec_id,
                   CAST(SUM(q * q) AS BIGINT) AS norm2
            FROM (
                SELECT vec_id,
                       CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000)
                            AS BIGINT) AS q
                FROM embeddings
            ) GROUP BY vec_id
        )
        SELECT norm2 // {band_width} AS band, COUNT(*) AS n_vecs
        FROM f GROUP BY 1 ORDER BY 1
    """


def events_value_benford(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit over value cents — the fraud /
    fabrication screen: observed counts per leading digit 1-9 plus the
    Benford-law expectation in ppm (floor(log10(1+1/d)*1e6+0.5),
    constant table). Leading digit extracted by integer reduction (no
    string ops); one 9-row fold."""
    import math

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        c = _cents(t["value"]).to_numpy().astype(np.int64)
        c = c[c > 0]
        # vectorized leading digit: divide by 10^floor(log10(x))
        mag = np.power(10, np.floor(np.log10(c)).astype(np.int64))
        digit = c // mag
        vc = pd.Series(digit).value_counts()
        return pd.DataFrame({"digit": vc.index.astype("int64"), "n": vc.to_numpy()})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("digit", as_index=False)["n"]
        .sum()
        .rename(columns={"n": "n_events"})
        .sort_values("digit")
        .reset_index(drop=True)
    )
    out["benford_ppm"] = [
        math.floor(math.log10(1.0 + 1.0 / int(d)) * 1_000_000 + 0.5)
        for d in out["digit"]
    ]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def events_value_benford_sql() -> str:
    return """
        WITH c AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
            WHERE CAST(ROUND(value * 100) AS BIGINT) > 0
        ), d AS (
            SELECT cents // CAST(POWER(10, FLOOR(LOG10(cents))) AS BIGINT)
                       AS digit
            FROM c
        )
        SELECT digit, COUNT(*) AS n_events,
               CAST(FLOOR(LOG10(1.0 + 1.0 / digit) * 1000000 + 0.5) AS BIGINT)
                   AS benford_ppm
        FROM d GROUP BY digit ORDER BY digit
    """


def session_size_histogram(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session-depth distribution: how many sessions contain 1, 2, ...
    events (the engagement profile derived from the sessionize
    operator's output) — a composition proof that downstream analytics
    run over operator outputs without rematerializing inputs. One
    count-of-counts fold over the session table."""
    sessions = sessionize(sf_dir, gap_minutes=gap_minutes)
    out = (
        sessions.groupby("n_events", as_index=False)
        .size()
        .rename(columns={"n_events": "session_size", "size": "n_sessions"})
        .sort_values("session_size")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def session_size_histogram_sql(gap_minutes: int = 30) -> str:
    return f"""
        SELECT session_size, COUNT(*) AS n_sessions
        FROM (
            SELECT CAST(n_events AS BIGINT) AS session_size
            FROM ({sessionize_sql(gap_minutes)})
        )
        GROUP BY 1 ORDER BY 1
    """


def weighted_median_k(sf_dir: str) -> pd.DataFrame:
    """EXACT weighted median (and weighted p25/p75) of the JSON `k`
    property with value-cents weights — the revenue-weighted feature
    summary. Medians don't merge, but k's domain is bounded, so the
    exact distributed form is the weighted frequency fold: per-batch
    (k, total_weight) partials, a driver fold over the tiny frequency
    table, and quantile lookup at the smallest k whose cumulative
    weight reaches ceil(q * W) (total order deterministic)."""
    import json

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value", "props"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = _cents(t["value"]).to_numpy()
        k = np.fromiter(
            (int(json.loads(p)["k"]) for p in t["props"].to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        df = pd.DataFrame({"k": k, "w": cents})
        return df.groupby("k", as_index=False)["w"].sum()

    fold = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("k", as_index=False)["w"]
        .sum()
        .sort_values("k")
        .reset_index(drop=True)
    )
    cum = fold["w"].cumsum().to_numpy()
    W = int(cum[-1])
    ks = fold["k"].to_numpy()
    rows = []
    for p in (25, 50, 75):
        target = (W * p + 99) // 100  # ceil(W * p / 100)
        rows.append((p, int(ks[np.searchsorted(cum, target)])))
    out = pd.DataFrame(rows, columns=["pct", "weighted_k"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def weighted_median_k_sql() -> str:
    return """
        WITH f AS (
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS w
            FROM events GROUP BY 1
        ), c AS (
            SELECT k, SUM(w) OVER (ORDER BY k) AS cum,
                   (SELECT SUM(w) FROM f) AS total
            FROM f
        )
        SELECT pct, CAST(MIN(k) AS BIGINT) AS weighted_k
        FROM (
            SELECT 25 AS pct, k FROM c WHERE cum >= (total * 25 + 99) // 100
            UNION ALL
            SELECT 50, k FROM c WHERE cum >= (total * 50 + 99) // 100
            UNION ALL
            SELECT 75, k FROM c WHERE cum >= (total * 75 + 99) // 100
        )
        GROUP BY pct ORDER BY pct
    """


def tpch_q8_market_share(
    sf_dir: str, num_partitions: int = 8, target_nation: str = "NATION_6"
) -> pd.DataFrame:
    """TPC-H Q8 shape (national market share): of all ECONOMY-part
    revenue sold to AMERICA-region customers, what integer-ppm share
    came from suppliers of one nation, per order year.

    Distributed plan: the three small dimension sides (region->nation
    keys, ECONOMY part keys, supplier->nation map) broadcast once via
    ray.put; orders are semi-join-filtered to the region's customers
    and reduced to (orderkey, year) BEFORE the single big x big
    hash-partitioned join with the part-filtered lineitems; per-batch
    partials collapse the join output to (year, total, target) sums and
    the final exchange is a 7-row single-key groupby. Share is exact:
    cents are integers and ppm = num*1_000_000 // den (both positive)."""
    import numpy as np

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    amer = reg.filter(pc.equal(reg["r_name"], "AMERICA"))["r_regionkey"][0].as_py()
    amer_nations = nat.filter(pc.equal(nat["n_regionkey"], amer))["n_nationkey"]
    tgt_key = nat.filter(pc.equal(nat["n_name"], target_nation))["n_nationkey"][0].as_py()

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust_keys = cust.filter(pc.is_in(cust["c_nationkey"], amer_nations.combine_chunks()))[
        "c_custkey"
    ].combine_chunks()
    cust_ref = ray.put(cust_keys)

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    econ = part.filter(pc.equal(part["p_type"], "ECONOMY"))["p_partkey"].combine_chunks()
    econ_ref = ray.put(econ)

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    supp_nat = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    supp_ref = ray.put(supp_nat)

    def prep_orders(t: pa.Table, *, cust_ref) -> pa.Table:
        keys = ray.get(cust_ref)
        t = t.filter(pc.is_in(t["o_custkey"], value_set=keys))
        yrs = t["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": t["o_orderkey"], "o_year": pa.array(yrs, pa.int64())})

    def prep_lineitem(t: pa.Table, *, econ_ref, supp_ref) -> pa.Table:
        econ = ray.get(econ_ref)
        snat = ray.get(supp_ref)
        t = t.filter(pc.is_in(t["l_partkey"], value_set=econ))
        disc = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        cents = pc.cast(pc.round(disc, round_mode="half_towards_infinity"), pa.int64())
        is_tgt = np.array(
            [snat[int(s)] == tgt_key for s in t["l_suppkey"].to_pylist()], dtype=bool
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "cents": cents,
                "tgt_cents": pa.array(
                    np.where(is_tgt, cents.to_numpy(), 0).astype(np.int64), pa.int64()
                ),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        prep_lineitem, batch_format="pyarrow", fn_kwargs={"econ_ref": econ_ref, "supp_ref": supp_ref}
    )
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow", fn_kwargs={"cust_ref": cust_ref})

    joined = li.join(
        od,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["o_year", "cents", "tgt_cents"]), "o_year").aggregate(
            [("cents", "sum"), ("tgt_cents", "sum")]
        )
        return pa.table(
            {
                "o_year": g["o_year"],
                "total": g["cents_sum"],
                "target": g["tgt_cents_sum"],
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("total", alias_name="total_cents"), Sum("target", alias_name="nation_cents"))
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    out = pd.DataFrame(
        {
            "o_year": agg["o_year"].astype("int64"),
            "nation_cents": agg["nation_cents"].astype("int64"),
            "total_cents": agg["total_cents"].astype("int64"),
        }
    )
    out["mkt_share_ppm"] = (out["nation_cents"] * 1_000_000 // out["total_cents"]).astype(
        "int64"
    )
    return out


def tpch_q8_market_share_sql(target_nation: str = "NATION_6") -> str:
    return f"""
        WITH rev AS (
            SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
                   CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                       AS cents,
                   sn.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer cu ON cu.c_custkey = o.o_custkey
            JOIN nation cn ON cn.n_nationkey = cu.c_nationkey
            JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'AMERICA'
            JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        )
        SELECT CAST(o_year AS BIGINT) AS o_year,
               CAST(SUM(CASE WHEN supp_nation = '{target_nation}' THEN cents ELSE 0 END)
                    AS BIGINT) AS nation_cents,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(SUM(CASE WHEN supp_nation = '{target_nation}' THEN cents ELSE 0 END)
                    * 1000000 // SUM(cents) AS BIGINT) AS mkt_share_ppm
        FROM rev GROUP BY 1 ORDER BY 1
    """


def tpch_q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape (top supplier view): per-supplier discounted
    revenue over one ship-date quarter, returning every supplier tied
    at the maximum — the classic view + scalar-subquery pattern.

    Distributed plan: date filter + revenue quantization + per-batch
    (suppkey, cents) partials collapse the scan before the only
    exchange, a single-key groupby over at most |supplier| rows; the
    max-and-ties finish and the name attach (tiny dimension read)
    happen on the driver over the collapsed aggregate."""
    lo = pa.scalar(pd.Timestamp("1996-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-04-01"), type=pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        disc = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        cents = pc.cast(pc.round(disc, round_mode="half_towards_infinity"), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"l_suppkey": t["l_suppkey"], "cents": cents}), "l_suppkey"
        ).aggregate([("cents", "sum")])
        return pa.table({"l_suppkey": g["l_suppkey"], "cents": g["cents_sum"]})

    rev = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("cents", alias_name="total_revenue_cents"))
        .to_pandas()
    )
    best = int(rev["total_revenue_cents"].max())
    top = rev[rev["total_revenue_cents"] == best].copy()
    names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = top.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    out = out[["s_suppkey", "s_name", "total_revenue_cents"]].sort_values("s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_revenue_cents"] = out["total_revenue_cents"].astype("int64")
    return out.reset_index(drop=True)


def tpch_q15_top_supplier_sql() -> str:
    return """
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS total_revenue_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
        FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM rev)
        ORDER BY s.s_suppkey
    """


def tpch_q17_small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#3", max_size: int = 10
) -> pd.DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): total revenue
    lost if orders below 20% of a part's average quantity were not
    taken, restricted to one brand / size band.

    Distributed plan: two streaming passes over a pruned lineitem read.
    Pass 1 folds per-part (sum_qty, n) partials for JUST the qualifying
    parts (the brand/size keys broadcast once) through a single-key
    groupby whose output is dimension-bounded; the tiny result comes
    back as a broadcast dict. Pass 2 filters rows with the EXACT
    integer form of the correlated predicate (5*qty*n < sum_qty —
    quantities are whole, so both sides are exact in f64/BIGINT; no
    float-average tie ambiguity) and folds scalar (count, cents)
    partials. avg_yearly is kept integral as total_cents // 7."""
    import numpy as np

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    keep = part.filter(
        pc.and_(pc.equal(part["p_brand"], brand), pc.less(part["p_size"], max_size))
    )["p_partkey"].combine_chunks()
    keep_ref = ray.put(keep)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def qty_partial(t: pa.Table, *, keep_ref) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"], value_set=ray.get(keep_ref)))
        g = pa.TableGroupBy(t.select(["l_partkey", "l_quantity"]), "l_partkey").aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")]
        )
        return pa.table(
            {
                "l_partkey": g["l_partkey"],
                "sq": g["l_quantity_sum"],
                "nq": pc.cast(g["l_quantity_count"], pa.int64()),
            }
        )

    stats = (
        ds.map_batches(qty_partial, batch_format="pyarrow", fn_kwargs={"keep_ref": keep_ref})
        .groupby("l_partkey")
        .aggregate(Sum("sq", alias_name="sum_qty"), Sum("nq", alias_name="n_qty"))
        .to_pandas()
    )
    stat_ref = ray.put(
        {
            int(k): (float(s), int(n))
            for k, s, n in zip(stats["l_partkey"], stats["sum_qty"], stats["n_qty"])
        }
    )

    def rev_partial(t: pa.Table, *, stat_ref) -> pa.Table:
        st = ray.get(stat_ref)
        pk = t["l_partkey"].to_pylist()
        qty = t["l_quantity"].to_numpy()
        price = t["l_extendedprice"]
        m = np.zeros(len(pk), dtype=bool)
        for i, k in enumerate(pk):
            sn = st.get(int(k))
            if sn is not None and 5.0 * qty[i] * sn[1] < sn[0]:
                m[i] = True
        cents = pc.cast(
            pc.round(pc.multiply(price, 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy()
        return pa.table(
            {
                "n": pa.array([int(m.sum())], pa.int64()),
                "cents": pa.array([int(cents[m].sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(
        rev_partial, batch_format="pyarrow", fn_kwargs={"stat_ref": stat_ref}
    ).to_pandas()
    total = int(parts["cents"].sum())
    return pd.DataFrame(
        {
            "n_items": pd.Series([int(parts["n"].sum())], dtype="int64"),
            "total_cents": pd.Series([total], dtype="int64"),
            "avg_yearly_cents": pd.Series([total // 7], dtype="int64"),
        }
    )


def tpch_q17_small_quantity_revenue_sql(brand: str = "Brand#3", max_size: int = 10) -> str:
    return f"""
        WITH hits AS (
            SELECT l.l_extendedprice
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
                       AND p.p_brand = '{brand}' AND p.p_size < {max_size}
            JOIN (SELECT l_partkey, SUM(l_quantity) AS sq, COUNT(*) AS nq
                  FROM lineitem GROUP BY 1) a ON a.l_partkey = l.l_partkey
            WHERE 5 * l.l_quantity * a.nq < a.sq
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) // 7 AS BIGINT)
                   AS avg_yearly_cents
        FROM hits
    """


def tpch_q21_waiting_suppliers(
    sf_dir: str, late_days: int = 60, k: int = 20, num_partitions: int = 8
) -> pd.DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finished multi-supplier orders, count per supplier the orders where
    ONLY that supplier shipped late (> o_orderdate + late_days); top-k
    by count. The fixture lineitem has no receipt/commit dates
    (TESTDATA.md), so lateness is ship-vs-order-date — same EXISTS /
    NOT-EXISTS join topology as the official query.

    Distributed plan: finished orders reduce to (orderkey, orderdate)
    and hash-join the lineitem scan on the single orderkey key (both
    sides raw scans — no aggregate feeds the join, see
    stages/shard.py's Ray 2.49 note); per-batch partials collapse to
    (orderkey, suppkey, late) rows; a 64-way coarse shard on orderkey
    finishes the per-order verdict and emits per-supplier counts, so
    the driver merges at most 64 x |supplier| rows."""
    import numpy as np

    def prep_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return t.select(["o_orderkey", "o_orderdate"])

    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )

    joined = li.join(
        od,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    lag_us = np.int64(late_days) * 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        odate = t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {
                "okey": t["l_orderkey"].to_numpy(),
                "skey": t["l_suppkey"].to_numpy(),
                "late": (ship > odate + lag_us).astype(np.int64),
            }
        )
        g = df.groupby(["okey", "skey"], sort=False)["late"].max().reset_index()
        g["_shard"] = (g["okey"] % 64).astype("int32")
        return pa.Table.from_pandas(g, preserve_index=False)

    def shard_counts(g: pd.DataFrame) -> pd.DataFrame:
        ls = g.groupby(["okey", "skey"], sort=False)["late"].max().reset_index()
        po = ls.groupby("okey", sort=False).agg(
            n_supp=("skey", "size"), n_late=("late", "sum")
        )
        # per (okey, skey) rows are unique, so size == distinct suppliers
        ok = po[(po["n_supp"] >= 2) & (po["n_late"] == 1)].index
        winners = ls[ls["okey"].isin(ok) & (ls["late"] == 1)]
        out = winners.groupby("skey", sort=False).size().reset_index(name="numwait")
        return out

    cand = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_counts, batch_format="pandas")
        .to_pandas()
    )
    tot = cand.groupby("skey", sort=False)["numwait"].sum().reset_index()
    tot = tot.sort_values(["numwait", "skey"], ascending=[False, True], kind="mergesort").head(k)
    names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = tot.merge(names, left_on="skey", right_on="s_suppkey")
    out = out[["s_suppkey", "s_name", "numwait"]]
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["numwait"] = out["numwait"].astype("int64")
    return out.reset_index(drop=True)


def tpch_q21_waiting_suppliers_sql(late_days: int = 60, k: int = 20) -> str:
    return f"""
        WITH ls AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   MAX(CASE WHEN l.l_shipdate >
                                 o.o_orderdate + INTERVAL {late_days} DAY
                            THEN 1 ELSE 0 END) AS late
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
                         AND o.o_orderstatus = 'F'
            GROUP BY 1, 2
        ), per_order AS (
            SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
                   MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
            FROM ls GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM per_order p JOIN supplier s ON s.s_suppkey = p.late_supp
        WHERE p.n_supp >= 2 AND p.n_late = 1
        GROUP BY 1, 2 ORDER BY numwait DESC, s.s_suppkey LIMIT {k}
    """


def tpch_q22_idle_balance(sf_dir: str, min_price: float = 400000.0) -> pd.DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity): customers whose
    account balance beats the positive-balance average but who never
    placed an order above `min_price` (the fixtures are FK-complete, so
    the plain no-orders clause would be vacuous — TESTDATA.md), counted
    and summed per nation. The above-average predicate is exact
    integers: acctbal_cents * n > sum_cents, no float-average ties.

    Distributed plan: pass 1 folds the positive-balance (sum, count)
    scalars; the qualifying custkey set reduces distributed (filtered
    pruned read + unique) and broadcasts once; pass 2 applies the
    anti-join mask + balance predicate per batch and pre-aggregates
    (nationkey -> count, cents) before the 25-row single-key groupby."""
    cust_cols = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def pos_partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"]).to_numpy()
        pos = cents[cents > 0]
        return pa.table(
            {
                "s": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    m = cust_cols.map_batches(pos_partial, batch_format="pyarrow").to_pandas().sum()
    s_pos, n_pos = int(m["s"]), int(m["n"])

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    big = orders.filter(expr=f"o_totalprice > {min_price}")
    have = pa.array(sorted(big.unique("o_custkey")), pa.int64())
    have_ref = ray.put(have)

    def idle_partial(t: pa.Table, *, have_ref) -> pa.Table:
        mask = pc.invert(pc.is_in(t["c_custkey"], value_set=ray.get(have_ref)))
        t = t.filter(mask)
        cents = _cents(t["c_acctbal"])
        t = pa.table({"c_nationkey": t["c_nationkey"], "cents": cents})
        t = t.filter(pc.greater(pc.multiply(t["cents"], pa.scalar(n_pos, pa.int64())), s_pos))
        g = pa.TableGroupBy(t, "c_nationkey").aggregate([("cents", "sum"), ("cents", "count")])
        return pa.table(
            {
                "c_nationkey": g["c_nationkey"],
                "cents": g["cents_sum"],
                "n": pc.cast(g["cents_count"], pa.int64()),
            }
        )

    agg = (
        cust_cols.map_batches(idle_partial, batch_format="pyarrow", fn_kwargs={"have_ref": have_ref})
        .groupby("c_nationkey")
        .aggregate(Sum("n", alias_name="n_custs"), Sum("cents", alias_name="total_acctbal_cents"))
        .to_pandas()
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    for c in ("c_nationkey", "n_custs", "total_acctbal_cents"):
        agg[c] = agg[c].astype("int64")
    return agg[["c_nationkey", "n_custs", "total_acctbal_cents"]]


def tpch_q22_idle_balance_sql(min_price: float = 400000.0) -> str:
    return f"""
        WITH pos AS (
            SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
                   COUNT(*) AS n
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
               CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS total_acctbal_cents
        FROM customer c, pos
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > {min_price})
          AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s
        GROUP BY 1 ORDER BY 1
    """


def loo_target_encode_audit(sf_dir: str) -> pd.DataFrame:
    """Leakage-safe target encoding audit: per event_type, how many
    rows sit ABOVE their own leave-one-out mean value — the sanity
    check an ML feature pipeline publishes before shipping a target
    encoding (a row above its LOO mean contributes positive signal the
    encoder must not leak back). The predicate is exact integers:
    cents*(n-1) > sum_cents - cents, never a float average.

    Distributed plan: pass 1 folds per-type (sum_cents, n) partials
    through a 5-row groupby and broadcasts the dict; pass 2 is an
    embarrassingly parallel per-batch count against the broadcast."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def agg_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"event_type": t["event_type"], "cents": _cents(t["value"])}),
            "event_type",
        ).aggregate([("cents", "sum"), ("cents", "count")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "s": g["cents_sum"],
                "n": pc.cast(g["cents_count"], pa.int64()),
            }
        )

    stats = (
        ds.map_batches(agg_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s", alias_name="sum_cents"), Sum("n", alias_name="n_rows"))
        .to_pandas()
    )
    st_ref = ray.put(
        {
            t: (int(s), int(n))
            for t, s, n in zip(stats["event_type"], stats["sum_cents"], stats["n_rows"])
        }
    )

    def count_partial(t: pa.Table, *, st_ref) -> pa.Table:
        st = ray.get(st_ref)
        types = np.asarray(t["event_type"].to_pylist())
        cents = _cents(t["value"]).to_numpy()
        rows = []
        for ty in np.unique(types):
            s, n = st[ty]
            c = cents[types == ty]
            above = int((c * (n - 1) > s - c).sum())
            rows.append((str(ty), above))
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "above": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    cnt = (
        ds.map_batches(count_partial, batch_format="pyarrow", fn_kwargs={"st_ref": st_ref})
        .groupby("event_type")
        .aggregate(Sum("above", alias_name="n_above_loo_mean"))
        .to_pandas()
    )
    out = stats.merge(cnt, on="event_type")
    out = out[["event_type", "n_rows", "n_above_loo_mean"]].sort_values("event_type")
    for c in ("n_rows", "n_above_loo_mean"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def loo_target_encode_audit_sql() -> str:
    return """
        WITH e AS (
            SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), a AS (
            SELECT event_type, CAST(SUM(cents) AS BIGINT) AS s, COUNT(*) AS n
            FROM e GROUP BY 1
        )
        SELECT e.event_type, CAST(a.n AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN e.cents * (a.n - 1) > a.s - e.cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_above_loo_mean
        FROM e JOIN a USING (event_type)
        GROUP BY 1, 2 ORDER BY 1
    """


def part_copurchase_pairs(sf_dir: str, k: int = 20, num_partitions: int = 8) -> pd.DataFrame:
    """Market-basket mining: the top-k part pairs that co-occur in the
    most orders (the input to association-rule lift). Pair emission is
    quadratic per order but orders are small; the pair space is what
    explodes, so pairs are PACKED into one int64 key (a*2^32+b) and
    every exchange moves packed counts, never raw lineitems.

    Distributed plan: per-batch local (orderkey, partkey) dedup; a
    64-way coarse shard on orderkey finishes the per-order distinct and
    emits pair partial counts; a single-key groupby on the packed pair
    totals them (packed key sidesteps the Ray 2.49 multi-key-agg join
    quirk, stages/shard.py); per-block top-k candidates merge on the
    driver (blocks x k rows, never the full pair table)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])

    def local_dedup(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"okey": t["l_orderkey"].to_numpy(), "pkey": t["l_partkey"].to_numpy()}
        ).drop_duplicates()
        df["_shard"] = (df["okey"] % 64).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["okey", "pkey"]).sort_values(["okey", "pkey"])
        okey = g["okey"].to_numpy()
        pkey = g["pkey"].to_numpy().astype(np.int64)
        if len(pkey) and int(pkey.max()) >= (1 << 31):
            raise ValueError("partkey exceeds the 31-bit packing bound")
        # vectorized pair emission via the sorted-lag trick: after
        # sorting by (okey, pkey), every unordered within-order pair is
        # (x[i], x[i+lag]) for exactly one lag >= 1 with matching okey —
        # max-order-size lags of whole-array shifts replace the
        # per-order Python loop (which was the 100x hot spot at sf0.1)
        packed = []
        lag = 1
        while True:
            if lag >= len(okey):
                break
            same = okey[lag:] == okey[:-lag]
            if not same.any():
                break
            a = pkey[:-lag][same]  # sorted: a < b within an order
            b = pkey[lag:][same]
            packed.append(a * (1 << 32) + b)
            lag += 1
        if not packed:
            return pd.DataFrame({"pair": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "_pshard": pd.Series([], dtype="int32")})
        allp = np.concatenate(packed)
        u, c = np.unique(allp, return_counts=True)
        return pd.DataFrame({"pair": u.astype("int64"), "n": c.astype("int64"),
                             "_pshard": (u % 64).astype("int32")})

    # a pair's counts from different order shards meet in its pair
    # shard; summing + local top-k INSIDE the 64 coarse groups avoids a
    # million-distinct-key Ray aggregate (per-group dispatch made that
    # path ~70x slower at sf0.1 — measured 210 s vs 3 s)
    def pshard_topk(g: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(g["pair"].to_numpy(), return_inverse=True)
        tot = np.bincount(inv, weights=g["n"].to_numpy()).astype(np.int64)
        df = pd.DataFrame({"pair": u.astype("int64"), "n_orders": tot})
        return df.sort_values(["n_orders", "pair"], ascending=[False, True]).head(k)

    cand = (
        ds.map_batches(local_dedup, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_pairs, batch_format="pandas")
        .groupby("_pshard")
        .map_groups(pshard_topk, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(["n_orders", "pair"], ascending=[False, True]).head(k)
    out = pd.DataFrame(
        {
            "p_a": (cand["pair"] // (1 << 32)).astype("int64"),
            "p_b": (cand["pair"] % (1 << 32)).astype("int64"),
            "n_orders": cand["n_orders"].astype("int64"),
        }
    )
    return out.reset_index(drop=True)


def part_copurchase_pairs_sql(k: int = 20) -> str:
    return f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS p_a, b.l_partkey AS p_b,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, (a.l_partkey * 4294967296 + b.l_partkey)
        LIMIT {k}
    """


def orders_repeat_interval_histogram(sf_dir: str, band_days: int = 30) -> pd.DataFrame:
    """Repeat-purchase cadence: the distribution of day gaps between a
    customer's consecutive orders, banded per `band_days` — the curve a
    retention model is fit to. Gap multiset depends only on the sorted
    order dates per customer, so same-day ties need no tiebreaker.

    Distributed plan: pruned (custkey, date) read; a 64-way coarse
    shard on custkey sorts each customer locally and emits banded gap
    partial counts; the final exchange is a tiny single-key groupby
    over band ids."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])

    def shardify(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ckey": t["o_custkey"],
                "day": pa.array(
                    t["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64),
                    pa.int64(),
                ),
                "_shard": pc.cast(pc.bit_wise_and(t["o_custkey"], 63), pa.int32()),
            }
        )

    def shard_gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ckey", "day"], kind="mergesort")
        ck = g["ckey"].to_numpy()
        dy = g["day"].to_numpy()
        same = ck[1:] == ck[:-1]
        gaps = (dy[1:] - dy[:-1])[same]
        bands = gaps // band_days
        u, c = np.unique(bands, return_counts=True)
        return pd.DataFrame({"band": u.astype("int64"), "n": c.astype("int64")})

    out = (
        ds.map_batches(shardify, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_gaps, batch_format="pandas")
        .groupby("band")
        .aggregate(Sum("n", alias_name="n_gaps"))
        .to_pandas()
        .sort_values("band")
        .reset_index(drop=True)
    )
    out["band"] = out["band"].astype("int64")
    out["n_gaps"] = out["n_gaps"].astype("int64")
    return out


def orders_repeat_interval_histogram_sql(band_days: int = 30) -> str:
    return f"""
        WITH g AS (
            SELECT date_diff('day',
                       LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate),
                       o_orderdate) AS gap
            FROM orders
        )
        SELECT CAST(gap // {band_days} AS BIGINT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_gaps
        FROM g WHERE gap IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """


def daily_count_autocorr_stats(sf_dir: str, max_lag: int = 7) -> pd.DataFrame:
    """Seasonality detector inputs: for each lag 1..max_lag, the EXACT
    integer sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) of the
    (count[d], count[d+lag]) pair series over observed days — the
    Pearson autocorrelation is derivable downstream without shipping a
    single float across the contract.

    Distributed plan: the only heavy step is the daily-count reduce
    (per-batch partials -> one small single-key groupby); the lag
    products fold on the driver over the |days|-row series."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        u, c = np.unique(days, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())})

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    cnt = dict(zip(daily["day"].astype(int), daily["n"].astype(int)))
    rows = []
    for lag in range(1, max_lag + 1):
        xs = np.array(
            [[cnt[d], cnt[d + lag]] for d in sorted(cnt) if d + lag in cnt], dtype=np.int64
        )
        if len(xs) == 0:
            rows.append((lag, 0, 0, 0, 0, 0, 0))
            continue
        x, y = xs[:, 0], xs[:, 1]
        rows.append(
            (lag, len(xs), int(x.sum()), int(y.sum()),
             int((x * x).sum()), int((y * y).sum()), int((x * y).sum()))
        )
    out = pd.DataFrame(
        rows, columns=["lag", "n_pairs", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def daily_count_autocorr_stats_sql(max_lag: int = 7) -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT CAST(g.lag AS BIGINT) AS lag,
               CAST(COUNT(b.n) AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(a.n), 0) AS BIGINT) AS sum_x,
               CAST(COALESCE(SUM(b.n), 0) AS BIGINT) AS sum_y,
               CAST(COALESCE(SUM(a.n * a.n), 0) AS BIGINT) AS sum_xx,
               CAST(COALESCE(SUM(b.n * b.n), 0) AS BIGINT) AS sum_yy,
               CAST(COALESCE(SUM(a.n * b.n), 0) AS BIGINT) AS sum_xy
        FROM generate_series(1, {max_lag}) g(lag)
        CROSS JOIN daily a
        JOIN daily b ON b.d = a.d + CAST(g.lag AS INTEGER)
        GROUP BY 1 ORDER BY 1
    """


def salted_repartition_join(sf_dir: str, n_salts: int = 8, num_partitions: int = 8) -> pd.DataFrame:
    """Skew-safe big x big equi-join: events join customers on a HOT
    key domain (a handful of user_ids own most rows), so a plain
    hash-partitioned join would put every hot key in one reducer. The
    big side salts each row (event_id % n_salts) and the other side
    replicates once per salt, so the exchange spreads each hot key over
    n_salts partitions — the standard skew-mitigation rewrite the brief
    mandates, demonstrated end-to-end through Dataset.join on the
    composite (key, salt). (Both join inputs are raw scans — the Ray
    2.49 multi-key-AGGREGATE join quirk does not apply.)

    At fixture scale the customer side would fit a broadcast (see
    segment_revenue for that shape); this op keeps BOTH sides as
    Datasets on purpose — the rewrite is for when neither fits."""

    def salt_events(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "salt": pc.cast(
                    pc.bit_wise_and(t["event_id"], n_salts - 1), pa.int32()
                ),
                "cents": _cents(t["value"]),
            }
        )

    def replicate_customers(t: pa.Table) -> pa.Table:
        reps = []
        for s in range(n_salts):
            reps.append(
                pa.table(
                    {
                        "c_custkey": t["c_custkey"],
                        "c_salt": pa.array([s] * t.num_rows, pa.int32()),
                        "c_mktsegment": t["c_mktsegment"],
                    }
                )
            )
        return pa.concat_tables(reps)

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    ).map_batches(salt_events, batch_format="pyarrow")
    cu = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(replicate_customers, batch_format="pyarrow")

    joined = ev.join(
        cu,
        join_type="inner",
        num_partitions=num_partitions,
        on=("user_id", "salt"),
        right_on=("c_custkey", "c_salt"),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["c_mktsegment", "cents"]), "c_mktsegment").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "cents": g["cents_sum"],
                "n": pc.cast(g["cents_count"], pa.int64()),
            }
        )

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("n", alias_name="n_events"), Sum("cents", alias_name="total_value_cents"))
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["total_value_cents"] = out["total_value_cents"].astype("int64")
    return out[["c_mktsegment", "n_events", "total_value_cents"]]


def salted_repartition_join_sql() -> str:
    return """
        SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS total_value_cents
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# batch 32: CDC apply, robust outliers, churn bands, CUSUM changepoint
# ---------------------------------------------------------------------------


def cdc_apply(sf_dir: str) -> pd.DataFrame:
    """Change-data-capture apply: treat the events stream as an ordered
    changelog over a keyed entity (key = user_id, seq = (ts, event_id),
    op = DELETE when event_type='error' else UPSERT carrying the row),
    materialize the final table state, and publish the per-type survivor
    accounting — the core of every log-to-table (Debezium/Hudi-style)
    ingestion job.

    Distributed plan: last-op-wins is an associative per-key reduce, so
    each batch collapses to one candidate row per key BEFORE any
    exchange (per-batch sort + keep-last); a 64-way coarse shard on
    user_id finishes the per-key argmax (coarse grouping amortizes Ray's
    per-group dispatch, stages/shard.py); deletes drop after the final
    state is known; the survivor accounting folds through a tiny
    single-key groupby. No full-table sort, no driver state."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts", "value"]
    )

    def local_last(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(),
                "ts_us": t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "event_id": t["event_id"].to_numpy(),
                "event_type": t["event_type"].to_pylist(),
                "cents": _cents(t["value"]).to_numpy(),
            }
        )
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        df = df.drop_duplicates("user_id", keep="last")
        df["_shard"] = (df["user_id"] % 64).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    def shard_last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        g = g.drop_duplicates("user_id", keep="last")
        g = g[g["event_type"] != "error"]  # final op DELETE -> key gone
        out = g.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size"), total_cents=("cents", "sum")
        )
        out["n_users"] = out["n_users"].astype("int64")
        out["total_cents"] = out["total_cents"].astype("int64")
        return out

    out = (
        ds.map_batches(local_last, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_last, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"), Sum("total_cents", alias_name="total_cents"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out[["event_type", "n_users", "total_cents"]]


def cdc_apply_sql() -> str:
    return """
        WITH last AS (
            SELECT user_id, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM last WHERE rn = 1 AND event_type <> 'error'
        GROUP BY 1 ORDER BY 1
    """


def _exact_quantile_disc(base, q: float, n_buckets: int = 1024) -> int:
    """Exact discrete quantile (DuckDB quantile_disc semantics: 1-based
    rank ceil(q*n)) of int64 column `c` of `base`, via the same
    histogram-refinement distributed selection as global_exact_median —
    O(log_B(range)) embarrassingly parallel passes, O(B) driver state,
    never collects values."""
    import numpy as np

    stats = base.aggregate(Min("c"), Max("c"), Count())
    lo, hi, n = int(stats["min(c)"]), int(stats["max(c)"]), int(stats["count()"])
    rank = max(1, int(np.ceil(q * n)))

    while hi - lo + 1 > n_buckets:
        width = (hi - lo + n_buckets) // n_buckets

        def hist(t: pa.Table, lo=lo, hi=hi, width=width) -> pd.DataFrame:
            c = t["c"].to_numpy()
            c = c[(c >= lo) & (c <= hi)]
            idx = (c - lo) // width
            counts = np.bincount(idx, minlength=n_buckets).astype(np.int64)
            return pd.DataFrame(
                {"bucket": np.arange(n_buckets, dtype=np.int64), "cnt": counts}
            )

        hdf = (
            base.map_batches(hist, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
            .sort_values("bucket")
        )
        counts = np.zeros(n_buckets, dtype=np.int64)
        counts[hdf["bucket"].to_numpy()] = hdf["cnt"].to_numpy()
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, rank))
        rank -= int(cum[b - 1]) if b > 0 else 0
        lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)

    def exact(t: pa.Table, lo=lo, hi=hi) -> pd.DataFrame:
        c = t["c"].to_numpy()
        c = c[(c >= lo) & (c <= hi)]
        counts = np.bincount(c - lo, minlength=hi - lo + 1).astype(np.int64)
        return pd.DataFrame({"v": np.arange(lo, hi + 1, dtype=np.int64), "cnt": counts})

    vdf = (
        base.map_batches(exact, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("v")
    )
    cum = np.cumsum(vdf["cnt"].to_numpy())
    return int(vdf["v"].to_numpy()[int(np.searchsorted(cum, rank))])


def orders_mad_outliers(sf_dir: str, k_mad: int = 3) -> pd.DataFrame:
    """Robust (median/MAD) outlier gate on order totals: flag orders
    with |price - median| > k * MAD, accounted per priority class —
    the standard robust alternative to z-scores when the tail is fat
    (a mean/stddev gate is itself dragged by the outliers it hunts).

    Distributed plan: median and MAD are each an exact distributed
    selection (_exact_quantile_disc: histogram-refinement passes, O(B)
    driver state); the deviation column derives per batch from the
    broadcast scalar median; the final flag+count is an embarrassingly
    parallel partial fold through a 5-row groupby. All integer math —
    bit-stable at any parallelism."""

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderpriority": t["o_orderpriority"], "c": _cents(t["o_totalprice"])}
        )

    base = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).map_batches(cents, batch_format="pyarrow")

    med = _exact_quantile_disc(base, 0.5)

    def dev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "c": pc.abs(pc.subtract(t["c"], pa.scalar(med, pa.int64()))),
            }
        )

    devs = base.map_batches(dev, batch_format="pyarrow")
    mad = _exact_quantile_disc(devs, 0.5)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_pylist(),
                "out": pc.greater(t["c"], pa.scalar(k_mad * mad, pa.int64())).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n=("out", "size"), n_out=("out", "sum")
        )
        g["n"] = g["n"].astype("int64")
        g["n_out"] = g["n_out"].astype("int64")
        return g

    out = (
        devs.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("n_out", alias_name="n_outliers"))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["n_outliers"] = out["n_outliers"].astype("int64")
    return out[["o_orderpriority", "n_orders", "n_outliers"]]


def orders_mad_outliers_sql(k_mad: int = 3) -> str:
    return f"""
        WITH c AS (
            SELECT o_orderpriority,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        m AS (SELECT quantile_disc(cents, 0.5) AS med FROM c),
        d AS (SELECT c.o_orderpriority, ABS(c.cents - m.med) AS dev FROM c, m),
        md AS (SELECT quantile_disc(dev, 0.5) AS mad FROM d)
        SELECT d.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN d.dev > {k_mad} * md.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM d, md GROUP BY 1 ORDER BY 1
    """


def user_inactivity_churn(sf_dir: str, band_days: int = 1) -> pd.DataFrame:
    """Churn-risk cohorts: every user banded by how many `band_days`
    buckets of calendar days separate their LAST event from the corpus
    watermark (band 0 = recently active) — the table a re-engagement
    campaign is sized from.

    Distributed plan: the watermark is a scalar aggregate; per-user
    recency is a per-batch partial max folded through one groupby(Max)
    — one row per user, never the event stream — and the band histogram
    is a second tiny fold. Calendar-day diff (not 24h periods) matches
    SQL date_diff('day')."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def days(t: pa.Table) -> pa.Table:
        d = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(), "day": d})
        g = df.groupby("user_id", as_index=False)["day"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = ds.map_batches(days, batch_format="pyarrow").groupby("user_id").aggregate(
        Max("day", alias_name="last_day")
    )
    mx = int(per_user.max("last_day"))

    def band_partial(t: pa.Table) -> pa.Table:
        import numpy as np

        b = (mx - t["last_day"].to_numpy()) // band_days
        u, c = np.unique(b, return_counts=True)
        return pa.table(
            {"recency_band": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    out = (
        per_user.map_batches(band_partial, batch_format="pyarrow")
        .groupby("recency_band")
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
        .sort_values("recency_band")
        .reset_index(drop=True)
    )
    out["recency_band"] = out["recency_band"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


def user_inactivity_churn_sql(band_days: int = 1) -> str:
    return f"""
        WITH last AS (SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY 1),
             m AS (SELECT MAX(ts) AS mx FROM events)
        SELECT CAST(date_diff('day', CAST(last.last_ts AS DATE),
                              CAST(m.mx AS DATE)) // {band_days} AS BIGINT)
                   AS recency_band,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM last, m GROUP BY 1 ORDER BY 1
    """


def daily_revenue_cusum(sf_dir: str) -> pd.DataFrame:
    """CUSUM changepoint statistic over the daily order-revenue series:
    S_k = D * prefix_sum(x, k) - k * total — the mean-shift CUSUM curve
    scaled by the day count D so every point is an EXACT integer (the
    float division by D never happens); argmax |S_k| is the classic
    single-changepoint estimate, derivable downstream.

    Distributed plan: the only heavy step is the daily-revenue reduce
    (per-batch partials -> one small single-key groupby); the prefix
    fold runs on the driver over the |days|-row series (bounded by
    calendar span, not data volume). Overflow bound: D * total must fit
    int64 — at 100 TB publish the curve in units of whole dollars."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "day": t["o_orderdate"].to_numpy().astype("datetime64[D]"),
                "cents": _cents(t["o_totalprice"]).to_numpy(),
            }
        )
        g = df.groupby("day", as_index=False)["cents"].sum()
        return g

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    x = daily["cents"].to_numpy().astype(np.int64)
    nd, tot = len(x), int(x.sum())
    s = nd * np.cumsum(x) - (np.arange(1, nd + 1, dtype=np.int64)) * tot
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(daily["day"]).astype("datetime64[us]"),
            "cents": x,
            "s_scaled": s.astype("int64"),
        }
    )
    return out


def daily_revenue_cusum_sql() -> str:
    return """
        WITH d AS (
            SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
                   CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        t AS (SELECT COUNT(*) AS nd, SUM(cents) AS tot FROM d)
        SELECT d.day, d.cents,
               CAST(t.nd * SUM(d.cents) OVER (ORDER BY d.day)
                    - ROW_NUMBER() OVER (ORDER BY d.day) * t.tot AS BIGINT) AS s_scaled
        FROM d, t ORDER BY d.day
    """


# ---------------------------------------------------------------------------
# batch 33: calendar gap-fill, activity bitmaps, l-diversity, corr stats
# ---------------------------------------------------------------------------


def daily_gap_fill(sf_dir: str) -> pd.DataFrame:
    """Calendar gap-fill (forward fill): the per-(priority, day) revenue
    series densified onto the full calendar spine, missing days carrying
    the last observed value (0 before the first observation) plus an
    is_observed flag — the cleaning step before any fixed-step
    time-series model trains on irregular business data.

    Distributed plan: the only data-sized step is the daily-revenue
    reduce (per-batch partials -> one small groupby); the spine
    (categories x calendar days) is bounded by time, not data volume, so
    the densify + ffill runs on the driver. At petabyte scale the spine
    still has ~5 x 3650 rows."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_pylist(),
                "day": t["o_orderdate"].to_numpy().astype("datetime64[D]"),
                "cents": _cents(t["o_totalprice"]).to_numpy(),
            }
        )
        return df.groupby(["o_orderpriority", "day"], as_index=False)["cents"].sum()

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "day"])
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    daily["day"] = pd.to_datetime(daily["day"])
    lo, hi = daily["day"].min(), daily["day"].max()
    spine_days = pd.date_range(lo, hi, freq="D")
    frames = []
    for prio in sorted(daily["o_orderpriority"].unique()):
        obs = daily[daily["o_orderpriority"] == prio].set_index("day")["cents"]
        s = obs.reindex(spine_days)
        filled = s.ffill().fillna(0).astype("int64")
        frames.append(
            pd.DataFrame(
                {
                    "o_orderpriority": prio,
                    "day": spine_days.astype("datetime64[us]"),
                    "cents_filled": filled.to_numpy(),
                    "is_observed": s.notna().to_numpy(),
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["o_orderpriority", "day"]).reset_index(drop=True)


def daily_gap_fill_sql() -> str:
    return """
        WITH d AS (
            SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
                   CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ),
        spine AS (
            SELECT p.o_orderpriority, CAST(g.day AS DATE) AS day
            FROM (SELECT DISTINCT o_orderpriority FROM orders) p
            CROSS JOIN (
                SELECT UNNEST(generate_series(
                    (SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d),
                    INTERVAL 1 DAY)) AS day
            ) g
        )
        SELECT s.o_orderpriority, CAST(s.day AS TIMESTAMP) AS day,
               COALESCE(LAST_VALUE(d.cents IGNORE NULLS) OVER (
                   PARTITION BY s.o_orderpriority ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                   AS cents_filled,
               d.cents IS NOT NULL AS is_observed
        FROM spine s LEFT JOIN d
          ON d.o_orderpriority = s.o_orderpriority AND d.day = s.day
        ORDER BY s.o_orderpriority, s.day
    """


def user_active_day_bitmap(sf_dir: str) -> pd.DataFrame:
    """Bitmap activity index: each user's active calendar days packed
    into one int64 bitmask (bit i = active on min_day + i), reduced with
    a CUSTOM bitwise-OR AggregateFn — the Ray-native equivalent of a
    roaring-bitmap index build — then the popcount histogram plus a
    mask checksum per activity level.

    Distributed plan: per-batch partial OR collapses each (user, batch)
    to one row before the exchange; the groupby reduces with the
    custom OR (associative + commutative, so Ray can combine partials
    in any order); the histogram is a second tiny fold. The 64-day
    window is asserted — at real scale the mask becomes a fixed-width
    chunk list keyed (user, epoch_week)."""
    import numpy as np

    from ray.data.aggregate import AggregateFn

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def day_col(t: pa.Table) -> pa.Table:
        d = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table({"day": pa.array(d, pa.int64())})

    min_day = int(
        ds.map_batches(day_col, batch_format="pyarrow").aggregate(Min("day"))["min(day)"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        d = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64) - min_day
        if len(d) and int(d.max()) >= 63:
            raise ValueError("calendar span exceeds the 64-bit mask window")
        df = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(), "m": np.int64(1) << d}
        )
        g = df.groupby("user_id", as_index=False)["m"].agg(lambda x: int(np.bitwise_or.reduce(x.to_numpy())))
        g["m"] = g["m"].astype("int64")
        return g

    bit_or = AggregateFn(
        init=lambda k: 0,
        merge=lambda a, b: a | b,
        accumulate_row=lambda a, row: a | row["m"],
        name="mask",
    )
    masks = (
        ds.map_batches(partial, batch_format="pyarrow").groupby("user_id").aggregate(bit_or)
    )

    def hist(t: pa.Table) -> pd.DataFrame:
        m = t["mask"].to_numpy()
        pop = np.array([int(x).bit_count() for x in m], dtype=np.int64)
        df = pd.DataFrame({"n_active_days": pop, "mask": m})
        g = df.groupby("n_active_days", as_index=False).agg(
            n=("mask", "size"), s=("mask", "sum")
        )
        g["n"] = g["n"].astype("int64")
        g["s"] = g["s"].astype("int64")
        return g

    out = (
        masks.map_batches(hist, batch_format="pyarrow")
        .groupby("n_active_days")
        .aggregate(Sum("n", alias_name="n_users"), Sum("s", alias_name="mask_sum"))
        .to_pandas()
        .sort_values("n_active_days")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def user_active_day_bitmap_sql() -> str:
    return """
        WITH md AS (SELECT MIN(CAST(ts AS DATE)) AS m FROM events),
        b AS (
            SELECT user_id,
                   bit_or(CAST(1 AS BIGINT) <<
                          date_diff('day', md.m, CAST(ts AS DATE))) AS mask
            FROM events, md GROUP BY 1
        )
        SELECT CAST(bit_count(mask) AS BIGINT) AS n_active_days,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(mask) AS BIGINT) AS mask_sum
        FROM b GROUP BY 1 ORDER BY 1
    """


def l_diversity_check(sf_dir: str, l_min: int = 3) -> pd.DataFrame:
    """l-diversity privacy audit (the step AFTER k-anonymity): treating
    (nation, account-balance band of $1000) as the quasi-identifier and
    market segment as the SENSITIVE attribute, report per nation how
    many QI groups exist, how many are below l_min distinct sensitive
    values (re-identification risk even when k-anonymous), and the
    worst (minimum) diversity — the gate before releasing a
    pseudonymized cut.

    Distributed plan: distinct (nation, band, segment) triples collapse
    per batch, finish in a coarse shard keyed on the packed QI, and the
    per-nation audit folds through a 25-row groupby. Negative balances
    band with FLOOR semantics on integer cents, bit-identical to the
    oracle's floor(cents/1e5)."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal", "c_mktsegment"]
    )

    def triples(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"]).to_numpy()
        band = cents // 100000  # numpy floor division == floor(cents/1e5)
        df = pd.DataFrame(
            {
                "nation": t["c_nationkey"].to_numpy(),
                "band": band,
                "seg": t["c_mktsegment"].to_pylist(),
            }
        ).drop_duplicates()
        df["_shard"] = ((df["nation"] * 31 + df["band"]) % 64).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["nation", "band", "seg"])
        q = g.groupby(["nation", "band"], as_index=False).agg(l=("seg", "nunique"))
        out = q.groupby("nation", as_index=False).agg(
            n_groups=("l", "size"),
            n_low=("l", lambda s: int((s < l_min).sum())),
            min_l=("l", "min"),
        )
        for c in ("n_groups", "n_low", "min_l"):
            out[c] = out[c].astype("int64")
        return out

    out = (
        ds.map_batches(triples, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
        .groupby("nation")
        .aggregate(
            Sum("n_groups", alias_name="n_groups"),
            Sum("n_low", alias_name="n_low_diversity"),
            Min("min_l", alias_name="min_l"),
        )
        .to_pandas()
        .sort_values("nation")
        .reset_index(drop=True)
    )
    for c in ("n_groups", "n_low_diversity", "min_l"):
        out[c] = out[c].astype("int64")
    return out[["nation", "n_groups", "n_low_diversity", "min_l"]]


def l_diversity_check_sql(l_min: int = 3) -> str:
    return f"""
        WITH q AS (
            SELECT c_nationkey AS nation,
                   CAST(FLOOR(CAST(ROUND(c_acctbal * 100) AS BIGINT) / 100000.0)
                        AS BIGINT) AS band,
                   COUNT(DISTINCT c_mktsegment) AS l
            FROM customer GROUP BY 1, 2
        )
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN l < {l_min} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_low_diversity,
               CAST(MIN(l) AS BIGINT) AS min_l
        FROM q GROUP BY 1 ORDER BY 1
    """


def lineitem_corr_stats(sf_dir: str) -> pd.DataFrame:
    """Feature-covariance sufficient statistics: for every pair of the
    four lineitem numerics (quantity, price in whole dollars, discount
    pct, tax pct) the EXACT integer (n, Σx, Σy, Σx², Σy², Σxy) — the
    Pearson correlation matrix is derivable downstream without a single
    float crossing the wire, and partial sums merge associatively so
    the whole computation is one embarrassingly parallel fold.

    Overflow bound: dollars ≤ ~1e5, squared 1e10, summed over ≤ 1e8
    rows fits int64; beyond that, shard the fold and publish per-shard
    limbs."""
    import numpy as np

    COLS = ["qty", "dollars", "disc_pct", "tax_pct"]

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        m = np.stack(
            [
                t["l_quantity"].to_numpy().astype(np.int64),
                # half-up on exact cents (numpy round is half-to-even,
                # DuckDB ROUND is half-away — sidestep both)
                (_cents(t["l_extendedprice"]).to_numpy() + 50) // 100,
                np.round(t["l_discount"].to_numpy() * 100).astype(np.int64),
                np.round(t["l_tax"].to_numpy() * 100).astype(np.int64),
            ],
            axis=1,
        )
        rows = []
        for i in range(4):
            for j in range(i + 1, 4):
                x, y = m[:, i], m[:, j]
                rows.append(
                    (
                        f"{COLS[i]}|{COLS[j]}", len(x), int(x.sum()), int(y.sum()),
                        int((x * x).sum()), int((y * y).sum()), int((x * y).sum()),
                    )
                )
        return pd.DataFrame(
            rows, columns=["pair", "n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_x", alias_name="sum_x"),
            Sum("sum_y", alias_name="sum_y"),
            Sum("sum_xx", alias_name="sum_xx"),
            Sum("sum_yy", alias_name="sum_yy"),
            Sum("sum_xy", alias_name="sum_xy"),
        )
        .to_pandas()
        .sort_values("pair")
        .reset_index(drop=True)
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def lineitem_corr_stats_sql() -> str:
    pairs = {
        "qty": "CAST(l_quantity AS BIGINT)",
        "dollars": "CAST(FLOOR((ROUND(l_extendedprice * 100) + 50) / 100.0) AS BIGINT)",
        "disc_pct": "CAST(ROUND(l_discount * 100) AS BIGINT)",
        "tax_pct": "CAST(ROUND(l_tax * 100) AS BIGINT)",
    }
    cols = list(pairs)
    selects = []
    for i in range(4):
        for j in range(i + 1, 4):
            x, y = pairs[cols[i]], pairs[cols[j]]
            selects.append(
                f"""SELECT '{cols[i]}|{cols[j]}' AS pair,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM({x}) AS BIGINT) AS sum_x,
                    CAST(SUM({y}) AS BIGINT) AS sum_y,
                    CAST(SUM({x} * {x}) AS BIGINT) AS sum_xx,
                    CAST(SUM({y} * {y}) AS BIGINT) AS sum_yy,
                    CAST(SUM({x} * {y}) AS BIGINT) AS sum_xy
                FROM lineitem"""
            )
    return " UNION ALL ".join(selects) + " ORDER BY pair"


def largest_remainder_allocation(sf_dir: str, total_bps: int = 10000) -> pd.DataFrame:
    """Exact fixed-point share allocation: each market segment's revenue
    share in basis points, allocated by the largest-remainder (Hamilton)
    method so the published shares sum to EXACTLY total_bps — the
    integer-arithmetic answer to 'percentages that must add to 100' that
    naive per-row rounding gets wrong.

    Distributed plan: the revenue reduce is the broadcast-join +
    partial-agg shape of segment_revenue; the allocation itself touches
    one row per segment on the driver. All integer math (floor shares +
    remainder ranks), bit-stable at any parallelism."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    cust_ref = ray.put(cust)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(cust_ref)
        j = t.join(c, keys="o_custkey", right_keys="c_custkey", join_type="inner")
        g = pa.TableGroupBy(
            pa.table({"seg": j["c_mktsegment"], "cents": _cents(j["o_totalprice"])}),
            "seg",
        ).aggregate([("cents", "sum")])
        return pa.table({"seg": g["seg"], "cents": g["cents_sum"]})

    s = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("seg")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("seg")
        .reset_index(drop=True)
    )
    import numpy as np

    cents = s["cents"].to_numpy().astype(np.int64)
    tot = int(cents.sum())
    fl = cents * total_bps // tot
    rem = cents * total_bps % tot
    short = total_bps - int(fl.sum())
    # rank remainders descending, segment name ascending as tiebreak
    order = np.lexsort((s["seg"].to_numpy(), -rem))
    bump = np.zeros(len(s), dtype=np.int64)
    bump[order[:short]] = 1
    out = pd.DataFrame(
        {
            "seg": s["seg"],
            "cents": cents,
            "bps": (fl + bump).astype("int64"),
        }
    )
    assert int(out["bps"].sum()) == total_bps
    return out


def largest_remainder_allocation_sql(total_bps: int = 10000) -> str:
    return f"""
        WITH s AS (
            SELECT c.c_mktsegment AS seg,
                   CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        ),
        t AS (SELECT SUM(cents) AS tot FROM s),
        f AS (
            SELECT seg, cents,
                   cents * {total_bps} // t.tot AS fl,
                   cents * {total_bps} % t.tot AS rem
            FROM s, t
        ),
        sh AS (SELECT {total_bps} - SUM(fl) AS short FROM f)
        SELECT seg, cents,
               CAST(fl + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, seg)
                              <= sh.short THEN 1 ELSE 0 END AS BIGINT) AS bps
        FROM f, sh ORDER BY seg
    """


def markov_backtest(sf_dir: str, cutoff: str = "2024-01-16") -> pd.DataFrame:
    """Temporal backtest of a first-order Markov next-event model:
    transition counts learned on pairs completing BEFORE the cutoff,
    top-1 accuracy measured on pairs completing after — per previous
    event type, the (n_eval, n_correct) cells an eval dashboard plots.
    Prediction ties break (count DESC, type ASC), so the whole metric
    is integer-deterministic.

    Distributed plan: consecutive-pair extraction needs per-user order,
    so pairs materialize inside a 64-way coarse user shard (map_groups
    sorts each user's slice locally — never a global sort); train/eval
    partial counts fold through one (split, prev, next) groupby into a
    ~2*T^2-row grid; the model argmax and the accuracy join run on the
    driver over that tiny grid."""
    import numpy as np

    cut = np.datetime64(cutoff, "us").astype(np.int64)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "event_id"]
    )

    def shardify(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": pa.array(
                    t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                    pa.int64(),
                ),
                "event_id": t["event_id"],
                "_shard": pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32()),
            }
        )

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        same = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        prev = g["event_type"].to_numpy()[:-1][same]
        nxt = g["event_type"].to_numpy()[1:][same]
        ts = g["ts_us"].to_numpy()[1:][same]
        df = pd.DataFrame(
            {"split": np.where(ts < cut, "train", "eval"), "prev": prev, "next": nxt}
        )
        out = df.groupby(["split", "prev", "next"], as_index=False).size()
        out = out.rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    grid = (
        ds.map_batches(shardify, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_pairs, batch_format="pandas")
        .groupby(["split", "prev", "next"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    train = grid[grid["split"] == "train"].copy()
    # argmax next per prev: count DESC, next ASC
    train = train.sort_values(["prev", "n", "next"], ascending=[True, False, True])
    model = train.drop_duplicates("prev")[["prev", "next"]].rename(
        columns={"next": "pred"}
    )
    ev = grid[grid["split"] == "eval"].merge(model, on="prev", how="inner")
    ev["correct"] = np.where(ev["next"] == ev["pred"], ev["n"], 0)
    out = ev.groupby("prev", as_index=False).agg(
        n_eval=("n", "sum"), n_correct=("correct", "sum")
    )
    out = out.rename(columns={"prev": "event_type"})
    out["n_eval"] = out["n_eval"].astype("int64")
    out["n_correct"] = out["n_correct"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def markov_backtest_sql(cutoff: str = "2024-01-16") -> str:
    return f"""
        WITH seq AS (
            SELECT user_id, event_type, ts,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ),
        pairs AS (
            SELECT prev, event_type AS next, ts FROM seq WHERE prev IS NOT NULL
        ),
        train AS (
            SELECT prev, next, COUNT(*) AS n FROM pairs
            WHERE ts < TIMESTAMP '{cutoff}' GROUP BY 1, 2
        ),
        model AS (
            SELECT prev, next AS pred FROM train
            QUALIFY ROW_NUMBER() OVER (PARTITION BY prev
                                       ORDER BY n DESC, next) = 1
        ),
        ev AS (
            SELECT prev, next FROM pairs WHERE ts >= TIMESTAMP '{cutoff}'
        )
        SELECT e.prev AS event_type, CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(CASE WHEN e.next = m.pred THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_correct
        FROM ev e JOIN model m USING (prev)
        GROUP BY 1 ORDER BY 1
    """


def user_p95_distribution(sf_dir: str, band_cents: int = 5000) -> pd.DataFrame:
    """Per-entity tail latency profile: each user's exact p95 of event
    value (quantile_disc semantics: 1-based rank ceil(0.95 n)), banded
    into `band_cents` buckets — 'how many of my users have a heavy
    tail', the fleet-health histogram SLO reviews read.

    Distributed plan: per-user quantiles are NOT combinable from batch
    partials, so this is the one shape that must co-locate each user's
    values — a 64-way coarse shard moving ONLY (user_id, cents) (12
    bytes/row) where each shard computes its users' p95 with one vector
    sort; the band histogram folds through a tiny groupby. At 100 TB
    the same shape holds: the exchange payload is two ints/row."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def shardify(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "cents": _cents(t["value"]),
                "_shard": pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32()),
            }
        )

    def shard_p95(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "cents"], kind="mergesort")
        u = g["user_id"].to_numpy()
        c = g["cents"].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        ends = np.concatenate([starts[1:], [len(u)]])
        n = ends - starts
        ranks = np.ceil(0.95 * n).astype(np.int64)  # 1-based
        p95 = c[starts + ranks - 1]
        bands = p95 // band_cents
        ub, cb = np.unique(bands, return_counts=True)
        return pd.DataFrame({"band": ub.astype("int64"), "n": cb.astype("int64")})

    out = (
        ds.map_batches(shardify, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_p95, batch_format="pandas")
        .groupby("band")
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
        .sort_values("band")
        .reset_index(drop=True)
    )
    out["band"] = out["band"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


def user_p95_distribution_sql(band_cents: int = 5000) -> str:
    return f"""
        WITH p AS (
            SELECT user_id,
                   quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.95) AS p95
            FROM events GROUP BY 1
        )
        SELECT CAST(p95 // {band_cents} AS BIGINT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM p GROUP BY 1 ORDER BY 1
    """


def rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM segmentation: per customer-with-orders compute Recency (last
    order date), Frequency (order count) and Monetary (lifetime cents),
    NTILE(4) each dimension WITHIN the customer's market segment, and
    report the population and revenue of every (segment, rfm_code)
    cell — the classic CRM cube a marketing mix is allocated from.

    Distributed plan: orders fold to one row per customer (single-key
    groupby — the only lineage-width exchange), the customer dimension
    broadcasts once (ray.put + Arrow hash join per batch), and the
    NTILE ranks are assigned inside groupby(segment).map_groups, where
    each segment sorts locally; the final cube is a tiny aggregate.
    Tie order is pinned (custkey) so both sides agree bit-for-bit."""
    import numpy as np

    per_cust = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                    "last_us": pc.cast(
                        pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()
                    ),
                    "cents": _cents(t["o_totalprice"]),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(
            Max("last_us", alias_name="last_us"),
            Count(alias_name="n_orders"),
            Sum("cents", alias_name="total_cents"),
        )
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ref = ray.put(cust)

    class AttachSegment:
        def __init__(self):
            self.cust = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.join(
                self.cust,
                keys="o_custkey",
                right_keys="c_custkey",
                join_type="inner",
            )

    def _ntile4(order: np.ndarray) -> np.ndarray:
        # order: positions sorted by the dimension; NTILE's uneven rule
        n = len(order)
        base, rem = divmod(n, 4)
        sizes = [base + (1 if i < rem else 0) for i in range(4)]
        ranks = np.empty(n, dtype=np.int64)
        ranks[order] = np.repeat(np.arange(1, 5, dtype=np.int64), sizes)
        return ranks

    def per_segment(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["o_custkey"].to_numpy()
        # DESC dimension, custkey ASC tie-break == argsort of (-dim, ck)
        r = _ntile4(np.lexsort((ck, -g["last_us"].to_numpy())))
        f = _ntile4(np.lexsort((ck, -g["n_orders"].to_numpy())))
        m = _ntile4(np.lexsort((ck, -g["total_cents"].to_numpy())))
        df = pd.DataFrame(
            {
                "rfm_code": r * 100 + f * 10 + m,
                "total_cents": g["total_cents"].to_numpy(),
            }
        )
        agg = df.groupby("rfm_code", as_index=False).agg(
            n_customers=("total_cents", "size"),
            monetary_cents=("total_cents", "sum"),
        )
        agg.insert(0, "c_mktsegment", g["c_mktsegment"].iloc[0])
        return agg

    out = (
        per_cust.map_batches(AttachSegment, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("c_mktsegment")
        .map_groups(per_segment, batch_format="pandas")
        .to_pandas()
        .sort_values(["c_mktsegment", "rfm_code"])
        .reset_index(drop=True)
    )
    for c in ("rfm_code", "n_customers", "monetary_cents"):
        out[c] = out[c].astype("int64")
    return out


def rfm_segments_sql() -> str:
    return """
        WITH per_cust AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_dt,
                   COUNT(*) AS n_orders,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents
            FROM orders GROUP BY 1
        ), ranked AS (
            SELECT c_mktsegment, total_cents,
                   NTILE(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY last_dt DESC, o_custkey) AS r,
                   NTILE(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY n_orders DESC, o_custkey) AS f,
                   NTILE(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY total_cents DESC, o_custkey) AS m
            FROM per_cust JOIN customer ON c_custkey = o_custkey
        )
        SELECT c_mktsegment,
               CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm_code,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(total_cents) AS BIGINT) AS monetary_cents
        FROM ranked GROUP BY 1, 2 ORDER BY 1, 2
    """


def daily_ewma(sf_dir: str) -> pd.DataFrame:
    """EWMA (alpha = 1/2) of the daily event count — the smoothed
    monitoring curve an ingest dashboard alarms on. s_0 = x_0,
    s_t = (x_t + s_{t-1}) / 2.

    Exactness: with a power-of-two alpha every term is a dyadic
    rational; s_t = 0.5^t * cumsum(c_i * x_i) with integer
    coefficients c_0 = 1, c_i = 2^(i-1), and the integer cumsum stays
    far below 2^53, so BOTH engines produce bit-identical float64 —
    an EWMA whose SQL oracle hash-matches despite being float-valued.

    Distributed plan: the heavy part (per-day counts) is one
    date-keyed aggregate; the recurrence folds on the bounded
    day-count series (one row per day, driver-side by construction)."""
    import numpy as np

    daily = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(
            lambda t: pa.table(
                {"d": pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.date32())}
            ),
            batch_format="pyarrow",
        )
        .groupby("d")
        .aggregate(Count(alias_name="n_events"))
        .to_pandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    x = daily["n_events"].to_numpy().astype(np.int64)
    t_idx = np.arange(len(x), dtype=np.int64)
    coeff = np.where(t_idx == 0, 1, 1 << np.maximum(t_idx - 1, 0))
    ewma = np.cumsum(coeff * x).astype(np.float64) * np.ldexp(1.0, -t_idx)
    return pd.DataFrame(
        {
            "d": pd.to_datetime(daily["d"]),
            "n_events": x,
            "ewma": ewma,
        }
    )


def daily_ewma_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1
        ), idx AS (
            SELECT d, n_events,
                   ROW_NUMBER() OVER (ORDER BY d) - 1 AS t
            FROM daily
        )
        SELECT CAST(d AS TIMESTAMP) AS d, n_events,
               SUM(n_events * CASE WHEN t = 0 THEN 1
                                   ELSE (1::BIGINT << (t - 1)) END)
                   OVER (ORDER BY d) * POWER(0.5, t) AS ewma
        FROM idx ORDER BY d
    """


def supplier_cnt_by_part_attrs(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape (adapted: no partsupp table in this schema, so
    lineitem is the part<->supplier relation, and the excluded-supplier
    subquery keys on negative account balance instead of the comment
    field): distinct supplier count per (p_brand, p_type, p_size) for
    parts outside one brand, suppliers not in the exclusion set.

    Distributed plan: both dimension sides (filtered part attrs,
    excluded suppkeys) broadcast once; lineitem streams through a
    vectorized join+filter that projects DISTINCT (attrs, suppkey)
    pairs per batch (the combiner), then one pair-keyed groupby
    dedupes globally and a tiny attrs-keyed count finishes. The
    exchange carries pair cardinality, never lineitem cardinality."""
    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).filter(pc.not_equal(pc.field("p_brand"), "Brand#1"))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"])
    bad = set(
        sup.filter(pc.less(pc.field("s_acctbal"), 1000.0))["s_suppkey"].to_pylist()
    )
    part_ref = ray.put(part)
    bad_ref = ray.put(sorted(bad))

    class PairUp:
        def __init__(self):
            self.part = ray.get(part_ref)
            self.bad = pa.array(ray.get(bad_ref), pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.invert(pc.is_in(pc.cast(t["l_suppkey"], pa.int64()), self.bad))
            )
            j = pa.table(
                {
                    "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                    "s": pc.cast(t["l_suppkey"], pa.int64()),
                }
            ).join(self.part, keys="l_partkey", right_keys="p_partkey", join_type="inner")
            j = j.select(["p_brand", "p_type", "p_size", "s"])
            return j.group_by(["p_brand", "p_type", "p_size", "s"]).aggregate([])

    pairs = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
        .map_batches(PairUp, batch_format="pyarrow", concurrency=(1, 4))
        .groupby(["p_brand", "p_type", "p_size", "s"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    out = (
        pairs.groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Count(alias_name="supplier_cnt"))
        .to_pandas()
        .sort_values(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            ascending=[False, True, True, True],
        )
        .reset_index(drop=True)
    )
    out["p_size"] = out["p_size"].astype("int64")
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out


def supplier_cnt_by_part_attrs_sql() -> str:
    return """
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """


def best_supplier_per_part(sf_dir: str, region: str = "EUROPE") -> pd.DataFrame:
    """TPC-H Q2 shape (adapted: lineitem is the part<->supplier
    relation; 'minimum supply cost' becomes 'maximum account balance',
    tie-broken by lowest suppkey): for every part sourced from a given
    region, the single best supplier in that region.

    Distributed plan: the region-filtered supplier dimension broadcasts
    once; lineitem streams to distinct (partkey, suppkey) pairs with
    the per-batch dedupe combiner; the argmax-per-part runs as ONE
    single-key Max aggregate over a packed int64 sort key
    (cents * 2^32 + (2^32-1 - suppkey)) — max picks highest balance
    then lowest suppkey with no window function and no row shuffle
    beyond the pair exchange."""
    sup = pq.read_table(f"{sf_dir}/supplier.parquet")
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    nk = set(
        nat.join(
            reg.filter(pc.equal(pc.field("r_name"), region)),
            keys="n_regionkey",
            right_keys="r_regionkey",
            join_type="inner",
        )["n_nationkey"].to_pylist()
    )
    sup = sup.filter(
        pc.is_in(pc.cast(sup["s_nationkey"], pa.int64()), pa.array(sorted(nk), pa.int64()))
    )
    packed = pa.table(
        {
            "s_suppkey": pc.cast(sup["s_suppkey"], pa.int64()),
            "s_name": sup["s_name"],
            "bal_cents": _cents(sup["s_acctbal"]),
        }
    )
    ref = ray.put(packed)

    class PackPairs:
        def __init__(self):
            self.sup = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pairs = pa.table(
                {
                    "p": pc.cast(t["l_partkey"], pa.int64()),
                    "s": pc.cast(t["l_suppkey"], pa.int64()),
                }
            ).group_by(["p", "s"]).aggregate([])
            j = pairs.join(
                self.sup, keys="s", right_keys="s_suppkey", join_type="inner"
            )
            key = pc.add(
                pc.multiply(j["bal_cents"], pa.scalar(1 << 32, pa.int64())),
                pc.subtract(pa.scalar((1 << 32) - 1, pa.int64()), j["s"]),
            )
            return pa.table({"p_partkey": j["p"], "key": key})

    best = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
        .map_batches(PackPairs, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("p_partkey")
        .aggregate(Max("key", alias_name="key"))
        .to_pandas()
    )
    best["bal_cents"] = (best["key"] // (1 << 32)).astype("int64")
    best["s_suppkey"] = ((1 << 32) - 1 - (best["key"] % (1 << 32))).astype("int64")
    names = packed.to_pandas()[["s_suppkey", "s_name"]]
    out = best.merge(names, on="s_suppkey")[
        ["p_partkey", "s_suppkey", "s_name", "bal_cents"]
    ]
    out["p_partkey"] = out["p_partkey"].astype("int64")
    return (
        out.sort_values(["bal_cents", "p_partkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


def best_supplier_per_part_sql(region: str = "EUROPE") -> str:
    return f"""
        WITH pairs AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ), eu AS (
            SELECT s_suppkey, s_name,
                   CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bal_cents
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = '{region}'
        ), ranked AS (
            SELECT l_partkey AS p_partkey, s_suppkey, s_name, bal_cents,
                   ROW_NUMBER() OVER (PARTITION BY l_partkey
                                      ORDER BY bal_cents DESC, s_suppkey) AS rn
            FROM pairs JOIN eu ON l_suppkey = s_suppkey
        )
        SELECT p_partkey, s_suppkey, s_name, bal_cents
        FROM ranked WHERE rn = 1
        ORDER BY bal_cents DESC, p_partkey
    """


def time_embargo_split(
    sf_dir: str, cutoff: str = "2024-01-24", embargo_days: int = 2
) -> pd.DataFrame:
    """Purged time-series split: events before (cutoff - embargo) are
    TRAIN, events on/after cutoff are TEST, and the embargo gap between
    them is DROPPED — the leakage guard financial-ML evaluation uses so
    near-boundary rows can't straddle the split. Reports each bucket's
    event count, distinct users and exact cents total.

    Distributed plan: the bucket label is a pure per-row function
    (embarrassingly parallel map_batches); distinct users fold through
    one (bucket, user)-keyed dedupe before the tiny bucket-keyed
    finalize, so the exchange carries user cardinality, not events."""
    import numpy as np

    cutoff_us = int(pd.Timestamp(cutoff).value // 1000)
    embargo_us = embargo_days * 86_400_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
    )

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        lab = np.where(
            us < cutoff_us - embargo_us,
            "train",
            np.where(us >= cutoff_us, "test", "embargo"),
        )
        return pa.table(
            {
                "split": pa.array(lab, pa.string()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "cents": _cents(t["value"]),
            }
        )

    labeled = ds.map_batches(bucket, batch_format="pyarrow")
    per_bucket = (
        labeled.groupby("split")
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="sum_cents"))
        .to_pandas()
    )
    users = (
        labeled.groupby(["split", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .groupby("split")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    out = (
        per_bucket.merge(users, on="split")
        .sort_values("split")
        .reset_index(drop=True)[["split", "n_events", "n_users", "sum_cents"]]
    )
    for c in ("n_events", "n_users", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out


def time_embargo_split_sql(cutoff: str = "2024-01-24", embargo_days: int = 2) -> str:
    return f"""
        SELECT CASE
                 WHEN ts < TIMESTAMP '{cutoff}' - INTERVAL {embargo_days} DAY
                     THEN 'train'
                 WHEN ts >= TIMESTAMP '{cutoff}' THEN 'test'
                 ELSE 'embargo' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events GROUP BY 1 ORDER BY 1
    """


def event_type_user_sets(
    sf_dir: str, value_floor: float = 200.0, since: str = "2024-01-24"
) -> pd.DataFrame:
    """Set-algebra audit over two behaviours — A = ever made a
    high-value purchase (value >= floor), B = hit an error recently
    (ts >= since): of all users in the events table, how many are in
    both sets, A only, B only, or neither — the overlap table a
    retention/incident analysis starts from. One user-keyed Max fold
    of two indicator columns, then a 4-row count: the exchange
    carries users, never events."""
    since_us = int(pd.Timestamp(since).value // 1000)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value", "ts"]
    )

    def flags(t: pa.Table) -> pa.Table:
        is_a = pc.and_(
            pc.equal(t["event_type"], "purchase"),
            pc.greater_equal(t["value"], value_floor),
        )
        is_b = pc.and_(
            pc.equal(t["event_type"], "error"),
            pc.greater_equal(
                pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), since_us
            ),
        )
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "has_a": pc.cast(is_a, pa.int64()),
                "has_b": pc.cast(is_b, pa.int64()),
            }
        )

    per_user = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("has_a", alias_name="has_a"), Max("has_b", alias_name="has_b"))
    )

    def label(t: pa.Table) -> pa.Table:
        import numpy as np

        a = t["has_a"].to_numpy(zero_copy_only=False).astype(bool)
        b = t["has_b"].to_numpy(zero_copy_only=False).astype(bool)
        lab = np.where(a & b, "both", np.where(a, "a_only", np.where(b, "b_only", "neither")))
        return pa.table({"bucket": pa.array(lab, pa.string())})

    out = (
        per_user.map_batches(label, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def event_type_user_sets_sql(
    value_floor: float = 200.0, since: str = "2024-01-24"
) -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' AND value >= {value_floor}
                            THEN 1 ELSE 0 END) AS has_a,
                   MAX(CASE WHEN event_type = 'error' AND ts >= TIMESTAMP '{since}'
                            THEN 1 ELSE 0 END) AS has_b
            FROM events GROUP BY 1
        )
        SELECT CASE WHEN has_a = 1 AND has_b = 1 THEN 'both'
                    WHEN has_a = 1 THEN 'a_only'
                    WHEN has_b = 1 THEN 'b_only'
                    ELSE 'neither' END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM per_user GROUP BY 1 ORDER BY 1
    """


def consistent_big_spenders(sf_dir: str) -> pd.DataFrame:
    """ALL-quantifier query: customers whose EVERY order beats their
    segment's average order price (strictly) — i.e. MIN(per-customer
    price) > AVG(segment price). The comparison is done in exact
    integers (min_cents * seg_order_count > seg_sum_cents), so the
    float average never appears and both engines agree bit-for-bit.

    Distributed plan: one customer-keyed fold of (min_cents, n, sum),
    the tiny segment dimension broadcasts; segment totals come from a
    5-row re-aggregate of the per-customer partials (no second scan of
    orders)."""
    per_cust = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                    "cents": _cents(t["o_totalprice"]),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(
            Min("cents", alias_name="min_cents"),
            Count(alias_name="n_orders"),
            Sum("cents", alias_name="sum_cents"),
        )
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ref = ray.put(cust)

    class AttachSeg:
        def __init__(self):
            self.cust = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.join(
                self.cust, keys="o_custkey", right_keys="c_custkey", join_type="inner"
            )

    with_seg = per_cust.map_batches(
        AttachSeg, batch_format="pyarrow", concurrency=(1, 2)
    ).materialize()

    seg = (
        with_seg.groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="seg_n"), Sum("sum_cents", alias_name="seg_sum")
        )
        .to_pandas()
    )
    seg_n = dict(zip(seg["c_mktsegment"], seg["seg_n"].astype("int64")))
    seg_sum = dict(zip(seg["c_mktsegment"], seg["seg_sum"].astype("int64")))
    seg_ref = ray.put((seg_n, seg_sum))

    def pick(t: pa.Table) -> pa.Table:
        import numpy as np

        sn, ss = ray.get(seg_ref)
        segs = t["c_mktsegment"].to_pylist()
        n = np.array([sn[s] for s in segs], dtype=np.int64)
        s = np.array([ss[s] for s in segs], dtype=np.int64)
        keep = t["min_cents"].to_numpy(zero_copy_only=False).astype("int64") * n > s
        return t.filter(pa.array(keep))

    out = (
        with_seg.map_batches(pick, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_customers"), Sum("sum_cents", alias_name="revenue_cents")
        )
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    out["n_customers"] = out["n_customers"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


def consistent_big_spenders_sql() -> str:
    return """
        WITH o AS (
            SELECT o_custkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), per_cust AS (
            SELECT o_custkey, c_mktsegment,
                   MIN(cents) AS min_cents, COUNT(*) AS n_orders,
                   SUM(cents) AS sum_cents
            FROM o JOIN customer ON c_custkey = o_custkey GROUP BY 1, 2
        ), seg AS (
            SELECT c_mktsegment, SUM(n_orders) AS seg_n, SUM(sum_cents) AS seg_sum
            FROM per_cust GROUP BY 1
        )
        SELECT p.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(p.sum_cents) AS BIGINT) AS revenue_cents
        FROM per_cust p JOIN seg s ON p.c_mktsegment = s.c_mktsegment
        WHERE p.min_cents * s.seg_n > s.seg_sum
        GROUP BY 1 ORDER BY 1
    """


def supplier_runnerup_gap(sf_dir: str, region: str = "EUROPE", k: int = 20) -> pd.DataFrame:
    """Competitive-gap audit (TPC-H Q2 extended to top-2): for every
    part sourced from >= 2 distinct suppliers of one region, the
    balance gap between its best and second-best supplier (balance
    DESC, suppkey ASC order) — the 'how contested is this part' signal
    a sourcing optimizer ranks by. Returns the k widest gaps.

    Distributed plan: the region-filtered supplier dimension
    broadcasts once; lineitem streams to per-batch-distinct
    (part, supplier, balance) rows; a 64-way coarse shard on partkey
    finishes the global dedupe and the top-2-per-part selection
    VECTORIZED (lexsort + group-rank, no window shuffle); each shard
    keeps only its local k widest gaps so the driver merges 64*k rows."""
    import numpy as np

    sup = pq.read_table(f"{sf_dir}/supplier.parquet")
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    nk = nat.join(
        reg.filter(pc.equal(pc.field("r_name"), region)),
        keys="n_regionkey",
        right_keys="r_regionkey",
        join_type="inner",
    )["n_nationkey"]
    sup = sup.filter(pc.is_in(pc.cast(sup["s_nationkey"], pa.int64()), pc.cast(nk, pa.int64())))
    side = pa.table(
        {
            "s": pc.cast(sup["s_suppkey"], pa.int64()),
            "bal": _cents(sup["s_acctbal"]),
        }
    )
    ref = ray.put(side)

    class PairBal:
        def __init__(self):
            self.sup = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pairs = pa.table(
                {
                    "p": pc.cast(t["l_partkey"], pa.int64()),
                    "s": pc.cast(t["l_suppkey"], pa.int64()),
                }
            ).group_by(["p", "s"]).aggregate([])
            j = pairs.join(self.sup, keys="s", join_type="inner")
            return j.append_column(
                "_shard", pc.cast(pc.bit_wise_and(j["p"], 63), pa.int32())
            )

    def shard_top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["p", "s"])
        p = g["p"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        bal = g["bal"].to_numpy(np.int64)
        order = np.lexsort((s, -bal, p))  # (p ASC, bal DESC, s ASC)
        p, s, bal = p[order], s[order], bal[order]
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        sizes = np.diff(np.r_[starts, len(p)])
        best = starts[sizes >= 2]
        if not len(best):
            return pd.DataFrame(
                {
                    "p_partkey": pd.Series([], dtype="int64"),
                    "best_suppkey": pd.Series([], dtype="int64"),
                    "runnerup_suppkey": pd.Series([], dtype="int64"),
                    "gap_cents": pd.Series([], dtype="int64"),
                }
            )
        gap = bal[best] - bal[best + 1]
        top = np.lexsort((p[best], -gap))[:k]  # local k widest
        return pd.DataFrame(
            {
                "p_partkey": p[best][top],
                "best_suppkey": s[best][top],
                "runnerup_suppkey": s[best + 1][top],
                "gap_cents": gap[top],
            }
        )

    cand = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
        .map_batches(PairBal, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("_shard")
        .map_groups(shard_top2, batch_format="pandas")
        .to_pandas()
    )
    return (
        cand.sort_values(["gap_cents", "p_partkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def supplier_runnerup_gap_sql(region: str = "EUROPE", k: int = 20) -> str:
    return f"""
        WITH eu AS (
            SELECT s_suppkey, CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey WHERE r_name = '{region}'
        ), pairs AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ), ranked AS (
            SELECT l_partkey AS p, s_suppkey, bal,
                   ROW_NUMBER() OVER (PARTITION BY l_partkey
                                      ORDER BY bal DESC, s_suppkey) AS rn
            FROM pairs JOIN eu ON l_suppkey = s_suppkey
        )
        SELECT p AS p_partkey,
               MAX(CASE WHEN rn = 1 THEN s_suppkey END) AS best_suppkey,
               MAX(CASE WHEN rn = 2 THEN s_suppkey END) AS runnerup_suppkey,
               CAST(MAX(CASE WHEN rn = 1 THEN bal END)
                    - MAX(CASE WHEN rn = 2 THEN bal END) AS BIGINT) AS gap_cents
        FROM ranked WHERE rn <= 2
        GROUP BY p HAVING COUNT(*) = 2
        ORDER BY gap_cents DESC, p_partkey LIMIT {k}
    """


def same_day_repeat_orders(sf_dir: str) -> pd.DataFrame:
    """Duplicate-order audit: (customer, day) cells with >= 2 orders —
    the double-submit / bot signal an order-intake monitor counts per
    market segment. Reports, per segment, how many customer-days
    repeated and how many surplus orders they carried.

    Distributed plan: (custkey, epoch_day) packs into ONE int64
    (custkey * 4096 + day_offset — the order-date domain spans < 4096
    days, asserted), so the count is a single-key aggregate (sidesteps
    the Ray 2.49 multi-key-agg join quirk); only repeated cells —
    a tiny fraction — reach the broadcast segment join."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    BASE, SPAN = 8000, 4096  # TPC-H order dates: epoch days 8035..10592

    def pack(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()),
            pa.int64(),
        )
        off = pc.subtract(pc.divide(day, 86_400_000_000), BASE)
        if len(t):
            mm = pc.min_max(off)
            if mm["min"].as_py() < 0 or mm["max"].as_py() >= SPAN:
                raise ValueError("order date outside the packing window")
        return pa.table(
            {
                "cell": pc.add(
                    pc.multiply(pc.cast(t["o_custkey"], pa.int64()), SPAN), off
                )
            }
        )

    cells = (
        ds.map_batches(pack, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Count(alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pc.divide(t["cell"], SPAN),
                    "extra": pc.subtract(t["n"], 1),
                }
            ).filter(pc.greater(t["n"], 1)),
            batch_format="pyarrow",
        )
    )

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    cref = ray.put(cust)

    class Seg:
        def __init__(self):
            self.cust = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.join(self.cust, keys="o_custkey", right_keys="c_custkey")

    out = (
        cells.map_batches(Seg, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_repeat_cells"), Sum("extra", alias_name="n_extra_orders")
        )
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    for c in ("n_repeat_cells", "n_extra_orders"):
        out[c] = out[c].astype("int64")
    return out


def same_day_repeat_orders_sql() -> str:
    return """
        WITH cells AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
            FROM orders GROUP BY 1, 2 HAVING COUNT(*) >= 2
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_repeat_cells,
               CAST(SUM(n - 1) AS BIGINT) AS n_extra_orders
        FROM cells JOIN customer ON c_custkey = o_custkey
        GROUP BY 1 ORDER BY 1
    """


def user_lifecycle_daily(sf_dir: str) -> pd.DataFrame:
    """Growth accounting (the new / retained / resurrected / churned
    ledger every DAU dashboard decomposes into): for each day, how
    many users were active for the first time ever, active yesterday
    too, back after a gap, or active yesterday but gone today
    (churn attributed to the first silent day; nothing is attributed
    past the last observed day).

    Distributed plan: per-batch distinct (user, day) pairs, then a
    64-way coarse shard on user finishes the dedupe and classifies
    each user's day sequence VECTORIZED (sorted diffs, boundary
    masks) — the exchange carries user-day pairs, never events; the
    finalize is a tiny (day, state) aggregate. The global last day
    comes from a one-column Max pre-pass."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 86_400_000_000
        )
        d = (
            pa.table({"u": pc.cast(t["user_id"], pa.int64()), "d": day})
            .group_by(["u", "d"])
            .aggregate([])
        )
        return d.append_column("_shard", pc.cast(pc.bit_wise_and(d["u"], 63), pa.int32()))

    deduped = ds.map_batches(pairs, batch_format="pyarrow")
    gmax = int(deduped.max("d"))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "d"]).sort_values(["u", "d"])
        u = g["u"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        first = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[0, d[1:] - d[:-1]]  # valid where not first
        state = np.where(first, "new", np.where(gap == 1, "retained", "resurrected"))
        last = np.r_[first[1:], True]
        churn_day = d[(~last & np.r_[gap[1:] > 1, False]) | (last & (d < gmax))] + 1
        day = np.concatenate([d, churn_day])
        st = np.concatenate([state, np.full(len(churn_day), "churned")])
        return pd.DataFrame({"d": day, "state": st})

    out = (
        deduped.groupby("_shard")
        .map_groups(classify, batch_format="pandas")
        .groupby(["d", "state"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
        .sort_values(["d", "state"])
        .reset_index(drop=True)
    )
    out["d"] = pd.to_datetime(out["d"] * 86_400_000_000_000)
    out["n_users"] = out["n_users"].astype("int64")
    return out


def user_lifecycle_daily_sql() -> str:
    return """
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), mx AS (SELECT MAX(d) AS m FROM ud),
        seq AS (
            SELECT user_id, d,
                   LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS pd,
                   LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS nd
            FROM ud
        ), states AS (
            SELECT d, CASE WHEN pd IS NULL THEN 'new'
                           WHEN d - pd = 1 THEN 'retained'
                           ELSE 'resurrected' END AS state
            FROM seq
            UNION ALL
            SELECT d + 1, 'churned' FROM seq, mx
            WHERE (nd IS NULL AND d < m) OR (nd IS NOT NULL AND nd - d > 1)
        )
        SELECT CAST(d AS TIMESTAMP) AS d, state,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM states GROUP BY 1, 2 ORDER BY 1, 2
    """


def users_all_event_types(sf_dir: str) -> pd.DataFrame:
    """Relational DIVISION (the FOR-ALL join): users who performed
    EVERY event type in the catalog — the 'fully activated user'
    cohort definition. Returns one summary row (count + min/max/sum of
    the qualifying user ids) so the result stays O(1) while still
    pinning the exact membership set via the sum checksum.

    Distributed plan: division reduces to `count distinct types per
    user == |catalog|`; per-batch distinct (user, type) pairs shrink
    the exchange, a 64-way coarse shard on user finishes the global
    distinct + per-user nunique VECTORIZED, and each shard emits one
    partial summary row — the driver folds 64 rows. The catalog size
    comes from a tiny distinct pre-pass."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    n_types = ds.groupby("event_type").aggregate(Count(alias_name="_n")).count()

    def pairs(t: pa.Table) -> pa.Table:
        d = (
            pa.table(
                {"u": pc.cast(t["user_id"], pa.int64()), "ty": t["event_type"]}
            )
            .group_by(["u", "ty"])
            .aggregate([])
        )
        return d.append_column("_shard", pc.cast(pc.bit_wise_and(d["u"], 63), pa.int32()))

    def shard_summary(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "ty"])
        cnt = g.groupby("u", sort=False)["ty"].nunique()
        q = cnt.index.to_numpy(np.int64)[cnt.to_numpy() == n_types]
        if not len(q):
            return pd.DataFrame(
                {"n": [0], "mn": [np.iinfo(np.int64).max], "mx": [-1], "sm": [0]}
            )
        return pd.DataFrame(
            {"n": [len(q)], "mn": [q.min()], "mx": [q.max()], "sm": [q.sum()]}
        )

    parts = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_summary, batch_format="pandas")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    return pd.DataFrame(
        {
            "n_users": [n],
            "min_user": [int(parts["mn"].min()) if n else -1],
            "max_user": [int(parts["mx"].max()) if n else -1],
            "sum_user": [int(parts["sm"].sum())],
        }
    )


def users_all_event_types_sql() -> str:
    return """
        WITH t AS (SELECT COUNT(DISTINCT event_type) AS c FROM events),
        q AS (
            SELECT user_id FROM events GROUP BY 1
            HAVING COUNT(DISTINCT event_type) = (SELECT c FROM t)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(COALESCE(MIN(user_id), -1) AS BIGINT) AS min_user,
               CAST(COALESCE(MAX(user_id), -1) AS BIGINT) AS max_user,
               CAST(COALESCE(SUM(user_id), 0) AS BIGINT) AS sum_user
        FROM q
    """


def events_above_own_p95(sf_dir: str) -> pd.DataFrame:
    """Self-aggregate exceedance join: every event compared against ITS
    OWN USER'S exact p95 (quantile_disc, integer cents) — 'which event
    types drive users' personal outliers', the per-entity-threshold
    anomaly attribution a fleet monitor reports.

    Distributed plan: a naive formulation computes per-user p95 then
    JOINS it back to events (an all-to-all self-join). Co-partitioning
    kills the join: one 64-way shard on user carries (user, type,
    cents), each shard computes its users' p95 with one vector sort
    AND classifies its own rows in place (np.repeat of the group p95),
    emitting per-type partial counts; the finalize aggregates a few
    dozen rows."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"])

    def shardify(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pc.cast(t["user_id"], pa.int64()),
                "ty": t["event_type"],
                "cents": _cents(t["value"]),
                "_shard": pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32()),
            }
        )

    def shard_exceed(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "cents"], kind="mergesort")
        u = g["u"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        ranks = np.ceil(0.95 * sizes).astype(np.int64)  # 1-based
        p95 = np.repeat(c[starts + ranks - 1], sizes)
        above = c > p95
        out = pd.DataFrame({"ty": g["ty"].to_numpy(), "above": above.astype(np.int64)})
        return (
            out.groupby("ty", as_index=False)
            .agg(n_events=("above", "size"), n_above=("above", "sum"))
        )

    out = (
        ds.map_batches(shardify, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_exceed, batch_format="pandas")
        .groupby("ty")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("n_above", alias_name="n_above"))
        .to_pandas()
        .rename(columns={"ty": "event_type"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("n_events", "n_above"):
        out[c] = out[c].astype("int64")
    return out


def events_above_own_p95_sql() -> str:
    return """
        WITH c AS (
            SELECT user_id, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), p AS (
            SELECT user_id, quantile_disc(cents, 0.95) AS p95
            FROM c GROUP BY 1
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN cents > p95 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above
        FROM c JOIN p USING (user_id)
        GROUP BY 1 ORDER BY 1
    """


def customer_decile_transition(sf_dir: str, y0: int = 1997, y1: int = 1998) -> pd.DataFrame:
    """Decile transition matrix: customers ranked into revenue
    NTILE(10) within year y0 and again within y1; the 10x10 matrix of
    (decile_y0 -> decile_y1) populations — the mobility table churn /
    LTV models are calibrated on.

    The hard part is EXACT NTILE — a global rank — WITHOUT a global
    sort. Ties are removed by construction (sort key packs
    total_cents << 21 | custkey, unique and ordered exactly like
    ORDER BY total, custkey), then each year's nine decile boundaries
    are found by distributed ORDER-STATISTIC SELECTION:

      pass A (coarse histogram): one scan counts rows per high-bit
        bucket (key >> 24) — the exchange is occupied-bucket-sized;
        the driver locates, for each NTILE cut rank, the bucket
        holding it and the residual rank inside;
      pass B (refine): only the <= 9 boundary buckets' rows are
        pulled (tiny by construction) and the exact boundary keys
        read off;
      pass C (assign): a zero-shuffle scan maps every key to its
        decile via searchsorted against the 9 broadcast boundaries.

    The year-pairing is one custkey-sharded exchange of (cust, year,
    decile) triples. No stage ever holds more than bucket-histogram
    or boundary-bucket state on the driver."""
    import numpy as np

    KEY_SHIFT, BUCKET_SHIFT = 21, 24

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice", "o_orderdate"])

    def totals_prep(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        keep = pc.or_(pc.equal(yr, y0), pc.equal(yr, y1))
        t2 = t.filter(keep)
        yrbit = pc.cast(pc.equal(pc.year(t2["o_orderdate"]), y1), pa.int64())
        cust = pc.cast(t2["o_custkey"], pa.int64())
        return pa.table(
            {
                "cy": pc.add(pc.multiply(cust, 2), yrbit),
                "cents": _cents(t2["o_totalprice"]),
            }
        )

    totals = (
        ds.map_batches(totals_prep, batch_format="pyarrow")
        .groupby("cy")
        .aggregate(Sum("cents", alias_name="total"))
        .map_batches(
            lambda t: pa.table(
                {
                    "cust": pc.divide(t["cy"], 2),
                    "yb": pc.bit_wise_and(t["cy"], 1),
                    "key": pc.add(
                        pc.shift_left(t["total"], KEY_SHIFT),
                        pc.divide(t["cy"], 2),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def _assert_bounds(t: pa.Table) -> pa.Table:
        import numpy as _np

        c = t["cust"].to_numpy()
        k = t["key"].to_numpy()
        if len(c) and (int(c.max()) >= (1 << KEY_SHIFT) or int(k.max()) >= (1 << 62)):
            raise ValueError("custkey/total exceed the packing bounds")
        return t

    totals = totals.map_batches(_assert_bounds, batch_format="pyarrow").materialize()

    # pass A: occupied-bucket histogram per year
    def bucketize(t: pa.Table) -> pa.Table:
        import numpy as _np

        yb = t["yb"].to_numpy()
        bk = t["key"].to_numpy() >> BUCKET_SHIFT
        packed = yb * (1 << 40) + bk  # year-tagged bucket id
        u, c = _np.unique(packed, return_counts=True)
        return pa.table(
            {
                "b": pa.array(u, pa.int64()),
                "n": pa.array(c, pa.int64()),
                "_shard": pa.array((u & 63).astype(_np.int32), pa.int32()),
            }
        )

    def shard_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("b", as_index=False)["n"].sum()
        return s

    hist = (
        totals.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_sum, batch_format="pandas")
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )

    def cut_ranks(n: int, k: int = 10) -> np.ndarray:
        base, rem = divmod(n, k)
        sizes = np.full(k, base, dtype=np.int64)
        sizes[:rem] += 1
        return np.cumsum(sizes)[:-1]  # nine 1-based boundary ranks

    need: dict[int, list[tuple[int, int]]] = {}  # bucket -> [(yb, residual_rank)]
    n_year = {}
    for yb in (0, 1):
        h = hist[hist["b"] // (1 << 40) == yb]
        counts = h["n"].to_numpy()
        buckets = h["b"].to_numpy()
        n = int(counts.sum())
        n_year[yb] = n
        cum = np.cumsum(counts)
        for r in cut_ranks(n):
            i = int(np.searchsorted(cum, r))  # first bucket with cum >= r
            resid = int(r - (cum[i - 1] if i else 0))  # 1-based within bucket
            need.setdefault(int(buckets[i]), []).append((yb, resid))

    need_ref = ray.put(set(need))

    # pass B: pull only the boundary buckets' keys
    def pull(t: pa.Table) -> pa.Table:
        import numpy as _np

        nd = ray.get(need_ref)
        yb = t["yb"].to_numpy()
        key = t["key"].to_numpy()
        packed = yb * (1 << 40) + (key >> BUCKET_SHIFT)
        m = _np.isin(packed, _np.fromiter(nd, dtype=_np.int64, count=len(nd)))
        return pa.table(
            {"b": pa.array(packed[m], pa.int64()), "key": pa.array(key[m], pa.int64())}
        )

    picked = totals.map_batches(pull, batch_format="pyarrow").to_pandas()
    bounds = {0: [], 1: []}
    for b, want in need.items():
        ks = np.sort(picked.loc[picked["b"] == b, "key"].to_numpy(np.int64))
        for yb, resid in want:
            bounds[yb].append(int(ks[resid - 1]))
    b_ref = ray.put((np.sort(np.array(bounds[0], dtype=np.int64)),
                     np.sort(np.array(bounds[1], dtype=np.int64))))

    # pass C: decile assignment + custkey-sharded year pairing
    def assign(t: pa.Table) -> pa.Table:
        import numpy as _np

        b0, b1 = ray.get(b_ref)
        yb = t["yb"].to_numpy()
        key = t["key"].to_numpy()
        dec = _np.where(
            yb == 0,
            _np.searchsorted(b0, key, side="left"),
            _np.searchsorted(b1, key, side="left"),
        ) + 1
        cust = t["cust"].to_numpy()
        return pa.table(
            {
                "cust": pa.array(cust, pa.int64()),
                "yb": pa.array(yb, pa.int64()),
                "dec": pa.array(dec.astype(_np.int64), pa.int64()),
                "_shard": pa.array((cust & 63).astype(_np.int32), pa.int32()),
            }
        )

    def pair(g: pd.DataFrame) -> pd.DataFrame:
        w = g.pivot_table(index="cust", columns="yb", values="dec", aggfunc="first")
        if 0 not in w.columns or 1 not in w.columns:
            return pd.DataFrame(
                {"d0": pd.Series([], dtype="int64"), "d1": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        w = w.dropna(subset=[0, 1])
        out = (
            w.groupby([0, 1]).size().reset_index(name="n")
            .rename(columns={0: "d0", 1: "d1"})
        )
        return out.astype({"d0": "int64", "d1": "int64", "n": "int64"})

    out = (
        totals.map_batches(assign, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(pair, batch_format="pandas")
        .groupby(["d0", "d1"])
        .aggregate(Sum("n", alias_name="n_customers"))
        .to_pandas()
        .rename(columns={"d0": f"decile_{y0}", "d1": f"decile_{y1}"})
        .sort_values([f"decile_{y0}", f"decile_{y1}"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def customer_decile_transition_sql(y0: int = 1997, y1: int = 1998) -> str:
    return f"""
        WITH t AS (
            SELECT o_custkey AS c, year(o_orderdate) AS y,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders WHERE year(o_orderdate) IN ({y0}, {y1})
            GROUP BY 1, 2
        ), d AS (
            SELECT c, y, NTILE(10) OVER (PARTITION BY y ORDER BY cents, c) AS dec
            FROM t
        )
        SELECT a.dec AS decile_{y0}, b.dec AS decile_{y1},
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM d a JOIN d b ON a.c = b.c AND a.y = {y0} AND b.y = {y1}
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def recency_weighted_user_scores(
    sf_dir: str, anchor: str = "2024-01-31", k: int = 20
) -> pd.DataFrame:
    """Exponential time-decay engagement scoring (half-life = 1 day):
    score(user) = sum over events of value * 2^-(age_days) — the
    recency-weighted ranking feeds / re-engagement lists use. All
    arithmetic is INTEGER: with ages bounded by the retention window
    (< 31 days, asserted) every weight 2^(31-age) is an exact int64
    shift and the per-user score a plain integer sum — so the float
    decay never appears and the SQL twin (cents << shift) matches
    bit-for-bit.

    Distributed plan: weights are per-row (stateless map); per-user
    sums + local top-k fold inside a 64-way user shard so the driver
    merges 64*k candidate rows."""
    import numpy as np

    anchor_day = int(pd.Timestamp(anchor).value // (86_400_000_000 * 1000))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def weigh(t: pa.Table) -> pa.Table:
        day = (
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
            .to_numpy() // 86_400_000_000
        )
        age = anchor_day - day
        if len(age) and (age.min() < 1 or age.max() > 30):
            raise ValueError("event age outside the 1..30-day decay window")
        cents = _cents(t["value"]).to_numpy()
        score = cents << (31 - age)
        u = pc.cast(t["user_id"], pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "score": pa.array(score, pa.int64()),
                "_shard": pa.array((u & 63).astype(np.int32), pa.int32()),
            }
        )

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id", as_index=False)["score"].sum()
        s = s.sort_values(["score", "user_id"], ascending=[False, True]).head(k)
        return s

    cand = (
        ds.map_batches(weigh, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_topk, batch_format="pandas")
        .to_pandas()
    )
    out = (
        cand.sort_values(["score", "user_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out.columns = ["user_id", "decay_score_q30"]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def recency_weighted_user_scores_sql(anchor: str = "2024-01-31", k: int = 20) -> str:
    return f"""
        SELECT user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                        << (31 - date_diff('day', CAST(ts AS DATE),
                                           DATE '{anchor}'))) AS BIGINT)
                   AS decay_score_q30
        FROM events GROUP BY 1
        ORDER BY decay_score_q30 DESC, user_id LIMIT {k}
    """


def supplier_part_herfindahl(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Supply-concentration audit: per part, the Herfindahl-Hirschman
    index of supplier quantity shares, in exact parts-per-million
    (HHI_ppm = floor(sum_s qty_s^2 * 10^6 / (sum_s qty_s)^2)) — the
    'single point of failure' ranking a procurement-risk review reads.
    Returns the k most concentrated multi-supplier parts
    (HHI DESC, partkey ASC).

    Distributed plan: one packed-key (part, supplier) Sum collapses
    lineitems to the supply matrix; a 64-way part shard computes each
    part's HHI vectorized (segment sums via np.add.reduceat) and keeps
    its local top-k."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey", "l_quantity"]
    )

    def pack(t: pa.Table) -> pa.Table:
        p = pc.cast(t["l_partkey"], pa.int64())
        s = pc.cast(t["l_suppkey"], pa.int64())
        if len(t) and int(pc.max(s).as_py()) >= (1 << 20):
            raise ValueError("suppkey exceeds the 20-bit packing bound")
        return pa.table(
            {
                "ps": pc.add(pc.multiply(p, 1 << 20), s),
                "qty": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    supply = (
        ds.map_batches(pack, batch_format="pyarrow")
        .groupby("ps")
        .aggregate(Sum("qty", alias_name="qty"))
        .map_batches(
            lambda t: pa.table(
                {
                    "p": pc.divide(t["ps"], 1 << 20),
                    "qty": t["qty"],
                    "_shard": pc.cast(
                        pc.bit_wise_and(pc.divide(t["ps"], 1 << 20), 63), pa.int32()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def shard_hhi(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("p", kind="mergesort")
        p = g["p"].to_numpy(np.int64)
        q = g["qty"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        tot = np.add.reduceat(q, starts)
        sq = np.add.reduceat(q * q, starts)
        n_sup = np.diff(np.r_[starts, len(p)])
        keep = n_sup >= 2  # single-supplier parts are trivially HHI=1
        hhi = sq[keep] * 1_000_000 // (tot[keep] * tot[keep])
        parts = p[starts][keep]
        top = np.lexsort((parts, -hhi))[:k]
        return pd.DataFrame(
            {
                "p_partkey": parts[top].astype("int64"),
                "n_suppliers": n_sup[keep][top].astype("int64"),
                "hhi_ppm": hhi[top].astype("int64"),
            }
        )

    cand = supply.groupby("_shard").map_groups(shard_hhi, batch_format="pandas").to_pandas()
    return (
        cand.sort_values(["hhi_ppm", "p_partkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def supplier_part_herfindahl_sql(k: int = 25) -> str:
    return f"""
        WITH supply AS (
            SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
            FROM lineitem GROUP BY 1, 2
        ), hhi AS (
            SELECT l_partkey,
                   COUNT(*) AS n_suppliers,
                   SUM(qty * qty) * 1000000 // (SUM(qty) * SUM(qty)) AS hhi_ppm
            FROM supply GROUP BY 1 HAVING COUNT(*) >= 2
        )
        SELECT l_partkey AS p_partkey,
               CAST(n_suppliers AS BIGINT) AS n_suppliers,
               CAST(hhi_ppm AS BIGINT) AS hhi_ppm
        FROM hhi ORDER BY hhi_ppm DESC, p_partkey LIMIT {k}
    """


def events_ks_statistic(sf_dir: str, pos_type: str = "purchase") -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of one event type vs all others — the
    distribution-shift test a feature monitor runs before trusting a
    model score. EXACT integers only: D = max_v |F1(v) - F2(v)| is
    reported as its numerator d_num = max_v |c1(v)*n2 - c2(v)*n1|
    (denominator n1*n2 implied), plus the first cents value attaining
    the max — so both engines agree bit-for-bit with no float CDF.

    Distributed plan: same bounded-domain trick as
    events_value_rank_normalize — one groupby(cents) pass reduces the
    corpus to a (value, n_pos, n_neg) frequency table; the CDF scan
    runs over that domain-sized table."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        isa = pc.cast(pc.equal(t["event_type"], pos_type), pa.int64())
        return pa.table({"cents": _cents(t["value"]), "a": isa})

    freq = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("a", alias_name="a"), Count(alias_name="n"))
        .to_pandas()
        .sort_values("cents")
        .reset_index(drop=True)
    )
    a = freq["a"].to_numpy(np.int64)
    b = freq["n"].to_numpy(np.int64) - a
    n1, n2 = int(a.sum()), int(b.sum())
    diff = np.abs(np.cumsum(a) * n2 - np.cumsum(b) * n1)
    i = int(np.argmax(diff))  # first index attaining the max
    return pd.DataFrame(
        {
            "n_pos": [n1],
            "n_neg": [n2],
            "d_num": [int(diff[i])],
            "d_at_cents": [int(freq["cents"].iloc[i])],
        }
    )


def events_ks_statistic_sql(pos_type: str = "purchase") -> str:
    return f"""
        WITH f AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                   CASE WHEN event_type = '{pos_type}' THEN 1 ELSE 0 END AS isa
            FROM events
        ), g AS (
            SELECT v, SUM(isa) AS a, SUM(1 - isa) AS b FROM f GROUP BY 1
        ), c AS (
            SELECT v, SUM(a) OVER (ORDER BY v) AS ca,
                      SUM(b) OVER (ORDER BY v) AS cb
            FROM g
        ), n AS (SELECT SUM(a) AS n1, SUM(b) AS n2 FROM g)
        SELECT CAST(n1 AS BIGINT) AS n_pos,
               CAST(n2 AS BIGINT) AS n_neg,
               CAST(ABS(ca * n2 - cb * n1) AS BIGINT) AS d_num,
               CAST(v AS BIGINT) AS d_at_cents
        FROM c, n ORDER BY d_num DESC, d_at_cents LIMIT 1
    """


def events_value_auc(sf_dir: str, pos_type: str = "purchase") -> pd.DataFrame:
    """Exact Mann-Whitney AUC of `value` as a classifier for one event
    type vs the rest — 'does value alone separate purchases', the
    baseline ranking-metric every model must beat. Ties handled the
    standard way (count 1/2), kept EXACT by reporting the doubled
    numerator auc2_num = sum_v a(v) * (2*cb_before(v) + b(v)) with
    denominator 2*n1*n2 implied — pure int64, no float ranks.

    Same bounded-domain single-aggregate shape as events_ks_statistic."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        isa = pc.cast(pc.equal(t["event_type"], pos_type), pa.int64())
        return pa.table({"cents": _cents(t["value"]), "a": isa})

    freq = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("a", alias_name="a"), Count(alias_name="n"))
        .to_pandas()
        .sort_values("cents")
        .reset_index(drop=True)
    )
    a = freq["a"].to_numpy(np.int64)
    b = freq["n"].to_numpy(np.int64) - a
    cb_before = np.concatenate([[0], np.cumsum(b)[:-1]])
    auc2 = int((a * (2 * cb_before + b)).sum())
    return pd.DataFrame(
        {"n_pos": [int(a.sum())], "n_neg": [int(b.sum())], "auc2_num": [auc2]}
    )


def events_value_auc_sql(pos_type: str = "purchase") -> str:
    return f"""
        WITH f AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                   CASE WHEN event_type = '{pos_type}' THEN 1 ELSE 0 END AS isa
            FROM events
        ), g AS (
            SELECT v, SUM(isa) AS a, SUM(1 - isa) AS b FROM f GROUP BY 1
        ), c AS (
            SELECT v, a, b,
                   SUM(b) OVER (ORDER BY v) - b AS cb_before
            FROM g
        )
        SELECT CAST(SUM(a) AS BIGINT) AS n_pos,
               CAST(SUM(b) AS BIGINT) AS n_neg,
               CAST(SUM(a * (2 * cb_before + b)) AS BIGINT) AS auc2_num
        FROM c
    """


def event_type_jaccard_matrix(sf_dir: str) -> pd.DataFrame:
    """Audience-overlap matrix: exact Jaccard similarity (in ppm,
    floor) of the USER SETS behind every pair of event types — the
    'which behaviours share an audience' table segmentation and
    cross-sell analyses start from.

    Distributed plan: the per-type user sets never materialize. Each
    user folds to ONE bitmask (bit t = did type t) inside a 64-way
    user shard; the exchange is a <= 2^T-row bitmask HISTOGRAM
    (T = type-catalog size, tiny), from which the driver reads off
    every pairwise |A|, |B| and |A intersect B| exactly — all k-way
    overlaps for the cost of one user-sharded pass."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    types = sorted(
        ds.groupby("event_type").aggregate(Count(alias_name="_n")).to_pandas()["event_type"]
    )
    if len(types) > 20:
        raise ValueError("type catalog too large for the bitmask histogram")
    bit_of = {t: 1 << i for i, t in enumerate(types)}
    bref = ray.put(bit_of)

    def pairs(t: pa.Table) -> pa.Table:
        bits = ray.get(bref)
        d = (
            pa.table({"u": pc.cast(t["user_id"], pa.int64()), "ty": t["event_type"]})
            .group_by(["u", "ty"])
            .aggregate([])
        )
        b = np.array([bits[x] for x in d["ty"].to_pylist()], dtype=np.int64)
        u = d["u"].to_numpy()
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "_shard": pa.array((u & 63).astype(np.int32), pa.int32()),
            }
        )

    def shard_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("u", kind="mergesort")
        u = g["u"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        masks = np.bitwise_or.reduceat(b, starts)
        mu, mc = np.unique(masks, return_counts=True)
        return pd.DataFrame({"mask": mu.astype("int64"), "n": mc.astype("int64")})

    hist = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_hist, batch_format="pandas")
        .groupby("mask")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    masks = hist["mask"].to_numpy()
    counts = hist["n"].to_numpy()
    rows = []
    for i, ta in enumerate(types):
        for j in range(i + 1, len(types)):
            tb = types[j]
            ba, bb = 1 << i, 1 << j
            n_a = int(counts[(masks & ba) != 0].sum())
            n_b = int(counts[(masks & bb) != 0].sum())
            n_both = int(counts[((masks & ba) != 0) & ((masks & bb) != 0)].sum())
            union = n_a + n_b - n_both
            rows.append(
                (ta, tb, n_a, n_b, n_both, (n_both * 1_000_000) // union if union else 0)
            )
    return pd.DataFrame(
        rows,
        columns=["type_a", "type_b", "n_a", "n_b", "n_both", "jaccard_ppm"],
    ).astype({"n_a": "int64", "n_b": "int64", "n_both": "int64", "jaccard_ppm": "int64"})


def event_type_jaccard_matrix_sql() -> str:
    return """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        sizes AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
        ov AS (
            SELECT x.event_type AS ta, y.event_type AS tb, COUNT(*) AS n_both
            FROM ut x JOIN ut y
              ON x.user_id = y.user_id AND x.event_type < y.event_type
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type AS ta, b.event_type AS tb
            FROM sizes a JOIN sizes b ON a.event_type < b.event_type
        )
        SELECT p.ta AS type_a, p.tb AS type_b,
               CAST(sa.n AS BIGINT) AS n_a,
               CAST(sb.n AS BIGINT) AS n_b,
               CAST(COALESCE(ov.n_both, 0) AS BIGINT) AS n_both,
               CAST(COALESCE(ov.n_both, 0) * 1000000
                    // (sa.n + sb.n - COALESCE(ov.n_both, 0)) AS BIGINT)
                   AS jaccard_ppm
        FROM pairs p
        JOIN sizes sa ON sa.event_type = p.ta
        JOIN sizes sb ON sb.event_type = p.tb
        LEFT JOIN ov ON ov.ta = p.ta AND ov.tb = p.tb
        ORDER BY 1, 2
    """


def t_closeness_audit(sf_dir: str) -> pd.DataFrame:
    """t-closeness privacy audit (the third of the k-anonymity /
    l-diversity / t-closeness release-gate trio): for each
    quasi-identifier cell (day-of-week), the Earth Mover's Distance
    between the cell's sensitive-value (cents) distribution and the
    global one — reported as the EXACT integer numerator
    emd_num = sum over the ordered value spine (all but the last) of
    |C_cell(v) * N_glob - C_glob(v) * N_cell| (denominator
    N_cell * N_glob * (m-1) implied), so no float CDF ever appears
    and the SQL twin matches bit-for-bit.

    Distributed plan: the corpus folds to a (value, dow) frequency
    table via ONE packed-key aggregate (cents * 8 + dow) — the
    bounded-domain trick of events_value_rank_normalize; the CDF
    arithmetic runs over that domain-sized table."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def pack(t: pa.Table) -> pa.Table:
        day = (
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
            // 86_400_000_000
        )
        dow = (day + 4) % 7  # 0 = Sunday, matching DuckDB dayofweek()
        cents = _cents(t["value"]).to_numpy()
        return pa.table({"k": pa.array(cents * 8 + dow, pa.int64())})

    freq = (
        ds.map_batches(pack, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    k = freq["k"].to_numpy(np.int64)
    n = freq["n"].to_numpy(np.int64)
    cents = k // 8
    dow = k % 8
    spine = np.unique(cents)
    grid = np.zeros((len(spine), 7), dtype=np.int64)
    grid[np.searchsorted(spine, cents), dow] += n
    cum = np.cumsum(grid, axis=0)  # C_cell(v) per dow
    cg = cum.sum(axis=1)  # C_glob(v)
    n_cell = grid.sum(axis=0)
    n_glob = int(n_cell.sum())
    # all-but-last spine rows
    diffs = np.abs(cum[:-1] * n_glob - cg[:-1, None] * n_cell[None, :])
    emd = diffs.sum(axis=0)
    present = np.flatnonzero(n_cell > 0)
    return pd.DataFrame(
        {
            "dow": present.astype("int64"),
            "n_cell": n_cell[present].astype("int64"),
            "emd_num": emd[present].astype("int64"),
        }
    )


def t_closeness_audit_sql() -> str:
    return """
        WITH f AS (
            SELECT dayofweek(CAST(ts AS DATE)) AS dow,
                   CAST(ROUND(value * 100) AS BIGINT) AS v
            FROM events
        ), g AS (SELECT v, COUNT(*) AS ng FROM f GROUP BY 1),
        c AS (SELECT dow, v, COUNT(*) AS nc FROM f GROUP BY 1, 2),
        spine AS (
            SELECT d.dow, g.v, COALESCE(c.nc, 0) AS nc, g.ng
            FROM (SELECT DISTINCT dow FROM f) d
            CROSS JOIN g
            LEFT JOIN c ON c.dow = d.dow AND c.v = g.v
        ), w AS (
            SELECT dow, v,
                   SUM(nc) OVER (PARTITION BY dow ORDER BY v) AS ca,
                   SUM(ng) OVER (PARTITION BY dow ORDER BY v) AS cg,
                   SUM(nc) OVER (PARTITION BY dow) AS n_cell,
                   (SELECT COUNT(*) FROM f) AS n_glob
            FROM spine
        )
        SELECT dow, CAST(MAX(n_cell) AS BIGINT) AS n_cell,
               CAST(SUM(CASE WHEN v < (SELECT MAX(v) FROM g)
                             THEN ABS(ca * n_glob - cg * n_cell)
                             ELSE 0 END) AS BIGINT) AS emd_num
        FROM w GROUP BY dow ORDER BY dow
    """


def revenue_nucleus_users(sf_dir: str, pct_num: int = 9, pct_den: int = 10) -> pd.DataFrame:
    """Top-p ('nucleus') audience per event type: the SMALLEST set of
    users — taken in (revenue DESC, user ASC) order — whose combined
    value covers >= 90% of the type's total, and how concentrated that
    makes the type. The 'how few whales carry this behaviour' audit.
    Threshold arithmetic is exact: a prefix qualifies when
    cum * pct_den >= total * pct_num (no float percentages).

    Distributed plan: per-(user, type) totals fold through one
    packed-key aggregate; each type's sorted prefix scan runs inside a
    type-keyed map_groups (types are a bounded catalog; at a
    high-cardinality group key this becomes the order-statistic
    selection customer_decile_transition implements)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "cents": _cents(t["value"]),
            }
        )

    per_user = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("cents", alias_name="cents"))
    )

    def nucleus(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "user_id"], ascending=[False, True], kind="mergesort")
        c = g["cents"].to_numpy(np.int64)
        total = int(c.sum())
        cum = np.cumsum(c)
        k = int(np.searchsorted(cum * pct_den, total * pct_num, side="left")) + 1
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users_nucleus": [k],
                "n_users_total": [len(g)],
                "revenue_cents": [total],
            }
        )

    out = (
        per_user.groupby("event_type")
        .map_groups(nucleus, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("n_users_nucleus", "n_users_total", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out


def revenue_nucleus_users_sql(pct_num: int = 9, pct_den: int = 10) -> str:
    return f"""
        WITH per_user AS (
            SELECT event_type, user_id,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY 1, 2
        ), ranked AS (
            SELECT event_type, cents,
                   SUM(cents) OVER (PARTITION BY event_type
                                    ORDER BY cents DESC, user_id
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(cents) OVER (PARTITION BY event_type) AS total,
                   COUNT(*) OVER (PARTITION BY event_type) AS n_total
            FROM per_user
        )
        SELECT event_type,
               CAST(SUM(CASE WHEN (cum - cents) * {pct_den}
                                  < total * {pct_num} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_users_nucleus,
               CAST(MAX(n_total) AS BIGINT) AS n_users_total,
               CAST(MAX(total) AS BIGINT) AS revenue_cents
        FROM ranked GROUP BY 1 ORDER BY 1
    """


def user_max_drawdown(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Max drawdown per user: treating each user's event values as a
    signed flow (purchases positive, errors negative, rest zero), the
    deepest peak-to-trough fall of the running balance over time —
    the engagement-collapse signal (and the classic quant metric) in
    exact integer cents. Returns the k deepest drawdowns
    (drawdown DESC, user ASC).

    Distributed plan: one 64-way user shard carries (user, ts, signed
    cents); each shard computes every user's running sum, running max
    and their gap VECTORIZED with boundary-masked cummax resets, and
    keeps its local top-k."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"]).to_numpy()
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        signed = np.where(ty == "purchase", cents, np.where(ty == "error", -cents, 0))
        u = pc.cast(t["user_id"], pa.int64()).to_numpy()
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "ts": pa.array(ts, pa.int64()),
                "eid": pc.cast(t["event_id"], pa.int64()),
                "c": pa.array(signed, pa.int64()),
                "_shard": pa.array((u & 63).astype(np.int32), pa.int32()),
            }
        )

    def shard_dd(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts", "eid"], kind="mergesort")
        u = g["u"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        run = np.cumsum(c)
        # per-user running sum: subtract the prefix before each user
        base = np.repeat(np.r_[0, run[starts[1:] - 1]], np.diff(np.r_[starts, len(u)]))
        run = run - base
        # per-user running max via segmented cummax (log-step doubling)
        seg = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(u)]))
        peak = run.copy()
        shift = 1
        while shift < len(peak):
            ok = seg[shift:] == seg[:-shift]
            np.maximum(peak[shift:], np.where(ok, peak[:-shift], np.iinfo(np.int64).min),
                       out=peak[shift:])
            shift <<= 1
        dd = peak - run  # >= 0; deepest fall from a running peak
        per_user = pd.DataFrame({"u": u, "dd": dd}).groupby("u", as_index=False)["dd"].max()
        return per_user.sort_values(["dd", "u"], ascending=[False, True]).head(k)

    cand = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_dd, batch_format="pandas")
        .to_pandas()
    )
    out = (
        cand.sort_values(["dd", "u"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out.columns = ["user_id", "max_drawdown_cents"]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def user_max_drawdown_sql(k: int = 20) -> str:
    return f"""
        WITH flow AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'purchase'
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                        WHEN event_type = 'error'
                            THEN -CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END AS c
            FROM events
        ), runs AS (
            SELECT user_id, ts, event_id,
                   SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run
            FROM flow
        ), dd AS (
            SELECT user_id,
                   MAX(run) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - run AS d
            FROM runs
        )
        SELECT user_id, CAST(MAX(d) AS BIGINT) AS max_drawdown_cents
        FROM dd GROUP BY 1
        ORDER BY max_drawdown_cents DESC, user_id LIMIT {k}
    """


def experiment_lift_curve(sf_dir: str) -> pd.DataFrame:
    """Sequential A/B monitoring curve: per calendar day, each arm's
    CUMULATIVE purchase count and revenue, plus the cumulative lift
    numerator lift_num = purch_B * rev_A-style cross terms kept exact
    as (cum_purch_B * cum_purch_A-denominated) — concretely we report
    cum_purchases and cum_revenue_cents per (day, variant) and the
    day's exact ppm share of B in cumulative purchases
    (b_share_ppm = cum_B * 10^6 // (cum_A + cum_B)) — the curve an
    experiment dashboard watches for stabilization before calling the
    test. Assignment is the same md5(user) % 2 as experiment_lift.

    Distributed plan: one pass folds events to (day, variant) purchase
    partials (per-batch combiner, 2 x n_days exchange); the cumulative
    scan runs over the bounded day spine."""
    import hashlib as _h

    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        purch = et == "purchase"
        if not purch.any():
            return pa.table(
                {
                    "d": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        u = t["user_id"].to_numpy()[purch]
        day = (
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy()[purch]
            // 86_400_000_000
        )
        cents = _cents(t["value"]).to_numpy()[purch]
        arm = np.fromiter(
            (
                int.from_bytes(_h.md5(str(int(x)).encode()).digest()[:4], "big") % 2
                for x in u
            ),
            dtype=np.int64,
            count=len(u),
        )
        df = (
            pd.DataFrame({"d": day, "b": arm, "n": 1, "cents": cents})
            .groupby(["d", "b"], as_index=False)
            .agg(n=("n", "sum"), cents=("cents", "sum"))
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "k", pc.add(pc.multiply(t["d"], 2), t["b"])
            ).select(["k", "n", "cents"]),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    daily["d"] = daily["k"] // 2
    daily["b"] = daily["k"] % 2
    days = np.sort(daily["d"].unique())
    rows = []
    cum = {0: [0, 0], 1: [0, 0]}  # arm -> [purchases, cents]
    for d in days:
        for b in (0, 1):
            sub = daily[(daily["d"] == d) & (daily["b"] == b)]
            if len(sub):
                cum[b][0] += int(sub["n"].iloc[0])
                cum[b][1] += int(sub["cents"].iloc[0])
        tot = cum[0][0] + cum[1][0]
        for b in (0, 1):
            rows.append(
                (
                    pd.Timestamp(int(d) * 86_400_000_000_000),
                    "A" if b == 0 else "B",
                    cum[b][0],
                    cum[b][1],
                    (cum[1][0] * 1_000_000) // tot if tot else 0,
                )
            )
    return pd.DataFrame(
        rows,
        columns=["d", "variant", "cum_purchases", "cum_revenue_cents", "b_share_ppm"],
    ).astype({"cum_purchases": "int64", "cum_revenue_cents": "int64", "b_share_ppm": "int64"})


def experiment_lift_curve_sql() -> str:
    return """
        WITH p AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                        1, 8)) AS UBIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ), spine AS (
            SELECT d.d, v.variant FROM (SELECT DISTINCT d FROM p) d
            CROSS JOIN (VALUES ('A'), ('B')) v(variant)
        ), daily AS (
            SELECT s.d, s.variant,
                   COALESCE(COUNT(p.cents), 0) AS n,
                   COALESCE(SUM(p.cents), 0) AS cents
            FROM spine s LEFT JOIN p ON p.d = s.d AND p.variant = s.variant
            GROUP BY 1, 2
        ), cum AS (
            SELECT d, variant,
                   SUM(n) OVER (PARTITION BY variant ORDER BY d) AS cum_purchases,
                   SUM(cents) OVER (PARTITION BY variant ORDER BY d)
                       AS cum_revenue_cents
            FROM daily
        )
        SELECT d, variant,
               CAST(cum_purchases AS BIGINT) AS cum_purchases,
               CAST(cum_revenue_cents AS BIGINT) AS cum_revenue_cents,
               CAST(SUM(CASE WHEN variant = 'B' THEN cum_purchases ELSE 0 END)
                        OVER (PARTITION BY d) * 1000000
                    // SUM(cum_purchases) OVER (PARTITION BY d) AS BIGINT)
                   AS b_share_ppm
        FROM cum ORDER BY d, variant
    """


def order_price_reconciliation(sf_dir: str) -> pd.DataFrame:
    """Cross-table financial reconciliation: does each order's recorded
    o_totalprice equal the amount derived from its line items
    (extendedprice * (1 - discount) * (1 + tax))? The books-balance
    audit every warehouse runs after ingest. ALL arithmetic is exact
    integers: discount/tax are basis-point ints, so a line's derived
    amount is ep_cents * (100 - disc_pct) * (100 + tax_pct) over the
    implied 10^4 denominator, and the comparison multiplies the
    recorded cents by 10^4 instead of ever dividing.

    Distributed plan: lineitem folds to per-order derived numerators
    through a single-key Sum; the reconciliation join against orders
    is the hash-partitioned Dataset.join (both sides fact-sized — the
    one join shape that must shuffle); the verdict aggregates to one
    summary row."""
    import numpy as np

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )

    def derive(t: pa.Table) -> pa.Table:
        ep = _cents(t["l_extendedprice"]).to_numpy()
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()).to_numpy()
        tax = pc.cast(pc.round(pc.multiply(t["l_tax"], 100.0)), pa.int64()).to_numpy()
        num = ep * (100 - disc) * (100 + tax)
        return pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "num": pa.array(num, pa.int64()),
            }
        )

    derived = li.map_batches(derive, batch_format="pyarrow").groupby("l_orderkey").aggregate(
        Sum("num", alias_name="derived_num")
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "recorded_num": pc.multiply(_cents(t["o_totalprice"]), 10_000),
            }
        ),
        batch_format="pyarrow",
    )

    joined = derived.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def verdict(t: pa.Table) -> pa.Table:
        d = t["derived_num"].to_numpy().astype(np.int64)
        r = t["recorded_num"].to_numpy().astype(np.int64)
        ad = np.abs(d - r)
        return pa.table(
            {
                "n_orders": pa.array([len(t)], pa.int64()),
                "n_exact": pa.array([int((ad == 0).sum())], pa.int64()),
                "sum_absdiff_num": pa.array([int(ad.sum())], pa.int64()),
                "max_absdiff_num": pa.array([int(ad.max()) if len(ad) else 0], pa.int64()),
            }
        )

    parts = joined.map_batches(verdict, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "n_orders": [int(parts["n_orders"].sum())],
            "n_exact": [int(parts["n_exact"].sum())],
            "sum_absdiff_num": [int(parts["sum_absdiff_num"].sum())],
            "max_absdiff_num": [int(parts["max_absdiff_num"].max())],
        }
    )


def order_price_reconciliation_sql() -> str:
    return """
        WITH derived AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                       * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS derived_num
            FROM lineitem GROUP BY 1
        ), j AS (
            SELECT derived_num,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000 AS recorded_num
            FROM derived JOIN orders ON o_orderkey = l_orderkey
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN derived_num = recorded_num THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact,
               CAST(SUM(ABS(derived_num - recorded_num)) AS BIGINT)
                   AS sum_absdiff_num,
               CAST(MAX(ABS(derived_num - recorded_num)) AS BIGINT)
                   AS max_absdiff_num
        FROM j
    """


def first_event_type_counts(sf_dir: str) -> pd.DataFrame:
    """Onboarding first-touch distribution: each user's very first
    event (by arrival order: event_id, which the fixtures assign in ts
    order) classified by type — 'what do users do
    first, and how many land on an error' — the acquisition-health
    counterpart of latest_event_per_user. Output:
    (first_type, n_users).

    Distributed plan: 64-way user shard; each shard takes the sorted
    first row per user with one boundary mask and emits type partial
    counts; the finalize sums a catalog-sized table."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def prep(t: pa.Table) -> pa.Table:
        u = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "u": u,
                "ts": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "eid": pc.cast(t["event_id"], pa.int64()),
                "ty": t["event_type"],
                "_shard": pc.cast(pc.bit_wise_and(u, 63), pa.int32()),
            }
        )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "eid"], kind="mergesort")
        u = g["u"].to_numpy(np.int64)
        first = np.r_[True, u[1:] != u[:-1]]
        out = pd.DataFrame({"first_type": g["ty"].to_numpy()[first]})
        return out.groupby("first_type", as_index=False).size().rename(columns={"size": "n"})

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_shard, batch_format="pandas")
        .groupby("first_type")
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
        .sort_values("first_type")
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def first_event_type_counts_sql() -> str:
    return """
        WITH f AS (
            SELECT user_id, arg_min(event_type, event_id) AS first_type
            FROM events GROUP BY 1
        )
        SELECT first_type, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM f GROUP BY 1 ORDER BY 1
    """


def block_jackknife_stats(sf_dir: str, n_blocks: int = 64) -> pd.DataFrame:
    """Block-jackknife inputs for the variance of mean event value:
    users are the sampling unit (delete-one-BLOCK-of-users), so each
    of the 64 user blocks reports its exact (n, sum_cents) and the
    leave-that-block-out complement — the uncertainty machinery for
    any corpus mean when rows within a user correlate. All integers;
    the replicate means' float division is left to the analyst.

    Distributed plan: one user-sharded partial-sum pass (the shard key
    IS the jackknife block); the complement columns come from the
    64-row driver fold."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        u = pc.cast(t["user_id"], pa.int64())
        return pa.table(
            {
                "block": pc.cast(
                    pc.bit_wise_and(u, n_blocks - 1), pa.int64()
                ),
                "cents": _cents(t["value"]),
            }
        )

    blocks = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("block")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
        .to_pandas()
        .sort_values("block")
        .reset_index(drop=True)
    )
    tot_n = int(blocks["n"].sum())
    tot_s = int(blocks["sum_cents"].sum())
    blocks["loo_n"] = (tot_n - blocks["n"]).astype("int64")
    blocks["loo_sum_cents"] = (tot_s - blocks["sum_cents"]).astype("int64")
    for c in ("block", "n", "sum_cents"):
        blocks[c] = blocks[c].astype("int64")
    return blocks


def block_jackknife_stats_sql(n_blocks: int = 64) -> str:
    return f"""
        WITH b AS (
            SELECT user_id % {n_blocks} AS block,
                   COUNT(*) AS n,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sum_cents
            FROM events GROUP BY 1
        )
        SELECT CAST(block AS BIGINT) AS block,
               CAST(n AS BIGINT) AS n,
               CAST(sum_cents AS BIGINT) AS sum_cents,
               CAST(SUM(n) OVER () - n AS BIGINT) AS loo_n,
               CAST(SUM(sum_cents) OVER () - sum_cents AS BIGINT) AS loo_sum_cents
        FROM b ORDER BY block
    """


def slowest_suppliers_p90(sf_dir: str, k: int = 15) -> pd.DataFrame:
    """Logistics tail audit: per supplier, the exact p90 of ship delay
    (l_shipdate - o_orderdate, days; quantile_disc rank semantics) and
    the k slowest suppliers by that tail — the vendor-SLA review list.

    Distributed plan: the delay needs the order date, so lineitem and
    orders meet in the hash-partitioned Dataset.join (both fact-sized);
    per-supplier p90 then folds inside a 64-way supplier shard with
    one vector sort (same co-partitioned quantile shape as
    user_p95_distribution), each shard keeping its local top-k."""
    import numpy as np

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "s": pc.cast(t["l_suppkey"], pa.int64()),
                "ship_day": pc.divide(
                    pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")), pa.int64()),
                    86_400_000_000,
                ),
            }
        ),
        batch_format="pyarrow",
    )
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "order_day": pc.divide(
                    pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()),
                    86_400_000_000,
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = li.join(
        od, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def shardify(t: pa.Table) -> pa.Table:
        delay = pc.subtract(t["ship_day"], t["order_day"])
        return pa.table(
            {
                "s": t["s"],
                "delay": delay,
                "_shard": pc.cast(pc.bit_wise_and(t["s"], 63), pa.int32()),
            }
        )

    def shard_p90(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["s", "delay"], kind="mergesort")
        s = g["s"].to_numpy(np.int64)
        d = g["delay"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        sizes = np.diff(np.r_[starts, len(s)])
        ranks = np.ceil(0.9 * sizes).astype(np.int64)
        p90 = d[starts + ranks - 1]
        sup = s[starts]
        top = np.lexsort((sup, -p90))[:k]
        return pd.DataFrame(
            {
                "s_suppkey": sup[top].astype("int64"),
                "n_lineitems": sizes[top].astype("int64"),
                "p90_delay_days": p90[top].astype("int64"),
            }
        )

    cand = (
        joined.map_batches(shardify, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_p90, batch_format="pandas")
        .to_pandas()
    )
    return (
        cand.sort_values(["p90_delay_days", "s_suppkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def slowest_suppliers_p90_sql(k: int = 15) -> str:
    return f"""
        WITH d AS (
            SELECT l_suppkey,
                   date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) AS delay
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        )
        SELECT l_suppkey AS s_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems,
               CAST(quantile_disc(delay, 0.9) AS BIGINT) AS p90_delay_days
        FROM d GROUP BY 1
        ORDER BY p90_delay_days DESC, s_suppkey LIMIT {k}
    """


def events_burstiness_fano(sf_dir: str) -> pd.DataFrame:
    """Overdispersion audit: per event type, the exact integer
    sufficient statistics of the daily-count Fano factor
    (variance/mean — 1 for a Poisson arrival process, >1 = bursty):
    n_days observed, sum of daily counts, sum of squared daily counts.
    The float ratio never appears, so the SQL twin is bit-exact; the
    analyst computes F = (n*S2 - S^2) / (n * S) from the three ints.

    Distributed plan: one (type, day)-keyed count (packed into a
    single int64 key via the bounded type catalog) then a
    catalog-sized finalize — the corpus never re-shuffles."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    types = sorted(
        ds.groupby("event_type").aggregate(Count(alias_name="_n")).to_pandas()["event_type"]
    )
    idx = {t: i for i, t in enumerate(types)}
    iref = ray.put(idx)

    def pack(t: pa.Table) -> pa.Table:
        m = ray.get(iref)
        ti = np.array([m[x] for x in t["event_type"].to_pylist()], dtype=np.int64)
        day = (
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
            // 86_400_000_000
        )
        return pa.table({"k": pa.array(day * 16 + ti, pa.int64())})

    daily = (
        ds.map_batches(pack, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    daily["ty"] = daily["k"] % 16
    g = daily.groupby("ty")["n"]
    out = pd.DataFrame(
        {
            "event_type": [types[int(t)] for t in g.count().index],
            "n_days": g.count().to_numpy(),
            "sum_n": g.sum().to_numpy(),
            "sum_n2": g.apply(lambda s: int((s.to_numpy(np.int64) ** 2).sum())).to_numpy(),
        }
    )
    for c in ("n_days", "sum_n", "sum_n2"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def events_burstiness_fano_sql() -> str:
    return """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(n) AS BIGINT) AS sum_n,
               CAST(SUM(n * n) AS BIGINT) AS sum_n2
        FROM daily GROUP BY 1 ORDER BY 1
    """


def events_spearman_stats(sf_dir: str) -> pd.DataFrame:
    """Spearman rank-correlation sufficient statistics between event
    value (cents) and time-of-day (second within the day), exact in
    int64 by carrying DOUBLED average ranks: for a value with
    `cum_less` smaller rows and `c` ties, 2*r_avg = 2*cum_less + c + 1
    is always an integer.  The output row holds n and the five doubled
    sums; rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx-Sx^2)(n*Syy-Sy^2)) is a
    trivial driver-side finalize, so the SQL twin is bit-exact.

    Distributed plan: two DOMAIN-sized rank histograms (distinct cents
    <= ~56k, second-of-day <= 86400) built with one groupby each,
    broadcast as searchsorted LUTs; then one streaming map_batches +
    Sum pass over the corpus.  Nothing data-sized ever reaches the
    driver.  int64 headroom: 2r <= 2N, so Sum(dx*dy) <= 4N^3 — fine
    through ~10^6 rows per job; beyond that shard the sums per
    partition and combine (they are plain integer adds)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        x = _cents(t["value"])
        y = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        y = pc.subtract(
            pc.divide(y, 1_000_000), pc.multiply(pc.divide(pc.divide(y, 1_000_000), 86_400), 86_400)
        )
        return pa.table({"x": x, "y": pc.cast(y, pa.int64())})

    keyed = ds.map_batches(keys, batch_format="pyarrow")

    def rank_lut(col: str):
        h = keyed.groupby(col).aggregate(Count(alias_name="c")).to_pandas()
        h = h.sort_values(col)
        v = h[col].to_numpy(np.int64)
        c = h["c"].to_numpy(np.int64)
        cum = np.concatenate(([0], np.cumsum(c)[:-1]))
        return v, 2 * cum + c + 1  # doubled average rank per distinct value

    xv, xd = rank_lut("x")
    yv, yd = rank_lut("y")
    lut = ray.put((xv, xd, yv, yd))

    def to_ranks(t: pa.Table) -> pa.Table:
        xv_, xd_, yv_, yd_ = ray.get(lut)
        dx = xd_[np.searchsorted(xv_, t["x"].to_numpy(zero_copy_only=False))]
        dy = yd_[np.searchsorted(yv_, t["y"].to_numpy(zero_copy_only=False))]
        return pa.table(
            {
                "dx": pa.array(dx),
                "dy": pa.array(dy),
                "dxx": pa.array(dx * dx),
                "dyy": pa.array(dy * dy),
                "dxy": pa.array(dx * dy),
            }
        )

    agg = keyed.map_batches(to_ranks, batch_format="pyarrow").aggregate(
        Count(alias_name="n"),
        Sum("dx", alias_name="sum_dx"),
        Sum("dy", alias_name="sum_dy"),
        Sum("dxx", alias_name="sum_dxx"),
        Sum("dyy", alias_name="sum_dyy"),
        Sum("dxy", alias_name="sum_dxy"),
    )
    out = pd.DataFrame([agg])[["n", "sum_dx", "sum_dy", "sum_dxx", "sum_dyy", "sum_dxy"]]
    return out.astype("int64")


def events_spearman_stats_sql() -> str:
    return """
        WITH e AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
                   (epoch_us(ts) // 1000000) % 86400 AS y
            FROM events
        ),
        r AS (
            SELECT 2 * RANK() OVER (ORDER BY x)
                     + COUNT(*) OVER (PARTITION BY x) - 1 AS dx,
                   2 * RANK() OVER (ORDER BY y)
                     + COUNT(*) OVER (PARTITION BY y) - 1 AS dy
            FROM e
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dx) AS BIGINT) AS sum_dx,
               CAST(SUM(dy) AS BIGINT) AS sum_dy,
               CAST(SUM(dx * dx) AS BIGINT) AS sum_dxx,
               CAST(SUM(dy * dy) AS BIGINT) AS sum_dyy,
               CAST(SUM(dx * dy) AS BIGINT) AS sum_dxy
        FROM r
    """


def stump_threshold_split(sf_dir: str) -> pd.DataFrame:
    """Decision-stump training by exact 0-1 loss: the cents threshold t
    minimizing errors of the rule "predict purchase iff value_cents <=
    t" (t = -1 means never predict purchase).  Pure integers end to
    end — no impurity fractions — so the argmin is exactly comparable
    and the SQL twin matches bit for bit.  Ties break to the smallest
    threshold.

    Distributed plan: one (cents)-keyed groupby producing per-value
    (count, purchase-count); the candidate table is DOMAIN-sized
    (distinct cents), so the cumulative scan + argmin finalize runs on
    the driver over <= ~56k rows regardless of corpus size."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": _cents(t["value"]),
                "p": pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64()),
            }
        )

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("x")
        .aggregate(Count(alias_name="c"), Sum("p", alias_name="cp"))
        .to_pandas()
        .sort_values("x")
    )
    x = h["x"].to_numpy(np.int64)
    cle = np.cumsum(h["c"].to_numpy(np.int64))
    ple = np.cumsum(h["cp"].to_numpy(np.int64))
    n = int(cle[-1])
    np_total = int(ple[-1])
    thresholds = np.concatenate(([-1], x))
    errors = np.concatenate(
        ([np_total], (np_total - ple) + (cle - ple))
    )
    best = np.lexsort((thresholds, errors))[0]
    return pd.DataFrame(
        {
            "threshold": [int(thresholds[best])],
            "errors": [int(errors[best])],
            "n": [n],
            "n_purchase": [np_total],
        }
    ).astype("int64")


def stump_threshold_split_sql() -> str:
    return """
        WITH e AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
            FROM events
        ),
        tot AS (SELECT COUNT(*) AS n, SUM(p) AS np FROM e),
        h AS (SELECT x, COUNT(*) AS c, SUM(p) AS cp FROM e GROUP BY x),
        cum AS (
            SELECT x AS t,
                   SUM(c) OVER (ORDER BY x) AS cle,
                   SUM(cp) OVER (ORDER BY x) AS ple
            FROM h
        ),
        cand AS (
            SELECT t, (SELECT np FROM tot) - ple + cle - ple AS errors FROM cum
            UNION ALL
            SELECT -1, (SELECT np FROM tot)
        )
        SELECT CAST(t AS BIGINT) AS threshold,
               CAST(errors AS BIGINT) AS errors,
               CAST((SELECT n FROM tot) AS BIGINT) AS n,
               CAST((SELECT np FROM tot) AS BIGINT) AS n_purchase
        FROM cand ORDER BY errors, t LIMIT 1
    """


def events_runs_test(sf_dir: str) -> pd.DataFrame:
    """Wald-Wolfowitz runs audit over the event stream: binarize each
    event as value_cents > global lower median (the (n+1)//2-th
    smallest), then count maximal runs of equal sign in event_id
    order.  All outputs are exact integers (run count, above/rest
    counts, the median itself) so the LAG-window SQL twin matches.

    Distributed plan: the median comes from a DOMAIN-sized cents
    histogram (one groupby, driver cumsum over <= ~56k rows); the run
    count is computed per event_id-range bucket (first sign, last
    sign, internal transitions inside each sorted bucket) and stitched
    across the O(buckets) boundary table on the driver — the stream
    itself is never globally sorted or materialized."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"], "x": _cents(t["value"])})

    keyed = ds.map_batches(keys, batch_format="pyarrow")
    h = keyed.groupby("x").aggregate(Count(alias_name="c")).to_pandas().sort_values("x")
    cum = np.cumsum(h["c"].to_numpy(np.int64))
    n = int(cum[-1])
    k = (n + 1) // 2
    median = int(h["x"].to_numpy(np.int64)[np.searchsorted(cum, k)])

    def bucketize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.divide(t["event_id"], 4096),
                "event_id": t["event_id"],
                "sg": pc.cast(pc.greater(t["x"], median), pa.int8()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        sg = g["sg"].to_numpy(np.int8)
        return pd.DataFrame(
            {
                "bucket": [int(g["bucket"].iloc[0])],
                "first_sg": [int(sg[0])],
                "last_sg": [int(sg[-1])],
                "trans": [int((sg[1:] != sg[:-1]).sum())],
                "n_above": [int(sg.sum())],
                "cnt": [len(sg)],
            }
        )

    b = (
        keyed.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values("bucket")
    )
    boundary = int((b["first_sg"].to_numpy()[1:] != b["last_sg"].to_numpy()[:-1]).sum())
    n_above = int(b["n_above"].sum())
    return pd.DataFrame(
        {
            "n": [n],
            "n_above": [n_above],
            "n_rest": [n - n_above],
            "n_runs": [int(b["trans"].sum()) + boundary + 1],
            "median_cents": [median],
        }
    ).astype("int64")


def events_runs_test_sql() -> str:
    return """
        WITH e AS (
            SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS x FROM events
        ),
        m AS (
            SELECT x AS med FROM (
                SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn,
                       COUNT(*) OVER () AS n
                FROM e
            ) WHERE rn = (n + 1) // 2
        ),
        s AS (
            SELECT event_id,
                   CASE WHEN x > (SELECT med FROM m) THEN 1 ELSE 0 END AS sg
            FROM e
        ),
        t AS (SELECT sg, LAG(sg) OVER (ORDER BY event_id) AS prev FROM s)
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(sg) AS BIGINT) AS n_above,
               CAST(COUNT(*) - SUM(sg) AS BIGINT) AS n_rest,
               CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sg <> prev
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
               CAST((SELECT med FROM m) AS BIGINT) AS median_cents
        FROM t
    """


def user_theil_sen_slope(sf_dir: str) -> pd.DataFrame:
    """Per-user Theil-Sen trend: the lower-median pairwise slope of
    (epoch-second, value_cents) over all strictly-later pairs, reported
    as an exact integer rational (slope_num = dy cents, slope_den = dx
    seconds).  Pairs within the same second are excluded (dx = 0).

    Exactness of the float sort: two distinct rational slopes a/b, c/d
    with |a| <= 56_021 (cents range) and b, d <= 2.7e6 (seconds in the
    fixture month) differ by at least 1/(b*d) >= 1.4e-13, while the
    float64 division error is <= |slope| * 2^-52 <= 56_021 * 2.2e-16
    ~= 1.2e-11 / max(b,d)... bounded by max|dy| * max|dx| * 2^-52 =
    56_021 * 2.7e6 * 2.2e-16 ~= 3.3e-5 relative to the 1/(b*d) gap
    scaled by the same 1/(min dx) factor — i.e. gap/error >= 2^52 /
    (max|dy| * max|dx|) >> 1, so IEEE division can never reorder two
    unequal rationals and float-equal implies rational-equal.  Ties
    among equal slopes break on (dy, dx) ascending, matching the SQL
    twin's ROW_NUMBER ordering.

    Distributed plan: user-keyed groupby + per-group vectorized pair
    enumeration (<= ~100 events/user -> <= ~5k pairs, numpy triu) —
    the classic 'co-partition by entity, quadratic only inside the
    entity' shape.  At 100 TB users with pathological event counts
    would be capped or windowed first (the per-user pair count is the
    knob), never the user count."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000)
        return pa.table({"user_id": t["user_id"], "s": s, "x": _cents(t["value"])})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g["s"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.int64)
        i, j = np.triu_indices(len(s), k=1)
        # pair set is ordered by strict second precedence, either way round
        dx = s[j] - s[i]
        dy = x[j] - x[i]
        neg = dx < 0
        dx = np.abs(dx)
        dy = np.where(neg, -dy, dy)
        keep = dx > 0
        dx, dy = dx[keep], dy[keep]
        m = len(dx)
        if m == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64")}
            ).reindex(columns=["user_id", "n_pairs", "slope_num", "slope_den"])
        order = np.lexsort((dx, dy, dy / dx))
        k = (m + 1) // 2 - 1
        pick = order[k]
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_pairs": [m],
                "slope_num": [int(dy[pick])],
                "slope_den": [int(dx[pick])],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def user_theil_sen_slope_sql() -> str:
    return """
        WITH e AS (
            SELECT user_id AS u, epoch_us(ts) // 1000000 AS s,
                   CAST(ROUND(value * 100) AS BIGINT) AS x
            FROM events
        ),
        p AS (
            SELECT a.u, b.x - a.x AS dy, b.s - a.s AS dx
            FROM e a JOIN e b ON a.u = b.u AND b.s > a.s
        ),
        r AS (
            SELECT u, dy, dx,
                   ROW_NUMBER() OVER (
                       PARTITION BY u
                       ORDER BY CAST(dy AS DOUBLE) / dx, dy, dx
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY u) AS m
            FROM p
        )
        SELECT CAST(u AS BIGINT) AS user_id,
               CAST(m AS BIGINT) AS n_pairs,
               CAST(dy AS BIGINT) AS slope_num,
               CAST(dx AS BIGINT) AS slope_den
        FROM r WHERE rn = (m + 1) // 2 ORDER BY u
    """


def user_lis_lengths(sf_dir: str) -> pd.DataFrame:
    """Longest strictly-increasing subsequence of event values (cents)
    per user, in (ts, event_id) order — the order-statistics DP the
    batch-window family was missing.  Output: user_id, n_events,
    lis_len; exact, with a recursive-CTE chain-extension SQL twin
    (every achievable chain length 1..LIS appears as a distinct
    (user, position, length) row, so the delta recursion terminates in
    LIS_max rounds).

    Distributed plan: user-keyed groupby; inside each group the classic
    patience-sorting tails array runs in O(n log n) over <= ~100 events
    (the per-entity bound that makes per-group DP safe; a pathological
    entity would be windowed first, as user_theil_sen_slope documents)."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "x": _cents(t["value"]),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        x = g["x"].to_numpy(np.int64)
        tails: list[int] = []
        for v in x:
            import bisect

            pos = bisect.bisect_left(tails, v)
            if pos == len(tails):
                tails.append(int(v))
            else:
                tails[pos] = int(v)
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(x)],
                "lis_len": [len(tails)],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def user_lis_lengths_sql() -> str:
    return """
        WITH RECURSIVE e AS (
            SELECT user_id AS u, CAST(ROUND(value * 100) AS BIGINT) AS x,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS i
            FROM events
        ),
        dp AS (
            SELECT u, i, x, 1 AS l FROM e
            UNION
            SELECT e.u, e.i, e.x, dp.l + 1
            FROM dp JOIN e ON e.u = dp.u AND e.i > dp.i AND e.x > dp.x
        ),
        cnt AS (SELECT u, COUNT(*) AS n FROM e GROUP BY u)
        SELECT CAST(dp.u AS BIGINT) AS user_id,
               CAST(MAX(cnt.n) AS BIGINT) AS n_events,
               CAST(MAX(dp.l) AS BIGINT) AS lis_len
        FROM dp JOIN cnt ON cnt.u = dp.u
        GROUP BY dp.u ORDER BY dp.u
    """


_BANDIT_ARMS = ("click", "error", "purchase", "signup", "view")


def bandit_greedy_replay(sf_dir: str) -> pd.DataFrame:
    """Deterministic greedy-bandit policy replay over the event log:
    arms are the five event types, each calendar day the policy pulls
    one arm (first unpulled arm in lexicographic order, then the
    highest exact average reward, ties to the lexicographically first)
    and collects that day's total value (cents) for the chosen type.
    All comparisons are integer cross-multiplications (s_a * p_b vs
    s_b * p_a), so the recursive-CTE SQL twin replays the identical
    policy bit-for-bit — the evaluation harness every offline-bandit
    paper needs before trusting a learned policy.

    Distributed plan: ONE (day x type) Sum exchange folds the corpus to
    an O(days x arms) table; the replay itself is O(days) driver state
    (two ints per arm), the same shape as any online-policy backtest."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def keys(t: pa.Table) -> pa.Table:
        day = pc.multiply(
            pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 86_400_000_000),
            86_400_000_000,
        )
        return pa.table(
            {
                "day": pc.cast(day, pa.timestamp("us")),
                "event_type": t["event_type"],
                "r": _cents(t["value"]),
            }
        )

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("r", alias_name="r"))
        .to_pandas()
    )
    assert set(h["event_type"]) <= set(_BANDIT_ARMS)
    pivot = (
        h.pivot_table(index="day", columns="event_type", values="r", aggfunc="sum")
        .reindex(columns=list(_BANDIT_ARMS))
        .fillna(0)
        .astype("int64")
        .sort_index()
    )
    s = {a: 0 for a in _BANDIT_ARMS}
    p = {a: 0 for a in _BANDIT_ARMS}
    rows = []
    cum = 0
    for day, rr in pivot.iterrows():
        arm = next((a for a in _BANDIT_ARMS if p[a] == 0), None)
        if arm is None:
            arm = _BANDIT_ARMS[0]
            for cand in _BANDIT_ARMS[1:]:
                if s[cand] * p[arm] > s[arm] * p[cand]:
                    arm = cand
        reward = int(rr[arm])
        s[arm] += reward
        p[arm] += 1
        cum += reward
        rows.append((day, arm, reward, cum))
    out = pd.DataFrame(rows, columns=["day", "arm", "reward_cents", "cum_reward_cents"])
    out["day"] = pd.to_datetime(out["day"])
    for c in ("reward_cents", "cum_reward_cents"):
        out[c] = out[c].astype("int64")
    return out


def bandit_greedy_replay_sql() -> str:
    cols = {"click": "c", "error": "e", "purchase": "p", "signup": "s", "view": "v"}
    day_sums = ",\n                   ".join(
        f"SUM(CASE WHEN event_type = '{a}' THEN CAST(ROUND(value*100) AS BIGINT)"
        f" ELSE 0 END) AS r{k}"
        for a, k in cols.items()
    )

    def beats_all(k: str) -> str:
        return " AND ".join(
            f"s{k}0 * p{o}0 >= s{o}0 * p{k}0" for o in cols.values() if o != k
        )

    arm_case = "CASE " + " ".join(
        f"WHEN p{k}0 = 0 THEN '{a}'" for a, k in cols.items()
    )
    arm_case += " " + " ".join(
        f"WHEN {beats_all(k)} THEN '{a}'" for a, k in list(cols.items())[:-1]
    )
    arm_case += " ELSE 'view' END"
    reward_case = (
        "CASE arm "
        + " ".join(f"WHEN '{a}' THEN r{k}" for a, k in cols.items())
        + " END"
    )
    state_zero = ", ".join(
        f"CAST(0 AS BIGINT) AS s{k}, CAST(0 AS BIGINT) AS p{k}" for k in cols.values()
    )
    state_prev = ", ".join(
        f"sim.s{k} AS s{k}0, sim.p{k} AS p{k}0" for k in cols.values()
    )
    state_next = ", ".join(
        f"s{k}0 + CASE WHEN arm = '{a}' THEN {reward_case} ELSE 0 END AS s{k}, "
        f"p{k}0 + CASE WHEN arm = '{a}' THEN 1 ELSE 0 END AS p{k}"
        for a, k in cols.items()
    )
    return f"""
        WITH RECURSIVE d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   {day_sums}
            FROM events GROUP BY 1
        ),
        days AS (SELECT *, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d),
        sim AS (
            SELECT 0 AS i, CAST(NULL AS TIMESTAMP) AS day,
                   CAST(NULL AS VARCHAR) AS arm, CAST(0 AS BIGINT) AS reward,
                   CAST(0 AS BIGINT) AS cum, {state_zero}
            UNION ALL
            SELECT i, day, arm, {reward_case} AS reward,
                   cum0 + {reward_case} AS cum, {state_next}
            FROM (
                SELECT days.*, sim.cum AS cum0, {state_prev},
                       {arm_case} AS arm
                FROM sim JOIN days ON days.i = sim.i + 1
            )
        )
        SELECT day, arm, CAST(reward AS BIGINT) AS reward_cents,
               CAST(cum AS BIGINT) AS cum_reward_cents
        FROM sim WHERE i >= 1 ORDER BY i
    """


def isotonic_rate_curve(sf_dir: str) -> pd.DataFrame:
    """Weighted isotonic (non-decreasing) regression of purchase rate
    on the value bucket (cents // 1000), EXACT via the minimax
    characterization mu_i = max_{a<=i} min_{b>=i} rate(a..b): every
    fitted level is a true rational wins/total over some span, reported
    gcd-reduced, so the SQL twin (span cross-join + arg_min/arg_max)
    matches bit-for-bit.  Float ratios are used only for ORDERING,
    which is provably exact here: two distinct rationals with
    numerators/denominators <= 1e5 differ by >= 1e-10, eight orders
    above the float64 ulp.

    Distributed plan: one (bucket)-keyed groupby folds the corpus to a
    DOMAIN-sized (<= ~60 rows) histogram; the O(D^2) minimax runs on
    the driver over that histogram — corpus size never touches the
    quadratic term."""
    import numpy as np
    from math import gcd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "b": pc.divide(_cents(t["value"]), 1000),
                "p": pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64()),
            }
        )

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Count(alias_name="t"), Sum("p", alias_name="w"))
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    t = h["t"].to_numpy(np.int64)
    w = h["w"].to_numpy(np.int64)
    D = len(h)
    cw = np.concatenate(([0], np.cumsum(w)))
    ct = np.concatenate(([0], np.cumsum(t)))
    # span sums W[a, b] = wins in buckets a..b inclusive (a <= b)
    W = cw[None, 1:] - cw[:-1, None]
    T = ct[None, 1:] - ct[:-1, None]
    R = np.where(T > 0, W / np.maximum(T, 1), np.inf)
    R[np.tril_indices(D, k=-1)] = np.inf  # a > b invalid for the suffix min
    suff = np.minimum.accumulate(R[:, ::-1], axis=1)[:, ::-1]  # min over b >= i
    fit = np.maximum.accumulate(suff, axis=0).diagonal()  # max over a <= i
    nums, dens = [], []
    for i in range(D):
        a, b = np.argwhere((R == fit[i]) & (np.arange(D)[:, None] <= i) & (np.arange(D)[None, :] >= i))[0]
        g = gcd(int(W[a, b]), int(T[a, b]))
        nums.append(int(W[a, b]) // g)
        dens.append(int(T[a, b]) // g)
    return pd.DataFrame(
        {
            "bucket": h["b"].to_numpy(np.int64),
            "n": t,
            "wins": w,
            "fit_num": nums,
            "fit_den": dens,
        }
    ).astype("int64")


def isotonic_rate_curve_sql() -> str:
    return """
        WITH e AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) // 1000 AS b,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
            FROM events
        ),
        h AS (SELECT b, COUNT(*) AS t, SUM(p) AS w FROM e GROUP BY b),
        c AS (
            SELECT b, t, w,
                   SUM(t) OVER (ORDER BY b) AS ct,
                   SUM(w) OVER (ORDER BY b) AS cw
            FROM h
        ),
        span AS (
            SELECT lo.b AS a, hi.b AS bb,
                   hi.cw - lo.cw + lo.w AS ww, hi.ct - lo.ct + lo.t AS tt
            FROM c lo JOIN c hi ON lo.b <= hi.b
        ),
        inner_min AS (
            SELECT i.b AS i, s.a,
                   arg_min(list_value(s.ww, s.tt), CAST(s.ww AS DOUBLE) / s.tt) AS pr,
                   MIN(CAST(s.ww AS DOUBLE) / s.tt) AS mn
            FROM h i JOIN span s ON s.a <= i.b AND s.bb >= i.b
            GROUP BY i.b, s.a
        ),
        outer_max AS (SELECT i, arg_max(pr, mn) AS pr FROM inner_min GROUP BY i)
        SELECT CAST(h.b AS BIGINT) AS bucket,
               CAST(h.t AS BIGINT) AS n,
               CAST(h.w AS BIGINT) AS wins,
               CAST(pr[1] // gcd(pr[1], pr[2]) AS BIGINT) AS fit_num,
               CAST(pr[2] // gcd(pr[1], pr[2]) AS BIGINT) AS fit_den
        FROM outer_max JOIN h ON h.b = outer_max.i ORDER BY bucket
    """


def events_pettitt_change(sf_dir: str) -> pd.DataFrame:
    """Pettitt change-point statistic over the event-value stream in
    event_id order: U_t = sum_{i<=t} 2*r_i - t*(n+1) with DOUBLED
    average ranks (ties exact), K = max_{t<n} |U_t|, earliest t on
    ties.  All integers, so the RANK+window SQL twin matches exactly.

    Distributed plan: the rank LUT comes from a DOMAIN-sized cents
    histogram (one groupby); the ordered prefix is a two-phase scan —
    per event_id-range bucket (sum of doubled ranks, count, local
    argmax of |U| given an unknown global offset is NOT decomposable,
    so the down-sweep re-scans each bucket WITH its exclusive prefix
    applied, emitting one candidate row per bucket) — O(buckets)
    exchange, no global sort."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"], "x": _cents(t["value"])})

    keyed = ds.map_batches(keys, batch_format="pyarrow")
    h = keyed.groupby("x").aggregate(Count(alias_name="c")).to_pandas().sort_values("x")
    v = h["x"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    cum = np.concatenate(([0], np.cumsum(c)[:-1]))
    d_lut = 2 * cum + c + 1
    n = int(c.sum())
    lref = ray.put((v, d_lut))

    def bucketize(t: pa.Table) -> pa.Table:
        vv, dd = ray.get(lref)
        d = dd[np.searchsorted(vv, t["x"].to_numpy(zero_copy_only=False))]
        return pa.table(
            {
                "bucket": pc.divide(t["event_id"], 4096),
                "event_id": t["event_id"],
                "d": pa.array(d),
            }
        )

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        return pd.DataFrame(
            {
                "bucket": [int(g["bucket"].iloc[0])],
                "sum_d": [int(g["d"].sum())],
                "cnt": [len(g)],
            }
        )

    bk = (
        keyed.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partials, batch_format="pandas")
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pre_d = np.concatenate(([0], np.cumsum(bk["sum_d"].to_numpy(np.int64))[:-1]))
    pre_n = np.concatenate(([0], np.cumsum(bk["cnt"].to_numpy(np.int64))[:-1]))
    offsets = ray.put(
        {int(b): (int(pd_), int(pn_)) for b, pd_, pn_ in zip(bk["bucket"], pre_d, pre_n)}
    )

    def down_sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        off_d, off_n = ray.get(offsets)[int(g["bucket"].iloc[0])]
        cumd = off_d + np.cumsum(g["d"].to_numpy(np.int64))
        t = off_n + np.arange(1, len(g) + 1, dtype=np.int64)
        u2 = cumd - t * (n + 1)
        valid = t < n
        if not valid.any():
            return pd.DataFrame(
                {"best_abs": pd.Series([], dtype="int64")}
            ).reindex(columns=["best_abs", "t_at", "u2_at"])
        au = np.abs(u2[valid])
        k = int(np.lexsort((t[valid], -au))[0])
        return pd.DataFrame(
            {
                "best_abs": [int(au[k])],
                "t_at": [int(t[valid][k])],
                "u2_at": [int(u2[valid][k])],
            }
        )

    cands = (
        keyed.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(down_sweep, batch_format="pandas")
        .to_pandas()
    )
    cands = cands.sort_values(["best_abs", "t_at"], ascending=[False, True])
    best = cands.iloc[0]
    return pd.DataFrame(
        {
            "n": [n],
            "k2_stat": [int(best["best_abs"])],
            "t_at": [int(best["t_at"])],
            "u2_at": [int(best["u2_at"])],
        }
    ).astype("int64")


def events_pettitt_change_sql() -> str:
    return """
        WITH e AS (
            SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS x FROM events
        ),
        r AS (
            SELECT event_id,
                   2 * RANK() OVER (ORDER BY x)
                     + COUNT(*) OVER (PARTITION BY x) - 1 AS d
            FROM e
        ),
        u AS (
            SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS t,
                   SUM(d) OVER (ORDER BY event_id) AS cumd,
                   COUNT(*) OVER () AS n
            FROM r
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(ABS(cumd - t * (n + 1)) AS BIGINT) AS k2_stat,
               CAST(t AS BIGINT) AS t_at,
               CAST(cumd - t * (n + 1) AS BIGINT) AS u2_at
        FROM u WHERE t < n
        ORDER BY ABS(cumd - t * (n + 1)) DESC, t LIMIT 1
    """


def gapped_triple_patterns(sf_dir: str) -> pd.DataFrame:
    """Sequential pattern mining (SPADE/PrefixSpan's counting core):
    for every ordered event-type triple (a, b, c), how many users'
    event sequences contain a THEN b THEN c as a gapped subsequence.
    Existence uses the standard greedy witness — first a, first b
    after it, any c after that — which the SQL twin reproduces with
    three MIN(ts) chain CTEs; timestamps are unique at microsecond
    resolution so strict < comparisons are total.

    Distributed plan: user-keyed groupby; per group the greedy table
    is built from per-type first/last positions + one searchsorted
    (O(T^2) for firsts, O(T^3) bool algebra for the triples, T = 5);
    only true (user, a, b, c) rows leave the task, and a triple-keyed
    Count folds them — exchange is pattern-sized, not event-sized."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "event_type": t["event_type"],
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        types = sorted(g["event_type"].unique())
        ts = g["ts"].to_numpy(np.int64)
        ev = g["event_type"].to_numpy()
        pos = {t_: np.flatnonzero(ev == t_) for t_ in types}
        rows = []
        for a in types:
            fa = pos[a][0]
            for b in types:
                # first b strictly after the first a
                later = pos[b][np.searchsorted(pos[b], fa, side="right"):]
                if len(later) == 0:
                    continue
                fb = later[0]
                for ctype in types:
                    if pos[ctype][-1] > fb:
                        rows.append((int(g["user_id"].iloc[0]), a, b, ctype))
        if not rows:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64")}
            ).reindex(columns=["user_id", "a_type", "b_type", "c_type"])
        return pd.DataFrame(rows, columns=["user_id", "a_type", "b_type", "c_type"])

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .groupby(["a_type", "b_type", "c_type"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
        .sort_values(["a_type", "b_type", "c_type"])
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def gapped_triple_patterns_sql() -> str:
    return """
        WITH p1 AS (
            SELECT user_id AS u, event_type AS a, MIN(ts) AS t1
            FROM events GROUP BY 1, 2
        ),
        p2 AS (
            SELECT p1.u, p1.a, e.event_type AS b, MIN(e.ts) AS t2
            FROM p1 JOIN events e ON e.user_id = p1.u AND e.ts > p1.t1
            GROUP BY 1, 2, 3
        ),
        p3 AS (
            SELECT DISTINCT p2.u, p2.a, p2.b, e.event_type AS c
            FROM p2 JOIN events e ON e.user_id = p2.u AND e.ts > p2.t2
        )
        SELECT a AS a_type, b AS b_type, c AS c_type,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM p3 GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """


def daily_lead_lag_xcorr(sf_dir: str, max_lag: int = 3) -> pd.DataFrame:
    """Lead-lag profile between click volume and purchase volume:
    xcorr(k) = sum over calendar days d of clicks(d) * purchases(d+k)
    for k in [-max_lag, +max_lag], over the full [min_day, max_day]
    spine with missing days as zero — exact integer products, so the
    generate_series SQL twin matches.  Positive best-k means clicks
    LEAD purchases by k days — the attribution-lag diagnostic.

    Distributed plan: one (day x type) Count exchange folds the corpus
    to an O(days) table; the 7-lag correlation runs on the driver over
    the spine."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"])))
        day = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 86_400_000_000)
        return pa.table({"day": day, "event_type": t["event_type"]})

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    d0, d1 = int(h["day"].min()), int(h["day"].max())
    spine = np.arange(d0, d1 + 1)
    clicks = np.zeros(len(spine), np.int64)
    purch = np.zeros(len(spine), np.int64)
    for _, r in h.iterrows():
        idx = int(r["day"]) - d0
        if r["event_type"] == "click":
            clicks[idx] = int(r["n"])
        else:
            purch[idx] = int(r["n"])
    rows = []
    for k in range(-max_lag, max_lag + 1):
        if k >= 0:
            xc = int(np.dot(clicks[: len(spine) - k], purch[k:])) if k < len(spine) else 0
        else:
            xc = int(np.dot(clicks[-k:], purch[: len(spine) + k])) if -k < len(spine) else 0
        rows.append((k, xc))
    return pd.DataFrame(rows, columns=["lag", "xcorr"]).astype("int64")


def daily_lead_lag_xcorr_sql(max_lag: int = 3) -> str:
    return f"""
        WITH e AS (
            SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events
            WHERE event_type IN ('click', 'purchase')
        ),
        h AS (SELECT day, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
        bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM h),
        spine AS (
            SELECT UNNEST(generate_series(d0, d1)) AS day FROM bounds
        ),
        c AS (
            SELECT s.day, COALESCE(h.n, 0) AS n FROM spine s
            LEFT JOIN h ON h.day = s.day AND h.event_type = 'click'
        ),
        p AS (
            SELECT s.day, COALESCE(h.n, 0) AS n FROM spine s
            LEFT JOIN h ON h.day = s.day AND h.event_type = 'purchase'
        ),
        lags AS (SELECT UNNEST(generate_series(-{max_lag}, {max_lag})) AS lag)
        SELECT CAST(l.lag AS BIGINT) AS lag,
               CAST(COALESCE(SUM(c.n * p.n), 0) AS BIGINT) AS xcorr
        FROM lags l
        LEFT JOIN c ON TRUE
        LEFT JOIN p ON p.day = c.day + l.lag
        GROUP BY l.lag ORDER BY l.lag
    """


def mann_kendall_daily_trend(sf_dir: str) -> pd.DataFrame:
    """Mann-Kendall monotone-trend test inputs per event type over the
    daily-count series: the exact S statistic (sum of pairwise
    sign(n_j - n_i) for day i < j) and the tie-corrected variance
    numerator var18 = n(n-1)(2n+5) - sum_t t(t-1)(2t+5) (the /18 left
    to the analyst) — all integers, so the self-join SQL twin matches.

    Distributed plan: one (type x day) Count exchange folds the corpus
    to an O(types x days) table; the quadratic pair sweep runs on the
    driver over that bounded series."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 86_400_000_000)
        return pa.table({"day": day, "event_type": t["event_type"]})

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    rows = []
    for ty, grp in h.groupby("event_type"):
        grp = grp.sort_values("day")
        ns = grp["n"].to_numpy(np.int64)
        nd = len(ns)
        diff = np.sign(ns[None, :] - ns[:, None])
        s = int(np.triu(diff, k=1).sum())
        _, tie_counts = np.unique(ns, return_counts=True)
        corr = int((tie_counts * (tie_counts - 1) * (2 * tie_counts + 5)).sum())
        rows.append((ty, nd, s, nd * (nd - 1) * (2 * nd + 5) - corr))
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "s_stat", "var18"])
    out = out.sort_values("event_type").reset_index(drop=True)
    for c in ("n_days", "s_stat", "var18"):
        out[c] = out[c].astype("int64")
    return out


def mann_kendall_daily_trend_sql() -> str:
    return """
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS d, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT a.event_type,
                   SUM(CASE WHEN b.n > a.n THEN 1
                            WHEN b.n < a.n THEN -1 ELSE 0 END) AS s_stat
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND b.d > a.d
            GROUP BY 1
        ),
        t AS (SELECT event_type, n, COUNT(*) AS tc FROM daily GROUP BY 1, 2),
        v AS (
            SELECT event_type,
                   SUM(tc * (tc - 1) * (2 * tc + 5)) AS corr,
                   SUM(tc) AS nd
            FROM t GROUP BY 1
        )
        SELECT s.event_type,
               CAST(v.nd AS BIGINT) AS n_days,
               CAST(s.s_stat AS BIGINT) AS s_stat,
               CAST(v.nd * (v.nd - 1) * (2 * v.nd + 5) - v.corr AS BIGINT) AS var18
        FROM s JOIN v USING (event_type) ORDER BY s.event_type
    """


def user_kendall_concordance(sf_dir: str) -> pd.DataFrame:
    """Kendall concordance decomposition per user: over all time-ordered
    event pairs (ts unique at microsecond resolution), how many have a
    rising value, a falling value, or an exactly-tied value — the
    sufficient statistics of tau-b and the per-entity companion to
    user_theil_sen_slope.  Exact integers; self-join SQL twin.

    Distributed plan: user-keyed groupby; O(n^2) sign tally inside each
    <= ~100-event group via one triu subtraction."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "x": _cents(t["value"]),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        x = g["x"].to_numpy(np.int64)
        if len(x) < 2:  # SQL's inner self-join has no row for these
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64")}
            ).reindex(
                columns=["user_id", "n_pairs", "n_concordant", "n_discordant", "n_ties"]
            )
        i, j = np.triu_indices(len(x), k=1)
        dy = x[j] - x[i]
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_pairs": [len(dy)],
                "n_concordant": [int((dy > 0).sum())],
                "n_discordant": [int((dy < 0).sum())],
                "n_ties": [int((dy == 0).sum())],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def user_kendall_concordance_sql() -> str:
    return """
        WITH e AS (
            SELECT user_id AS u, ts, CAST(ROUND(value * 100) AS BIGINT) AS x
            FROM events
        )
        SELECT CAST(a.u AS BIGINT) AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN b.x > a.x THEN 1 ELSE 0 END) AS BIGINT) AS n_concordant,
               CAST(SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END) AS BIGINT) AS n_discordant,
               CAST(SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS BIGINT) AS n_ties
        FROM e a JOIN e b ON a.u = b.u AND b.ts > a.ts
        GROUP BY a.u ORDER BY a.u
    """


def user_interval_scheduling(sf_dir: str) -> pd.DataFrame:
    """Weighted interval scheduling per user — the classic O(n log n)
    DP: each event spawns a deterministic interval [s, s + 60 + w%600)
    (s = epoch second, w = value cents) and the engine reports the
    maximum total cents over pairwise non-overlapping intervals.
    Intervals sort by (end, start, w); the predecessor of interval i is
    the COUNT of intervals with end <= start_i (order-independent), so
    the engine's bisect and the SQL twin's MAX(index) agree exactly.
    The SQL twin runs the same recursion with the wis() table carried
    as a growing LIST column (DuckDB recursive CTEs see only the
    previous iteration, so the full DP vector rides along per user).

    Distributed plan: user-keyed groupby; the DP is linear inside each
    <= ~100-event group after one sort — the per-entity-DP shape
    user_lis_lengths establishes."""
    import bisect

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000)
        return pa.table({"user_id": t["user_id"], "s": s, "w": _cents(t["value"])})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g["s"].to_numpy(np.int64)
        w = g["w"].to_numpy(np.int64)
        e = s + 60 + (w % 600)
        order = np.lexsort((w, s, e))
        s, w, e = s[order], w[order], e[order]
        ends = e.tolist()
        wis = [0]
        for i in range(len(s)):
            pj = bisect.bisect_right(ends, int(s[i]))
            wis.append(max(wis[-1], int(w[i]) + wis[pj]))
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_intervals": [len(s)],
                "best_cents": [wis[-1]],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def user_interval_scheduling_sql() -> str:
    return """
        WITH RECURSIVE iv AS (
            SELECT user_id AS u, epoch_us(ts) // 1000000 AS s,
                   CAST(ROUND(value * 100) AS BIGINT) AS w
            FROM events
        ),
        iv2 AS (
            SELECT u, s, s + 60 + (w % 600) AS e, w,
                   ROW_NUMBER() OVER (
                       PARTITION BY u ORDER BY s + 60 + (w % 600), s, w
                   ) AS i
            FROM iv
        ),
        pred AS (
            SELECT a.u, a.i, COALESCE(MAX(b.i), 0) AS pj
            FROM iv2 a LEFT JOIN iv2 b ON b.u = a.u AND b.e <= a.s
            GROUP BY a.u, a.i
        ),
        dp AS (
            SELECT u, 0 AS i, [CAST(0 AS BIGINT)] AS bl
            FROM (SELECT DISTINCT u FROM iv2)
            UNION ALL
            SELECT dp.u, dp.i + 1,
                   list_append(
                       dp.bl,
                       GREATEST(dp.bl[dp.i + 1], t.w + dp.bl[p.pj + 1])
                   )
            FROM dp
            JOIN iv2 t ON t.u = dp.u AND t.i = dp.i + 1
            JOIN pred p ON p.u = t.u AND p.i = t.i
        ),
        fin AS (
            SELECT dp.u, dp.i, dp.bl[dp.i + 1] AS best
            FROM dp JOIN (SELECT u, MAX(i) AS mi FROM iv2 GROUP BY u) m
              ON m.u = dp.u AND dp.i = m.mi
        )
        SELECT CAST(u AS BIGINT) AS user_id,
               CAST(i AS BIGINT) AS n_intervals,
               CAST(best AS BIGINT) AS best_cents
        FROM fin ORDER BY u
    """


def events_cdf_l1_gap(sf_dir: str) -> pd.DataFrame:
    """Distribution-shift audit between weekday and weekend event
    values: the integrated L1 CDF gap, sum over all observations x of
    pooled(x) * |n2*C1(x) - n1*C2(x)| with C the class-conditional
    cumulative counts — the Cramer-style energy distance kept in pure
    integers (the classical squared version overflows int64 at bench
    scale; the L1 form is bounded by n * n1 * n2 ~ 1.5e15 at sf0.1).

    Distributed plan: one (cents)-keyed groupby folds the corpus to a
    DOMAIN-sized two-class histogram; the cumulative sweep runs on the
    driver over <= ~56k distinct values."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 86_400_000_000)
        dow = pc.subtract(
            pc.add(day, 4), pc.multiply(pc.divide(pc.add(day, 4), 7), 7)
        )  # 0 = Sunday, matching DuckDB dayofweek()
        wk = pc.cast(pc.or_(pc.equal(dow, 0), pc.equal(dow, 6)), pa.int64())
        return pa.table({"x": _cents(t["value"]), "wk": wk})

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("x")
        .aggregate(Count(alias_name="pooled"), Sum("wk", alias_name="b"))
        .to_pandas()
        .sort_values("x")
    )
    pooled = h["pooled"].to_numpy(np.int64)
    b = h["b"].to_numpy(np.int64)
    a = pooled - b
    n1, n2 = int(a.sum()), int(b.sum())
    ca, cb = np.cumsum(a), np.cumsum(b)
    gap = int((pooled * np.abs(n2 * ca - n1 * cb)).sum())
    return pd.DataFrame(
        {"n_weekday": [n1], "n_weekend": [n2], "l1_gap": [gap]}
    ).astype("int64")


def events_cdf_l1_gap_sql() -> str:
    return """
        WITH e AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS x,
                   CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk
            FROM events
        ),
        h AS (
            SELECT x, COUNT(*) AS pooled,
                   SUM(1 - wk) AS a, SUM(wk) AS b
            FROM e GROUP BY x
        ),
        c AS (
            SELECT pooled,
                   SUM(a) OVER (ORDER BY x) AS ca,
                   SUM(b) OVER (ORDER BY x) AS cb
            FROM h
        ),
        t AS (SELECT SUM(a) AS n1, SUM(b) AS n2 FROM h)
        SELECT CAST(t.n1 AS BIGINT) AS n_weekday,
               CAST(t.n2 AS BIGINT) AS n_weekend,
               CAST(SUM(c.pooled * ABS(t.n2 * c.ca - t.n1 * c.cb)) AS BIGINT) AS l1_gap
        FROM c, t GROUP BY t.n1, t.n2
    """


def seasonal_naive_backtest(sf_dir: str) -> pd.DataFrame:
    """Forecast-baseline backtest per event type over the daily-count
    series (full calendar spine, missing days = 0): the sum of absolute
    errors of the SEASONAL naive forecast n(d-7) vs the plain naive
    n(d-1) — the two MASE denominators every forecasting evaluation
    starts from, exact in integers.

    Distributed plan: one (day x type) Count exchange; the spine
    difference sweep runs on the driver over O(days x types)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 86_400_000_000)
        return pa.table({"day": day, "event_type": t["event_type"]})

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    d0, d1 = int(h["day"].min()), int(h["day"].max())
    spine = np.arange(d0, d1 + 1)
    rows = []
    for ty in sorted(h["event_type"].unique()):
        grp = h[h["event_type"] == ty]
        n = np.zeros(len(spine), np.int64)
        n[grp["day"].to_numpy(np.int64) - d0] = grp["n"].to_numpy(np.int64)
        sae7 = int(np.abs(n[7:] - n[:-7]).sum()) if len(n) > 7 else 0
        sae1 = int(np.abs(n[1:] - n[:-1]).sum()) if len(n) > 1 else 0
        rows.append((ty, max(len(n) - 7, 0), sae7, max(len(n) - 1, 0), sae1))
    out = pd.DataFrame(
        rows, columns=["event_type", "n_eval7", "sae_seasonal", "n_eval1", "sae_naive"]
    )
    for c in ("n_eval7", "sae_seasonal", "n_eval1", "sae_naive"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def seasonal_naive_backtest_sql() -> str:
    return """
        WITH e AS (
            SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events
        ),
        h AS (SELECT day, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
        bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM h),
        spine AS (
            SELECT UNNEST(generate_series(d0, d1)) AS day FROM bounds
        ),
        types AS (SELECT DISTINCT event_type FROM h),
        grid AS (
            SELECT s.day, t.event_type, COALESCE(h.n, 0) AS n
            FROM spine s CROSS JOIN types t
            LEFT JOIN h ON h.day = s.day AND h.event_type = t.event_type
        ),
        lagged AS (
            SELECT event_type, n,
                   LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS n7,
                   LAG(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS n1
            FROM grid
        )
        SELECT event_type,
               CAST(COUNT(n7) AS BIGINT) AS n_eval7,
               CAST(COALESCE(SUM(ABS(n - n7)), 0) AS BIGINT) AS sae_seasonal,
               CAST(COUNT(n1) AS BIGINT) AS n_eval1,
               CAST(COALESCE(SUM(ABS(n - n1)), 0) AS BIGINT) AS sae_naive
        FROM lagged GROUP BY 1 ORDER BY 1
    """


def secretary_rule_replay(sf_dir: str) -> pd.DataFrame:
    """Optimal-stopping (secretary rule) replay over daily revenue:
    observe the first k = n*37//100 days, then commit to the first day
    whose revenue strictly beats the observed maximum; if none
    qualifies, settle for the last day.  Output: n_days, k_observe,
    the chosen day, its revenue (cents) and whether it was the global
    maximum — the canonical sequential-decision baseline, exact in
    integers.

    Distributed plan: one (day) Sum exchange folds the corpus to the
    O(days) revenue series; the replay is a driver scan."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        day = pc.multiply(
            pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 86_400_000_000),
            86_400_000_000,
        )
        return pa.table({"day": pc.cast(day, pa.timestamp("us")), "r": _cents(t["value"])})

    d = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("r", alias_name="rev"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    n = len(d)
    k = n * 37 // 100
    rev = d["rev"].to_numpy(np.int64)
    threshold = int(rev[:k].max()) if k else -(1 << 62)
    later = np.flatnonzero(rev[k:] > threshold)
    idx = k + int(later[0]) if len(later) else n - 1
    return pd.DataFrame(
        {
            "n_days": [n],
            "k_observe": [k],
            "chosen_day": [pd.to_datetime(d["day"].iloc[idx])],
            "chosen_revenue_cents": [int(rev[idx])],
            "is_global_max": [1 if int(rev[idx]) == int(rev.max()) else 0],
        }
    )


def secretary_rule_replay_sql() -> str:
    return """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev
            FROM events GROUP BY 1
        ),
        o AS (
            SELECT day, rev, ROW_NUMBER() OVER (ORDER BY day) AS i,
                   COUNT(*) OVER () AS n
            FROM d
        ),
        k AS (SELECT MAX(n) * 37 // 100 AS k, MAX(n) AS n FROM o),
        th AS (SELECT MAX(o.rev) AS m FROM o, k WHERE o.i <= k.k),
        cand AS (
            SELECT o.day, o.rev FROM o, k, th
            WHERE o.i > k.k AND o.rev > th.m
            ORDER BY o.i LIMIT 1
        ),
        fallback AS (SELECT o.day, o.rev FROM o WHERE o.i = o.n),
        pick AS (
            SELECT * FROM cand
            UNION ALL
            SELECT * FROM fallback
            WHERE NOT EXISTS (SELECT 1 FROM cand)
        )
        SELECT CAST((SELECT n FROM k) AS BIGINT) AS n_days,
               CAST((SELECT k FROM k) AS BIGINT) AS k_observe,
               day AS chosen_day,
               CAST(rev AS BIGINT) AS chosen_revenue_cents,
               CAST(CASE WHEN rev = (SELECT MAX(rev) FROM o)
                         THEN 1 ELSE 0 END AS BIGINT) AS is_global_max
        FROM pick
    """


def value_sum_convolution(sf_dir: str) -> pd.DataFrame:
    """Exact discrete convolution of the click and purchase value
    distributions (bucketed to cents//1000): the distribution of the
    COMBINED cost of one independent click + one purchase — the
    histogram algebra risk models run on bucketed marginals.  Output
    per sum-bucket: the exact pair count.

    Distributed plan: two DOMAIN-sized bucket histograms from one
    groupby; the O(D^2) convolution runs on the driver (D <= ~60)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"])))
        return pa.table(
            {"b": pc.divide(_cents(t["value"]), 1000), "event_type": t["event_type"]}
        )

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["b", "event_type"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    c = h[h["event_type"] == "click"]
    p = h[h["event_type"] == "purchase"]
    sums: dict[int, int] = {}
    for cb, cn in zip(c["b"].to_numpy(np.int64), c["n"].to_numpy(np.int64)):
        for pb, pn in zip(p["b"].to_numpy(np.int64), p["n"].to_numpy(np.int64)):
            sums[int(cb + pb)] = sums.get(int(cb + pb), 0) + int(cn * pn)
    out = pd.DataFrame(sorted(sums.items()), columns=["sum_bucket", "n_pairs"])
    return out.astype("int64")


def value_sum_convolution_sql() -> str:
    return """
        WITH e AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) // 1000 AS b, event_type
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        c AS (SELECT b, COUNT(*) AS n FROM e WHERE event_type = 'click' GROUP BY 1),
        p AS (SELECT b, COUNT(*) AS n FROM e WHERE event_type = 'purchase' GROUP BY 1)
        SELECT CAST(c.b + p.b AS BIGINT) AS sum_bucket,
               CAST(SUM(c.n * p.n) AS BIGINT) AS n_pairs
        FROM c CROSS JOIN p GROUP BY 1 ORDER BY 1
    """


def topk_overlap_profile(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Ranking-agreement profile between two part leaderboards — by
    revenue cents and by total quantity (ties to the smaller partkey):
    for each depth d in 1..k, the exact intersection size of the two
    top-d sets, the depth-profile rank-biased-overlap style metrics
    integrate.  All integer, so the double-QUALIFY SQL twin matches.

    Distributed plan: one part-keyed two-Sum exchange (part-domain
    sized); both rankings and the k^2 profile run on the driver."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice", "l_quantity"]
    )

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p": t["l_partkey"],
                "rev": _cents(t["l_extendedprice"]),
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }
        )

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("rev", alias_name="rev"), Sum("qty", alias_name="qty"))
        .to_pandas()
    )
    by_rev = h.sort_values(["rev", "p"], ascending=[False, True])["p"].to_numpy()[:k]
    by_qty = h.sort_values(["qty", "p"], ascending=[False, True])["p"].to_numpy()[:k]
    rows = []
    for d in range(1, k + 1):
        rows.append((d, len(set(by_rev[:d]) & set(by_qty[:d]))))
    return pd.DataFrame(rows, columns=["depth", "overlap"]).astype("int64")


def topk_overlap_profile_sql(k: int = 20) -> str:
    return f"""
        WITH r AS (
            SELECT l_partkey AS p,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
            FROM lineitem GROUP BY 1
        ),
        ra AS (SELECT p, ROW_NUMBER() OVER (ORDER BY rev DESC, p) AS i FROM r),
        rb AS (SELECT p, ROW_NUMBER() OVER (ORDER BY qty DESC, p) AS i FROM r),
        d AS (SELECT UNNEST(generate_series(1, {k})) AS depth)
        SELECT CAST(d.depth AS BIGINT) AS depth,
               CAST(SUM(CASE WHEN rb.i <= d.depth THEN 1 ELSE 0 END) AS BIGINT)
                   AS overlap
        FROM d JOIN ra ON ra.i <= d.depth
        JOIN rb ON rb.p = ra.p
        GROUP BY d.depth ORDER BY d.depth
    """


def part_onion_layers(sf_dir: str) -> pd.DataFrame:
    """Onion-peeling (iterated skyline) decomposition of the part cloud
    (x = revenue cents, y = total quantity): layer 1 is the maxima
    skyline, layer 2 the skyline of what remains, and so on — the
    depth-ranking multi-objective shortlists use.  Dominance is
    (rev' >= rev AND qty' >= qty, one strict).  Output per layer:
    count + partkey-sum membership checksum.  The SQL twin peels with
    a recursive CTE whose per-round dominance test is two window
    maxima (suffix max over strictly-higher rev, and the equal-rev
    group max).

    Distributed plan: one part-keyed two-Sum exchange folds the fact
    table to the DOMAIN-sized point cloud; peeling runs on the driver
    with one lexsort + per-round suffix-max sweeps (O(layers * n))."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice", "l_quantity"]
    )

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p": t["l_partkey"],
                "rev": _cents(t["l_extendedprice"]),
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }
        )

    h = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("rev", alias_name="rev"), Sum("qty", alias_name="qty"))
        .to_pandas()
    )
    p = h["p"].to_numpy(np.int64)
    rev = h["rev"].to_numpy(np.int64)
    qty = h["qty"].to_numpy(np.int64)
    layer = np.zeros(len(p), np.int64)
    alive = np.arange(len(p))
    r = 0
    while len(alive):
        r += 1
        rv, qt = rev[alive], qty[alive]
        order = np.lexsort((qt, rv))  # rev ascending
        rv_o, qt_o = rv[order], qt[order]
        starts = np.flatnonzero(np.r_[True, rv_o[1:] != rv_o[:-1]])
        ends = np.r_[starts[1:], len(rv_o)]
        gmax = np.maximum.reduceat(qt_o, starts)  # per-rev-group max qty
        # suffix max of group maxima over STRICTLY greater rev
        sfx = np.r_[np.maximum.accumulate(gmax[::-1])[::-1][1:], -(1 << 62)]
        gidx = np.repeat(np.arange(len(starts)), ends - starts)
        w1 = sfx[gidx]
        w2 = np.repeat(gmax, ends - starts)
        dominated = (w1 >= qt_o) | (w2 > qt_o)
        peel = alive[order[~dominated]]
        layer[peel] = r
        alive = alive[order[dominated]]
    out = (
        pd.DataFrame({"p": p, "layer": layer})
        .groupby("layer")
        .agg(n_parts=("p", "size"), sum_partkey=("p", "sum"))
        .reset_index()
        .sort_values("layer")
        .reset_index(drop=True)
    )
    return out.astype("int64")


def part_onion_layers_sql() -> str:
    return """
        WITH RECURSIVE pts AS (
            SELECT l_partkey AS p,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
            FROM lineitem GROUP BY 1
        ),
        peel AS (
            SELECT 1 AS round, p, rev, qty FROM pts
            UNION ALL
            SELECT round + 1, p, rev, qty FROM (
                SELECT round, p, rev, qty,
                       MAX(qty) OVER (ORDER BY rev RANGE BETWEEN 1 FOLLOWING
                                      AND UNBOUNDED FOLLOWING) AS w1,
                       MAX(qty) OVER (PARTITION BY rev) AS w2
                FROM peel
            ) WHERE (w1 IS NOT NULL AND w1 >= qty) OR w2 > qty
        ),
        layered AS (SELECT p, MAX(round) AS layer FROM peel GROUP BY p)
        SELECT CAST(layer AS BIGINT) AS layer,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(p) AS BIGINT) AS sum_partkey
        FROM layered GROUP BY 1 ORDER BY 1
    """


def supplier_part_stable_matching(sf_dir: str, cap: int = 128) -> pd.DataFrame:
    """Gale-Shapley stable matching between the first `cap` suppliers
    (proposers) and the first `cap` parts (acceptors), with
    deterministic hash-derived preference scores on both sides
    (smaller score preferred; ties to the smaller key).  Output: one
    audit row — matches, proposal rounds, a match checksum, and both
    sides' matched-rank sums (proposer-optimality shows as a LOW
    proposer rank sum; the pytest pins equality with a serial
    textbook run and brute-checks that NO blocking pair exists).
    Rows-only query: the proposal loop is a fixpoint like k-core.

    Distributed plan: the instance tables come from pushed-down
    limit reads; preference state is vertex-sized.  At real scale each
    round is a map over the free-proposer Dataset with the rejection
    counters broadcast and a groupby(acceptor).min accept — the
    Boruvka exchange shape."""
    import numpy as np

    sup = (
        rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
        .to_pandas()["s_suppkey"]
        .sort_values()
        .to_numpy(np.int64)[:cap]
    )
    par = (
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        .to_pandas()["p_partkey"]
        .sort_values()
        .to_numpy(np.int64)[:cap]
    )
    n = min(len(sup), len(par))
    sup, par = sup[:n], par[:n]

    sup_score = (sup[:, None] * 2654435761 + par[None, :] * 40503) % 997
    acc_score = (par[:, None] * 1610612741 + sup[None, :] * 7919) % 991
    # preference ranks: order acceptors per proposer by (score, key)
    sup_pref = np.lexsort((np.broadcast_to(par, (n, n)), sup_score), axis=1)
    acc_rank = np.empty((n, n), np.int64)  # acc_rank[p, s_idx] = rank
    acc_order = np.lexsort((np.broadcast_to(sup, (n, n)), acc_score), axis=1)
    for i in range(n):
        acc_rank[i, acc_order[i]] = np.arange(n)

    next_idx = np.zeros(n, np.int64)
    holder = np.full(n, -1, np.int64)  # per acceptor: proposer idx or -1
    free = list(range(n))
    rounds = 0
    while free:
        rounds += 1
        proposals: dict[int, list[int]] = {}
        for s in free:
            p_idx = int(sup_pref[s, next_idx[s]])
            proposals.setdefault(p_idx, []).append(s)
        new_free: list[int] = []
        for p_idx, cands in proposals.items():
            if holder[p_idx] >= 0:
                cands.append(int(holder[p_idx]))
            best = min(cands, key=lambda s: int(acc_rank[p_idx, s]))
            for s in cands:
                if s != best:
                    next_idx[s] += 1  # rejected (or displaced): move on
                    new_free.append(s)
            holder[p_idx] = best
        free = sorted(set(new_free))
    sup_rank_sum = 0
    acc_rank_sum = 0
    checksum = 0
    for p_idx in range(n):
        s = int(holder[p_idx])
        checksum += int(sup[s]) * 131 + int(par[p_idx])
        pos = int(np.flatnonzero(sup_pref[s] == p_idx)[0])
        sup_rank_sum += pos
        acc_rank_sum += int(acc_rank[p_idx, s])
    return pd.DataFrame(
        {
            "n_matched": [n],
            "n_rounds": [rounds],
            "match_checksum": [checksum],
            "proposer_rank_sum": [sup_rank_sum],
            "acceptor_rank_sum": [acc_rank_sum],
        }
    ).astype("int64")


def user_max_burst(sf_dir: str) -> pd.DataFrame:
    """Maximum-subarray (Kadane) per user over the signed value stream
    (+cents for purchases, -cents otherwise, ts order): the largest
    net-positive contiguous burst — the best-streak metric, exact in
    integers via the prefix-sum identity best = max_t (pre_t - min_{j<t}
    pre_j) that the window-function SQL twin mirrors directly.

    Distributed plan: user-keyed groupby; one cumsum + running-min
    sweep inside each group."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "value"])

    def keys(t: pa.Table) -> pa.Table:
        sign = pc.if_else(pc.equal(t["event_type"], "purchase"), 1, -1)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "sv": pc.multiply(_cents(t["value"]), pc.cast(sign, pa.int64())),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        pre = np.cumsum(g["sv"].to_numpy(np.int64))
        minb = np.minimum(np.minimum.accumulate(np.r_[0, pre[:-1]]), 0)
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(pre)],
                "best_burst_cents": [int((pre - minb).max())],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def user_max_burst_sql() -> str:
    return """
        WITH e AS (
            SELECT user_id AS u, ts,
                   CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE -CAST(ROUND(value * 100) AS BIGINT) END AS sv
            FROM events
        ),
        p0 AS (
            SELECT u, ts,
                   SUM(sv) OVER (PARTITION BY u ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS pre
            FROM e
        ),
        p AS (
            SELECT u, pre,
                   COALESCE(MIN(pre) OVER (
                       PARTITION BY u ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS minprev
            FROM p0
        )
        SELECT CAST(u AS BIGINT) AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(pre - LEAST(minprev, 0)) AS BIGINT) AS best_burst_cents
        FROM p GROUP BY u ORDER BY u
    """


def capped_top_events(sf_dir: str, per_user: int = 3, k: int = 100) -> pd.DataFrame:
    """Quota-capped leaderboard: the global top-k events by value with
    AT MOST `per_user` entries per user (the fairness cap every feed /
    sampler applies so one whale cannot fill the board).  Deterministic
    order (cents DESC, event_id ASC); exact QUALIFY twin.

    Distributed plan: the per-user cap is enforced INSIDE user shards
    (map_groups local top-3), shrinking the candidate exchange to
    <= 3 x users rows; the global top-k is a distributed sort + limit
    over candidates only."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "cents": _cents(t["value"]),
            }
        )

    def local_cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "event_id"], ascending=[False, True])
        return g.head(per_user)

    cand = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(local_cap, batch_format="pandas")
        .sort(["cents", "event_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    cand = cand.reset_index(drop=True)
    cand.insert(0, "rank", np.arange(1, len(cand) + 1, dtype=np.int64))
    return cand[["rank", "event_id", "user_id", "cents"]].astype("int64")


def capped_top_events_sql(per_user: int = 3, k: int = 100) -> str:
    return f"""
        WITH e AS (
            SELECT user_id, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        capped AS (
            SELECT * FROM e
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY cents DESC, event_id
            ) <= {per_user}
        ),
        top AS (
            SELECT * FROM capped ORDER BY cents DESC, event_id LIMIT {k}
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, event_id) AS BIGINT)
                   AS rank,
               event_id, CAST(user_id AS BIGINT) AS user_id, cents
        FROM top ORDER BY rank
    """


def varint_delta_size_audit(sf_dir: str) -> pd.DataFrame:
    """Encoding-efficiency audit: per user, the exact byte cost of
    varint-encoding the DELTAS of the sorted event_id postings list
    (first id absolute) versus the raw 8-byte-per-id layout — the
    compression arithmetic every inverted-index / posting-list format
    is built on.  Byte cost of a non-negative delta d is the 7-bit
    group count: 1 for d < 2^7, 2 for d < 2^14, ... capped at 5
    (ids stay far below 2^35).  Pure integers, LAG-window SQL twin.

    Distributed plan: user-keyed groupby; one diff + digitize per
    group."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_id"])

    _BOUNDS = np.array([1 << 7, 1 << 14, 1 << 21, 1 << 28], dtype=np.int64)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["event_id"].to_numpy(np.int64))
        deltas = np.r_[ids[0], np.diff(ids)]
        nbytes = 1 + np.searchsorted(_BOUNDS, deltas, side="right")
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(ids)],
                "raw_bytes": [8 * len(ids)],
                "varint_bytes": [int(nbytes.sum())],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def varint_delta_size_audit_sql() -> str:
    return """
        WITH d AS (
            SELECT user_id,
                   COALESCE(event_id - LAG(event_id) OVER (
                       PARTITION BY user_id ORDER BY event_id), event_id) AS delta
            FROM events
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(8 * COUNT(*) AS BIGINT) AS raw_bytes,
               CAST(SUM(CASE WHEN delta < 128 THEN 1
                             WHEN delta < 16384 THEN 2
                             WHEN delta < 2097152 THEN 3
                             WHEN delta < 268435456 THEN 4
                             ELSE 5 END) AS BIGINT) AS varint_bytes
        FROM d GROUP BY 1 ORDER BY 1
    """


def daily_merkle_root(sf_dir: str) -> pd.DataFrame:
    """Merkle root over the daily revenue partitions: leaf_d =
    md5('<epoch_day>:<revenue_cents>'), parents = md5(left || right)
    pairing in day order with an odd tail promoted unchanged — the
    integrity summary two replicas compare to find WHICH day diverged
    in O(log n) instead of re-reading everything.  md5 is available in
    SQL, so the recursive-CTE twin reproduces the root exactly.

    Distributed plan: one (day) Sum exchange; the O(days) tree folds
    on the driver."""
    import hashlib

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 86_400_000_000)
        return pa.table({"day": day, "r": _cents(t["value"])})

    d = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("r", alias_name="rev"))
        .to_pandas()
        .sort_values("day")
    )
    level = [
        hashlib.md5(f"{int(day)}:{int(rev)}".encode()).hexdigest()
        for day, rev in zip(d["day"], d["rev"])
    ]
    n_leaves = len(level)
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level) - 1, 2):
            nxt.append(hashlib.md5((level[i] + level[i + 1]).encode()).hexdigest())
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    return pd.DataFrame({"n_leaves": [n_leaves], "merkle_root": [level[0]]}).astype(
        {"n_leaves": "int64"}
    )


def daily_merkle_root_sql() -> str:
    return """
        WITH RECURSIVE daily AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev
            FROM events GROUP BY 1
        ),
        m AS (
            SELECT 0 AS lvl,
                   ROW_NUMBER() OVER (ORDER BY day) AS i,
                   md5(concat(day, ':', rev)) AS h
            FROM daily
            UNION ALL
            SELECT lvl + 1, (i + 1) // 2,
                   CASE WHEN nxt IS NOT NULL THEN md5(concat(h, nxt)) ELSE h END
            FROM (
                SELECT lvl, i, h, LEAD(h) OVER (ORDER BY i) AS nxt,
                       COUNT(*) OVER () AS c
                FROM m
            ) WHERE i % 2 = 1 AND c > 1
        )
        SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_leaves,
               h AS merkle_root
        FROM m ORDER BY lvl DESC LIMIT 1
    """


def daily_haar_coeffs(sf_dir: str) -> pd.DataFrame:
    """Unnormalized Haar wavelet decomposition of the daily revenue
    series on a zero-padded 32-slot spine: level-L smooth s_L[i] =
    s_{L-1}[2i] + s_{L-1}[2i+1], detail d_L[i] = s_{L-1}[2i] -
    s_{L-1}[2i+1] — pure integer adds, so the recursive-CTE SQL twin
    (LEAD pairing per level, like daily_merkle_root) is exact.  Output:
    all 31 detail coefficients (level, idx) plus the level-6 total.

    Distributed plan: one (day) Sum exchange; the 5-level transform is
    a driver fold over 32 integers."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 86_400_000_000)
        return pa.table({"day": day, "r": _cents(t["value"])})

    d = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("r", alias_name="rev"))
        .to_pandas()
        .sort_values("day")
    )
    d0 = int(d["day"].min())
    x = np.zeros(32, np.int64)
    x[d["day"].to_numpy(np.int64) - d0] = d["rev"].to_numpy(np.int64)
    rows = []
    s = x
    for lvl in range(1, 6):
        a, b = s[0::2], s[1::2]
        det = a - b
        s = a + b
        for i, c in enumerate(det, start=1):
            rows.append((lvl, i, int(c)))
    rows.append((6, 1, int(s[0])))
    return pd.DataFrame(rows, columns=["level", "idx", "coeff"]).astype("int64")


def daily_haar_coeffs_sql() -> str:
    return """
        WITH RECURSIVE daily AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev
            FROM events GROUP BY 1
        ),
        b AS (SELECT MIN(day) AS d0 FROM daily),
        spine AS (
            SELECT UNNEST(generate_series(0, 31)) AS slot
        ),
        shifted AS (
            SELECT day - (SELECT d0 FROM b) AS slot, rev FROM daily
        ),
        x AS (
            SELECT s.slot + 1 AS i, COALESCE(d.rev, 0) AS v
            FROM spine s LEFT JOIN shifted d ON d.slot = s.slot
        ),
        m AS (
            SELECT 0 AS lvl, i, v AS s FROM x
            UNION ALL
            SELECT lvl + 1, (i + 1) // 2, s + nxt
            FROM (
                SELECT lvl, i, s, LEAD(s) OVER (ORDER BY i) AS nxt
                FROM m
            ) WHERE i % 2 = 1 AND nxt IS NOT NULL AND lvl < 5
        ),
        details AS (
            SELECT a.lvl + 1 AS level, (a.i + 1) // 2 AS idx, a.s - c.s AS coeff
            FROM m a JOIN m c ON c.lvl = a.lvl AND c.i = a.i + 1
            WHERE a.i % 2 = 1
        )
        SELECT CAST(level AS BIGINT) AS level, CAST(idx AS BIGINT) AS idx,
               CAST(coeff AS BIGINT) AS coeff
        FROM details
        UNION ALL
        SELECT 6, 1, CAST(s AS BIGINT) FROM m WHERE lvl = 5
        ORDER BY level, idx
    """


def signup_to_purchase_clean(sf_dir: str) -> pd.DataFrame:
    """Exclusion funnel: purchases that follow a signup with NO error
    in between (last signup strictly after last error at purchase
    time) — the state-machine acceptance count plain funnels miss.
    Output per qualifying user: clean purchase count and the first
    clean purchase timestamp.

    Distributed plan: user-keyed groupby; per group one cummax sweep
    of signup/error timestamps."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "event_type": t["event_type"],
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy(np.int64)
        ev = g["event_type"].to_numpy()
        NEG = np.int64(-(1 << 62))
        sig = np.maximum.accumulate(np.where(ev == "signup", ts, NEG))
        err = np.maximum.accumulate(np.where(ev == "error", ts, NEG))
        last_sig = np.r_[NEG, sig[:-1]]
        last_err = np.r_[NEG, err[:-1]]
        clean = (ev == "purchase") & (last_sig > NEG) & (last_sig > last_err)
        if not clean.any():
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64")}
            ).reindex(columns=["user_id", "n_clean_purchases", "first_clean_ts"])
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_clean_purchases": [int(clean.sum())],
                "first_clean_ts": [int(ts[clean][0])],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def signup_to_purchase_clean_sql() -> str:
    return """
        WITH w AS (
            SELECT user_id AS u, ts, event_type,
                   MAX(CASE WHEN event_type = 'signup'
                            THEN epoch_us(ts) END) OVER pre AS last_signup,
                   MAX(CASE WHEN event_type = 'error'
                            THEN epoch_us(ts) END) OVER pre AS last_error
            FROM events
            WINDOW pre AS (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT CAST(u AS BIGINT) AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_clean_purchases,
               CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_clean_ts
        FROM w
        WHERE event_type = 'purchase' AND last_signup IS NOT NULL
          AND (last_error IS NULL OR last_signup > last_error)
        GROUP BY u ORDER BY u
    """


def min_audit_points(sf_dir: str, span_s: int = 600) -> pd.DataFrame:
    """Minimum interval stabbing: the fewest audit timestamps that
    touch every purchase window [ts, ts + span] — the classic greedy
    (take the earliest right endpoint, skip everything it covers) IS
    optimal, and both sides replay it exactly: the engine with one
    sorted sweep, the SQL twin with a linear recursive CTE whose step
    picks MIN(end) among intervals starting after the last point.
    Output: interval count, point count, point-sum checksum.

    Distributed plan: the sweep needs the interval list sorted by end;
    at fixture scale the purchase subset folds to the driver, at 100 TB
    the same greedy runs per time-range partition with O(partitions)
    boundary stitching (a point never helps across a gap > span)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        s = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000)
        return pa.table({"s": s})

    s = np.sort(
        ds.map_batches(keys, batch_format="pyarrow").to_pandas()["s"].to_numpy(np.int64)
    )
    e = s + span_s
    points = []
    i = 0
    n = len(s)
    while i < n:
        pt = int(e[i])
        points.append(pt)
        i = int(np.searchsorted(s, pt, side="right"))
    return pd.DataFrame(
        {
            "n_intervals": [n],
            "n_points": [len(points)],
            "sum_points": [int(sum(points))],
        }
    ).astype("int64")


def min_audit_points_sql(span_s: int = 600) -> str:
    return f"""
        WITH RECURSIVE iv AS (
            SELECT epoch_us(ts) // 1000000 AS s,
                   epoch_us(ts) // 1000000 + {span_s} AS e
            FROM events WHERE event_type = 'purchase'
        ),
        g AS (
            SELECT MIN(e) AS pt FROM iv
            UNION ALL
            SELECT (SELECT MIN(e) FROM iv WHERE s > g.pt) FROM g
            WHERE EXISTS (SELECT 1 FROM iv WHERE s > g.pt)
        )
        SELECT CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_intervals,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(pt) AS BIGINT) AS sum_points
        FROM g
    """


def queue_sim_wait_times(sf_dir: str, service_s: int = 300) -> pd.DataFrame:
    """Single-server queue (M/D/1-style) replay over purchase arrivals
    with a fixed 300 s service time: departure D_i = max(A_i, D_{i-1})
    + S unrolls to the CLOSED FORM D_i = (i+1)*S + max_{j<=i}(A_j -
    j*S), so a window cummax replaces the recurrence and both the
    engine and the SQL twin stay exact and hash-identical (waits are
    permutation-invariant under arrival ties).  Output: arrivals,
    total/max wait seconds, makespan.

    Distributed plan: the A_j - j*S transform needs the global arrival
    rank — a two-phase bucket scan (per-bucket counts -> exclusive
    prefix -> per-bucket cummax candidates) exactly like
    events_pettitt_change; at fixture scale the purchase subset is
    folded directly."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table(
            {"s": pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000)}
        )

    a = np.sort(
        ds.map_batches(keys, batch_format="pyarrow").to_pandas()["s"].to_numpy(np.int64)
    )
    n = len(a)
    i = np.arange(n, dtype=np.int64)
    m = np.maximum.accumulate(a - i * service_s)
    wait = m + i * service_s - a
    makespan = int(m[-1] + n * service_s - a[0]) if n else 0
    return pd.DataFrame(
        {
            "n_arrivals": [n],
            "total_wait_s": [int(wait.sum())],
            "max_wait_s": [int(wait.max()) if n else 0],
            "makespan_s": [makespan],
        }
    ).astype("int64")


def queue_sim_wait_times_sql(service_s: int = 300) -> str:
    return f"""
        WITH a AS (
            SELECT epoch_us(ts) // 1000000 AS s FROM events
            WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT s, ROW_NUMBER() OVER (ORDER BY s) - 1 AS i FROM a
        ),
        w AS (
            SELECT s, i,
                   MAX(s - i * {service_s}) OVER (
                       ORDER BY i ROWS UNBOUNDED PRECEDING) AS m
            FROM r
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_arrivals,
               CAST(SUM(m + i * {service_s} - s) AS BIGINT) AS total_wait_s,
               CAST(MAX(m + i * {service_s} - s) AS BIGINT) AS max_wait_s,
               CAST(MAX(m) + COUNT(*) * {service_s} - MIN(s) AS BIGINT) AS makespan_s
        FROM w
    """


def label_agreement_kappa(sf_dir: str) -> pd.DataFrame:
    """Inter-labeler agreement audit (Cohen's kappa sufficient stats)
    between two derived binary labelers over documents: labeler A =
    "longer than the corpus lower-median n_chars", labeler B =
    "lang = 'en'".  Output: the 2x2 confusion counts plus the exact
    integer numerators of observed agreement (po_num / n) and chance
    agreement (pe_num / n^2) — kappa = (n*po_num - pe_num) /
    (n^2 - pe_num) is a driver-side rational.

    Distributed plan: the median comes from a DOMAIN-sized n_chars
    histogram; the confusion fold is one packed-key Count."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars", "lang"])

    h = (
        ds.groupby("n_chars").aggregate(Count(alias_name="c")).to_pandas().sort_values("n_chars")
    )
    cum = np.cumsum(h["c"].to_numpy(np.int64))
    n = int(cum[-1])
    med = int(h["n_chars"].to_numpy(np.int64)[np.searchsorted(cum, (n + 1) // 2)])

    def keys(t: pa.Table) -> pa.Table:
        a = pc.cast(pc.greater(t["n_chars"], med), pa.int64())
        b = pc.cast(pc.equal(t["lang"], "en"), pa.int64())
        return pa.table({"k": pc.add(pc.multiply(a, 2), b)})

    cnt = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    cell = {int(k): int(c) for k, c in zip(cnt["k"], cnt["c"])}
    n00, n01, n10, n11 = (cell.get(i, 0) for i in range(4))
    po_num = n11 + n00
    pe_num = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
    return pd.DataFrame(
        {
            "n": [n],
            "n_long_en": [n11],
            "n_long_other": [n10],
            "n_short_en": [n01],
            "n_short_other": [n00],
            "po_num": [po_num],
            "pe_num": [pe_num],
        }
    ).astype("int64")


def label_agreement_kappa_sql() -> str:
    return """
        WITH m AS (
            SELECT n_chars AS med FROM (
                SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) AS rn,
                       COUNT(*) OVER () AS n
                FROM documents
            ) WHERE rn = (n + 1) // 2
        ),
        lab AS (
            SELECT CASE WHEN n_chars > (SELECT med FROM m) THEN 1 ELSE 0 END AS a,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b
            FROM documents
        ),
        c AS (
            SELECT SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
                   SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n10,
                   SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS n01,
                   SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00,
                   COUNT(*) AS n
            FROM lab
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n11 AS BIGINT) AS n_long_en,
               CAST(n10 AS BIGINT) AS n_long_other,
               CAST(n01 AS BIGINT) AS n_short_en,
               CAST(n00 AS BIGINT) AS n_short_other,
               CAST(n11 + n00 AS BIGINT) AS po_num,
               CAST((n11 + n10) * (n11 + n01)
                    + (n00 + n01) * (n00 + n10) AS BIGINT) AS pe_num
        FROM c
    """


def sfe_code_lengths(sf_dir: str) -> pd.DataFrame:
    """Shannon-Fano-Elias code lengths per event type from exact
    integer bit arithmetic: len(t) = ceil(log2(n / c_t)) + 1 computed
    as the smallest k with c_t * 2^k >= n (no floating log), plus the
    Kraft-sum numerator sum(2^(L_max - len)) over 2^L_max — the
    prefix-code budget audit, bit-exact in SQL via a small power
    series.

    Distributed plan: one type-keyed Count; the bit arithmetic is a
    catalog-sized finalize."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    h = (
        ds.groupby("event_type").aggregate(Count(alias_name="c")).to_pandas().sort_values("event_type")
    )
    n = int(h["c"].sum())
    rows = []
    for ty, c in zip(h["event_type"], h["c"].astype(int)):
        k = 0
        while c * (1 << k) < n:
            k += 1
        rows.append((ty, int(c), k + 1))
    out = pd.DataFrame(rows, columns=["event_type", "cnt", "code_len"])
    lmax = int(out["code_len"].max())
    out["kraft_num"] = [1 << (lmax - int(x)) for x in out["code_len"]]
    for c in ("cnt", "code_len", "kraft_num"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def sfe_code_lengths_sql() -> str:
    return """
        WITH h AS (
            SELECT event_type, COUNT(*) AS c FROM events GROUP BY 1
        ),
        tot AS (SELECT SUM(c) AS n FROM h),
        ks AS (SELECT UNNEST(generate_series(0, 40)) AS k),
        len AS (
            SELECT h.event_type, h.c,
                   MIN(ks.k) + 1 AS code_len
            FROM h, tot, ks
            WHERE h.c * (CAST(1 AS BIGINT) << ks.k) >= tot.n
            GROUP BY 1, 2
        ),
        mx AS (SELECT MAX(code_len) AS lmax FROM len)
        SELECT event_type, CAST(c AS BIGINT) AS cnt,
               CAST(code_len AS BIGINT) AS code_len,
               CAST(CAST(1 AS BIGINT) << (mx.lmax - code_len) AS BIGINT)
                   AS kraft_num
        FROM len, mx ORDER BY event_type
    """


def events_mannwhitney_u(sf_dir: str) -> pd.DataFrame:
    """Mann-Whitney U between weekend and weekday event values — the
    nonparametric location-shift test a metrics pipeline runs where a
    t-test's normality assumption fails.  EXACT integers only: with
    midranks doubled (2*midrank of a tied run = 2*cum_before + run + 1
    is always integral) the doubled rank sum r2_wknd, the doubled
    statistic u2_wknd = 2*R1 - n1*(n1+1), and the tie-correction term
    sum(t^3 - t) are all bigints, so engine and oracle hash-match with
    no float ranking.

    Distributed plan: the bounded cents domain reduces the corpus to a
    (value, n_weekend, n) frequency table via one groupby — the same
    domain-histogram shape as events_ks_statistic; the rank fold is a
    domain-sized cumsum."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        wknd = ((days + 3) % 7 >= 5).astype(np.int64)
        return pa.table({"cents": _cents(t["value"]), "a": pa.array(wknd)})

    freq = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("a", alias_name="a"), Count(alias_name="n"))
        .to_pandas()
        .sort_values("cents")
        .reset_index(drop=True)
    )
    a = freq["a"].to_numpy(np.int64)
    n_run = freq["n"].to_numpy(np.int64)
    cum_before = np.cumsum(n_run) - n_run
    n1 = int(a.sum())
    r2 = int((a * (2 * cum_before + n_run + 1)).sum())
    u2 = r2 - n1 * (n1 + 1)
    return pd.DataFrame(
        {
            "n_wknd": [n1],
            "n_wkdy": [int(n_run.sum()) - n1],
            "r2_wknd": [r2],
            "u2_wknd": [u2],
            "tie_term": [int((n_run**3 - n_run).sum())],
        }
    ).astype("int64")


def events_mannwhitney_u_sql() -> str:
    return """
        WITH f AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                   CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 >= 5
                        THEN 1 ELSE 0 END AS a
            FROM events
        ),
        g AS (SELECT v, SUM(a) AS a, COUNT(*) AS n FROM f GROUP BY 1),
        c AS (
            SELECT a, n,
                   SUM(n) OVER (ORDER BY v) - n AS cb
            FROM g
        ),
        s AS (
            SELECT SUM(a) AS n1, SUM(n) AS nt,
                   SUM(a * (2 * cb + n + 1)) AS r2,
                   SUM(n * n * n - n) AS tt
            FROM c
        )
        SELECT CAST(n1 AS BIGINT) AS n_wknd,
               CAST(nt - n1 AS BIGINT) AS n_wkdy,
               CAST(r2 AS BIGINT) AS r2_wknd,
               CAST(r2 - n1 * (n1 + 1) AS BIGINT) AS u2_wknd,
               CAST(tt AS BIGINT) AS tie_term
        FROM s
    """


def dhondt_allocation(sf_dir: str, seats: int = 100) -> pd.DataFrame:
    """D'Hondt (Jefferson highest-averages) apportionment of a fixed
    sampling budget of 100 slots across event types proportional to
    their counts — the seat-allocation rule a stratified-sampling
    planner uses when largest-remainder (already covered by
    largest_remainder_allocation) would violate quota monotonicity.
    Quotients c/k are ranked EXACTLY by integer cross-multiplication
    (ties broken by (event_type, k) ascending), so no float division
    enters the order.

    Distributed plan: one type-keyed Count reduces the corpus to a
    catalog-sized table; the quotient tournament is a driver-side
    finalize over |types| * seats entries."""
    from fractions import Fraction

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    h = (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    quot = [
        (Fraction(int(c), k), ty, k)
        for ty, c in zip(h["event_type"], h["c"].astype(int))
        for k in range(1, seats + 1)
    ]
    quot.sort(key=lambda q: (-q[0], q[1], q[2]))
    won = {}
    for _, ty, _k in quot[:seats]:
        won[ty] = won.get(ty, 0) + 1
    out = pd.DataFrame(
        {
            "event_type": h["event_type"],
            "cnt": h["c"].astype("int64"),
            "seats": [won.get(ty, 0) for ty in h["event_type"]],
        }
    )
    out["seats"] = out["seats"].astype("int64")
    return out


def dhondt_allocation_sql(seats: int = 100) -> str:
    return f"""
        WITH h AS (
            SELECT event_type, COUNT(*) AS c FROM events GROUP BY 1
        ),
        q AS (
            SELECT event_type, c, UNNEST(generate_series(1, {seats})) AS k
            FROM h
        ),
        r AS (
            SELECT a.event_type, a.c, a.k,
                   (SELECT COUNT(*) FROM q b
                    WHERE b.c * a.k > a.c * b.k
                       OR (b.c * a.k = a.c * b.k
                           AND (b.event_type < a.event_type
                                OR (b.event_type = a.event_type
                                    AND b.k < a.k)))) AS rnk
            FROM q a
        )
        SELECT h.event_type, CAST(h.c AS BIGINT) AS cnt,
               CAST(COALESCE(w.s, 0) AS BIGINT) AS seats
        FROM h LEFT JOIN (
            SELECT event_type, COUNT(*) AS s FROM r
            WHERE rnk < {seats} GROUP BY 1
        ) w USING (event_type)
        ORDER BY h.event_type
    """


def min_service_rate(sf_dir: str, max_wait_s: int = 3600) -> pd.DataFrame:
    """Capacity planning by parametric search: the LARGEST integer
    per-item service time S (seconds) a single-server queue over the
    purchase arrivals can afford while keeping every wait <= 1 hour.
    max_wait(S) = max_{j<i} ((i-j)*S - (A_i - A_j)) is monotone
    nondecreasing in S, so the engine binary-searches S with an O(n)
    closed-form cummax evaluation per probe (the queue_sim_wait_times
    recurrence), ~40 passes total; the SQL twin derives the same
    optimum from the O(n^2) pair bound S* = min_{j<i} floor((X + A_i -
    A_j)/(i-j)).  Tightness is part of the contract: the output
    carries max_wait at S* (<= X) and at S*+1 (> X).

    Distributed plan: each probe is the same global-rank two-phase
    bucket scan as queue_sim_wait_times; log2(range) sequential probes
    replace the quadratic pair join the oracle uses."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table(
            {"s": pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000)}
        )

    a = np.sort(
        ds.map_batches(keys, batch_format="pyarrow").to_pandas()["s"].to_numpy(np.int64)
    )
    n = len(a)
    i = np.arange(n, dtype=np.int64)

    def max_wait(s: int) -> int:
        m = np.maximum.accumulate(a - i * s)
        return int((m + i * s - a).max()) if n else 0

    lo, hi = 0, max_wait_s + (int(a[-1] - a[0]) if n > 1 else 0) + 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if max_wait(mid) <= max_wait_s:
            lo = mid
        else:
            hi = mid - 1
    return pd.DataFrame(
        {
            "n_arrivals": [n],
            "max_service_s": [lo],
            "wait_at_opt": [max_wait(lo)],
            "wait_above_opt": [max_wait(lo + 1)],
        }
    ).astype("int64")


def min_service_rate_sql(max_wait_s: int = 3600) -> str:
    return f"""
        WITH a AS (
            SELECT epoch_us(ts) // 1000000 AS s FROM events
            WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT s, ROW_NUMBER() OVER (ORDER BY s) - 1 AS i FROM a
        ),
        p AS (
            SELECT x.i - y.i AS d, x.s - y.s AS gap
            FROM r x JOIN r y ON y.i < x.i
        ),
        opt AS (
            SELECT MIN(({max_wait_s} + gap) // d) AS smax FROM p
        )
        SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_arrivals,
               CAST(opt.smax AS BIGINT) AS max_service_s,
               CAST(GREATEST(
                   (SELECT MAX(d * opt.smax - gap) FROM p), 0
               ) AS BIGINT) AS wait_at_opt,
               CAST(GREATEST(
                   (SELECT MAX(d * (opt.smax + 1) - gap) FROM p), 0
               ) AS BIGINT) AS wait_above_opt
        FROM opt
    """


def simpson_paradox_audit(sf_dir: str) -> pd.DataFrame:
    """Simpson's-paradox screen: the sign of the covariance between
    customer account balance and order total within each nation vs the
    pooled sign — the aggregation-reversal check an analyst runs
    before trusting a whole-population trend.  Covariance numerators
    n*Sxy - Sx*Sy exceed int64 (cents^2 * n), so the per-nation
    sufficient statistics fold as int64 (Sxy per row is ~5e13, sums
    ~8e16, safe) and only the driver-side finalize multiplies them as
    arbitrary-precision Python ints; the SQL twin casts to HUGEINT for
    the same products and both report only the int sign.

    Distributed plan: broadcast customer->(nation, acctbal) join
    inside map_batches, one nation-keyed groupby of 4 partials;
    catalog-sized finalize."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cref = ray.put(cust)

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        c = ray.get(cref) if not isinstance(cref, pa.Table) else cref
        j = t.join(c, keys="o_custkey", right_keys="c_custkey", join_type="inner")
        x = _cents(j["o_totalprice"])
        y = _cents(j["c_acctbal"])
        return pa.table(
            {
                "nk": j["c_nationkey"],
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
            }
        )

    g = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"),
            Sum("xy", alias_name="sxy"),
        )
        .to_pandas()
    )
    nmap = {int(k): v for k, v in zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())}

    def sign(v: int) -> int:
        return (v > 0) - (v < 0)

    tn = int(g["n"].sum())
    pooled = sign(tn * int(g["sxy"].sum()) - int(g["sx"].sum()) * int(g["sy"].sum()))
    rows = []
    for _, r in g.iterrows():
        cv = sign(int(r["n"]) * int(r["sxy"]) - int(r["sx"]) * int(r["sy"]))
        rows.append((nmap[int(r["nk"])], int(r["n"]), cv, pooled, int(cv != 0 and cv == -pooled)))
    out = pd.DataFrame(
        rows, columns=["n_name", "n_cust_orders", "sign_within", "sign_pooled", "paradox"]
    ).sort_values("n_name").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def simpson_paradox_audit_sql() -> str:
    return """
        WITH j AS (
            SELECT c.c_nationkey AS nk,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS x,
                   CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        g AS (
            SELECT nk, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(CAST(x AS HUGEINT) * y) AS sxy
            FROM j GROUP BY 1
        ),
        p AS (
            SELECT SIGN(SUM(n) * SUM(sxy)
                        - CAST(SUM(sx) AS HUGEINT) * SUM(sy)) AS sp
            FROM g
        )
        SELECT n.n_name, CAST(g.n AS BIGINT) AS n_cust_orders,
               CAST(SIGN(g.n * g.sxy
                         - CAST(g.sx AS HUGEINT) * g.sy) AS BIGINT)
                   AS sign_within,
               CAST(p.sp AS BIGINT) AS sign_pooled,
               CAST(CASE WHEN SIGN(g.n * g.sxy
                                   - CAST(g.sx AS HUGEINT) * g.sy) <> 0
                          AND SIGN(g.n * g.sxy
                                   - CAST(g.sx AS HUGEINT) * g.sy) = -p.sp
                         THEN 1 ELSE 0 END AS BIGINT) AS paradox
        FROM g JOIN nation n ON n.n_nationkey = g.nk, p
        ORDER BY n.n_name
    """


def daily_ohlc_donchian(sf_dir: str, lookback: int = 7) -> pd.DataFrame:
    """Daily OHLC candles over event value cents (open/close = first/
    last event of the day by (ts, event_id); high/low = extrema) plus
    a Donchian-channel breakout flag: day d breaks out when its high
    strictly exceeds the max high of the preceding 7 calendar days
    with at least one trading day present (first days with an empty
    window never break out).

    Distributed plan: one pass of per-batch per-day partials — each
    partial carries its (us, event_id)-argmin/argmax winners alongside
    min/max cents, so partials merge associatively; the day-spine merge
    and the 7-day rolling max run over the tiny spine on the driver."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "value"])

    def prep(t: pa.Table) -> pd.DataFrame:
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "day": days,
                "us": us,
                "eid": t["event_id"].to_numpy(),
                "cents": _cents(t["value"]).to_numpy(),
            }
        )
        rows = []
        for day, gdf in df.groupby("day"):
            order = np.lexsort((gdf["eid"].to_numpy(), gdf["us"].to_numpy()))
            f, la = gdf.iloc[order[0]], gdf.iloc[order[-1]]
            c = gdf["cents"].to_numpy()
            rows.append(
                (day, int(f["us"]), int(f["eid"]), int(f["cents"]),
                 int(la["us"]), int(la["eid"]), int(la["cents"]),
                 int(c.max()), int(c.min()))
            )
        return pd.DataFrame(
            rows, columns=["day", "fus", "feid", "fc", "lus", "leid", "lc", "h", "l"]
        )

    parts = ds.map_batches(prep, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("day").agg(h=("h", "max"), l=("l", "min")).reset_index()
    opens, closes = {}, {}
    for _, r in parts.iterrows():
        d = int(r["day"])
        if d not in opens or (r["fus"], r["feid"]) < opens[d][:2]:
            opens[d] = (int(r["fus"]), int(r["feid"]), int(r["fc"]))
        if d not in closes or (r["lus"], r["leid"]) > closes[d][:2]:
            closes[d] = (int(r["lus"]), int(r["leid"]), int(r["lc"]))
    agg = agg.sort_values("day").reset_index(drop=True)
    agg["open_c"] = [opens[int(d)][2] for d in agg["day"]]
    agg["close_c"] = [closes[int(d)][2] for d in agg["day"]]
    day = agg["day"].to_numpy(np.int64)
    high = agg["h"].to_numpy(np.int64)
    brk = np.zeros(len(agg), np.int64)
    for idx in range(len(agg)):
        mask = (day >= day[idx] - lookback) & (day < day[idx])
        if mask.any():
            brk[idx] = int(high[idx] > high[mask].max())
    out = pd.DataFrame(
        {
            "day": day,
            "open_c": agg["open_c"].astype("int64"),
            "high_c": high,
            "low_c": agg["l"].astype("int64"),
            "close_c": agg["close_c"].astype("int64"),
            "breakout": brk,
        }
    )
    return out


def daily_ohlc_donchian_sql(lookback: int = 7) -> str:
    return f"""
        WITH e AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   epoch_us(ts) AS us, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        d AS (
            SELECT day,
                   FIRST(c ORDER BY us, event_id) AS open_c,
                   MAX(c) AS high_c, MIN(c) AS low_c,
                   LAST(c ORDER BY us, event_id) AS close_c
            FROM e GROUP BY 1
        ),
        w AS (
            SELECT *,
                   MAX(high_c) OVER (
                       ORDER BY day RANGE BETWEEN {lookback} PRECEDING
                       AND 1 PRECEDING) AS prev_hi
            FROM d
        )
        SELECT CAST(day AS BIGINT) AS day, open_c, high_c, low_c, close_c,
               CAST(CASE WHEN prev_hi IS NOT NULL AND high_c > prev_hi
                         THEN 1 ELSE 0 END AS BIGINT) AS breakout
        FROM w ORDER BY day
    """


def user_type_period(sf_dir: str) -> pd.DataFrame:
    """Smallest period of each user's event-type sequence (ordered by
    ts, event_id): the least p <= n with s[i] == s[i+p] for all i —
    the stringology primitive behind repeating-behaviour detection.
    The engine runs the KMP failure function per user (period = n -
    fail[n], linear); the SQL twin brute-forces every candidate p with
    a positional self-join, so the two derivations are independent.

    Distributed plan: user-keyed groupby; the failure function is
    linear inside each group after one sort — the per-entity-DP shape
    user_lis_lengths establishes."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        s = df["event_type"].tolist()
        n = len(s)
        fail = [0] * (n + 1)
        k = 0
        for q in range(1, n):
            while k and s[q] != s[k]:
                k = fail[k]
            if s[q] == s[k]:
                k += 1
            fail[q + 1] = k
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "seq_len": [n],
                "period": [n - fail[n]],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def user_type_period_sql() -> str:
    return """
        WITH s AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
        ),
        cand AS (SELECT DISTINCT user_id, n FROM s),
        ps AS (
            SELECT user_id, n, UNNEST(generate_series(1, n)) AS p FROM cand
        ),
        ok AS (
            SELECT ps.user_id, ps.n, ps.p
            FROM ps
            WHERE NOT EXISTS (
                SELECT 1
                FROM s x JOIN s y
                  ON y.user_id = x.user_id AND y.i = x.i + ps.p
                WHERE x.user_id = ps.user_id
                  AND x.event_type <> y.event_type
            )
        )
        SELECT user_id, CAST(MAX(n) AS BIGINT) AS seq_len,
               CAST(MIN(p) AS BIGINT) AS period
        FROM ok GROUP BY user_id ORDER BY user_id
    """


def _hungarian_min(cost: list) -> int:
    """O(k^3) Hungarian (Jonker-Volgenant potentials) min-cost perfect
    assignment total over a square integer matrix — the classical
    shortest-augmenting-path formulation (public algorithmic knowledge,
    cp-algorithms presentation)."""
    inf = float("inf")
    n = len(cost)
    u = [0] * (n + 1)
    v = [0] * (n + 1)
    p = [0] * (n + 1)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [inf] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], inf, -1
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    return sum(cost[p[j] - 1][j - 1] for j in range(1, n + 1))


def min_cost_assignment(sf_dir: str, k: int = 6) -> pd.DataFrame:
    """Optimal one-to-one pairing of the k=6 highest-volume suppliers
    with the k highest-volume parts, maximizing total shipped quantity
    — the exact assignment a routing planner wants where a greedy
    match leaves quantity on the table.  The engine builds the k x k
    quantity matrix distributed (two top-k folds + one pair-keyed
    groupby over the packed (suppkey, partkey) key) and solves it with
    the O(k^3) Hungarian finalize, which keeps working at k in the
    hundreds; the SQL twin enumerates all 720 permutations, an
    independent derivation only feasible because k is tiny.

    Ranking tie-breaks are (quantity DESC, key ASC) on both sides."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey", "l_quantity"]
    )

    def prep(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        return pa.table({"s": t["l_suppkey"], "p": t["l_partkey"], "q": q})

    base = ds.map_batches(prep, batch_format="pyarrow")
    sup = base.groupby("s").aggregate(Sum("q", alias_name="tq")).to_pandas()
    prt = base.groupby("p").aggregate(Sum("q", alias_name="tq")).to_pandas()
    sup = sup.sort_values(["tq", "s"], ascending=[False, True]).head(k)
    prt = prt.sort_values(["tq", "p"], ascending=[False, True]).head(k)
    s_ids = [int(x) for x in sup["s"]]
    p_ids = [int(x) for x in prt["p"]]

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t["s"], value_set=pa.array(s_ids, pa.int64())),
            pc.is_in(t["p"], value_set=pa.array(p_ids, pa.int64())),
        )
        t = t.filter(keep)
        packed = pc.add(pc.multiply(t["s"], 10_000_000), t["p"])
        return pa.table({"sp": packed, "q": t["q"]})

    cell = (
        base.map_batches(pairs, batch_format="pyarrow")
        .groupby("sp")
        .aggregate(Sum("q", alias_name="q"))
        .to_pandas()
    )
    lut = {int(r["sp"]): int(r["q"]) for _, r in cell.iterrows()}
    mat = [
        [lut.get(si * 10_000_000 + pj, 0) for pj in p_ids]
        for si in s_ids
    ]
    neg = [[-c for c in row] for row in mat]
    best = -_hungarian_min(neg)
    n_present = int(sum(1 for row in mat for c in row if c > 0))
    return pd.DataFrame(
        {"k": [k], "n_pairs_present": [n_present], "max_total_qty": [best]}
    ).astype("int64")


def min_cost_assignment_sql(k: int = 6) -> str:
    return f"""
        WITH q AS (
            SELECT l_suppkey AS s, l_partkey AS p,
                   CAST(ROUND(l_quantity) AS BIGINT) AS q
            FROM lineitem
        ),
        sup AS (
            SELECT s, ROW_NUMBER() OVER (ORDER BY SUM(q) DESC, s) AS si
            FROM q GROUP BY s
            QUALIFY si <= {k}
        ),
        prt AS (
            SELECT p, ROW_NUMBER() OVER (ORDER BY SUM(q) DESC, p) AS pi
            FROM q GROUP BY p
            QUALIFY pi <= {k}
        ),
        m AS (
            SELECT sup.si, prt.pi,
                   COALESCE((SELECT SUM(x.q) FROM q x
                             WHERE x.s = sup.s AND x.p = prt.p), 0) AS c
            FROM sup, prt
        )
        SELECT CAST({k} AS BIGINT) AS k,
               CAST((SELECT COUNT(*) FROM m WHERE c > 0) AS BIGINT)
                   AS n_pairs_present,
               CAST((
                   SELECT MAX(m1.c + m2.c + m3.c + m4.c + m5.c + m6.c)
                   FROM m m1, m m2, m m3, m m4, m m5, m m6
                   WHERE m1.si = 1 AND m2.si = 2 AND m3.si = 3
                     AND m4.si = 4 AND m5.si = 5 AND m6.si = 6
                     AND m2.pi <> m1.pi
                     AND m3.pi NOT IN (m1.pi, m2.pi)
                     AND m4.pi NOT IN (m1.pi, m2.pi, m3.pi)
                     AND m5.pi NOT IN (m1.pi, m2.pi, m3.pi, m4.pi)
                     AND m6.pi NOT IN (m1.pi, m2.pi, m3.pi, m4.pi, m5.pi)
               ) AS BIGINT) AS max_total_qty
    """


def _booth_min_rotation(s: list) -> int:
    """Booth's algorithm: least starting index of the lexicographically
    minimal rotation of sequence s, O(n) over any comparable alphabet
    (tokens here, not characters)."""
    n = len(s)
    s2 = s + s
    f = [-1] * (2 * n)
    kk = 0
    for j in range(1, 2 * n):
        sj = s2[j]
        i = f[j - kk - 1]
        while i != -1 and sj != s2[kk + i + 1]:
            if sj < s2[kk + i + 1]:
                kk = j - i - 1
            i = f[i]
        if sj != s2[kk + i + 1]:
            if sj < s2[kk]:
                kk = j
            f[j - kk] = -1
        else:
            f[j - kk] = i + 1
    return kk


def user_type_min_rotation(sf_dir: str) -> pd.DataFrame:
    """Canonical (necklace) form of each user's event-type sequence:
    the lexicographically minimal rotation and its least starting
    index — the rotation-invariant fingerprint that groups users whose
    behaviour cycles through the same loop with different phases.  The
    engine runs Booth's O(n) algorithm per user over the TOKEN
    sequence; the SQL twin materializes every rotation as a
    comma-joined string and takes the minimum, which agrees with token
    order because no event type is a prefix of another.

    Distributed plan: user-keyed groupby, linear scan per group."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        s = df["event_type"].tolist()
        i = _booth_min_rotation(s)
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "seq_len": [len(s)],
                "rot_i": [i],
                "min_rot": [",".join(s[i:] + s[:i])],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in ("user_id", "seq_len", "rot_i"):
        out[c] = out[c].astype("int64")
    return out


def user_type_min_rotation_sql() -> str:
    return """
        WITH s AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) - 1 AS pos,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
        ),
        rot AS (
            SELECT user_id, n, UNNEST(generate_series(0, n - 1)) AS i
            FROM (SELECT DISTINCT user_id, n FROM s)
        ),
        r AS (
            SELECT rot.user_id, rot.n, rot.i,
                   (SELECT string_agg(x.event_type, ','
                            ORDER BY (x.pos - rot.i + rot.n) % rot.n)
                    FROM s x WHERE x.user_id = rot.user_id) AS rs
            FROM rot
        )
        SELECT user_id, CAST(n AS BIGINT) AS seq_len,
               CAST(i AS BIGINT) AS rot_i, rs AS min_rot
        FROM r
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY rs, i) = 1
        ORDER BY user_id
    """


def inventory_policy_replay(
    sf_dir: str, reorder_at: int = 100, order_up_to: int = 250
) -> pd.DataFrame:
    """(s, S) inventory policy replay against the daily purchase demand
    stream: each day serve demand from stock (unmet demand is lost
    sales), then replenish to S whenever stock has fallen to s or
    below.  The classic stateful-stream simulation whose integer state
    (stock, replenishments, lost units) both engines must carry
    identically; the SQL twin runs the same recurrence as a recursive
    CTE over the day spine.

    Distributed plan: one day-keyed Count collapses the corpus to the
    day spine; the sequential policy loop runs over that tiny spine on
    the driver (state is O(1), days are O(corpus span))."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        import numpy as np

        t = t.filter(pc.equal(t["event_type"], "purchase"))
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table({"day": pa.array(days)})

    dem = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="dem"))
        .to_pandas()
        .sort_values("day")
    )
    stock, n_repl, lost = order_up_to, 0, 0
    for d in dem["dem"].astype(int):
        lost += max(d - stock, 0)
        stock = max(stock - d, 0)
        if stock <= reorder_at:
            stock = order_up_to
            n_repl += 1
    return pd.DataFrame(
        {
            "n_days": [len(dem)],
            "n_replenish": [n_repl],
            "total_lost": [lost],
            "end_stock": [stock],
        }
    ).astype("int64")


def inventory_policy_replay_sql(reorder_at: int = 100, order_up_to: int = 250) -> str:
    return f"""
        WITH RECURSIVE d AS (
            SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS dem
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        idx AS (
            SELECT dem, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d
        ),
        sim AS (
            SELECT 0 AS i, {order_up_to} AS stock, 0 AS n_repl, 0 AS lost
            UNION ALL
            SELECT idx.i,
                   CASE WHEN GREATEST(sim.stock - idx.dem, 0) <= {reorder_at}
                        THEN {order_up_to}
                        ELSE GREATEST(sim.stock - idx.dem, 0) END,
                   sim.n_repl
                       + CASE WHEN GREATEST(sim.stock - idx.dem, 0)
                                   <= {reorder_at} THEN 1 ELSE 0 END,
                   sim.lost + GREATEST(idx.dem - sim.stock, 0)
            FROM sim JOIN idx ON idx.i = sim.i + 1
        )
        SELECT CAST((SELECT COUNT(*) FROM idx) AS BIGINT) AS n_days,
               CAST(n_repl AS BIGINT) AS n_replenish,
               CAST(lost AS BIGINT) AS total_lost,
               CAST(stock AS BIGINT) AS end_stock
        FROM sim WHERE i = (SELECT COUNT(*) FROM idx)
    """


def embedding_closest_pair(sf_dir: str) -> pd.DataFrame:
    """Exact closest pair in the embedding space (min Euclidean
    distance over all N^2/2 pairs), reported as the id pair only —
    float distance values never enter the contract, so the result is
    hash-stable as long as the winning margin dominates summation
    noise (the fixtures' margins do; the test asserts it).  Ties break
    on (vec_id_a, vec_id_b).

    Distributed plan: the all-pairs scan is blocked exactly like
    ann_topk — the full [N, D] float32 matrix is ray.put once, each
    batch computes distances of its rows against all columns with one
    BLAS gemm, keeps its local best, and the driver merges
    O(num_blocks) candidates.  The LSH-bucketed sibling
    (embedding_sign_lsh_pairs) is the documented 10^9-vector path."""
    import numpy as np

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids_all = tbl["vec_id"].to_numpy()
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    mref = ray.put((ids_all, mat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def local_best(t: pa.Table) -> pd.DataFrame:
        ids_g, m_g = ray.get(mref)
        rows = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        rid = t["vec_id"].to_numpy()
        # squared distances row-block x all, exact enough: argmin only
        d2 = (
            (rows * rows).sum(axis=1)[:, None]
            + (m_g * m_g).sum(axis=1)[None, :]
            - 2.0 * rows @ m_g.T
        )
        mask = rid[:, None] >= ids_g[None, :]
        d2[mask] = np.inf
        i, j = np.unravel_index(np.argmin(d2), d2.shape)
        # within-block ties: re-scan candidates at the min
        cand = np.argwhere(d2 <= d2[i, j])
        best = min((int(rid[a]), int(ids_g[b])) for a, b in cand)
        return pd.DataFrame(
            {"a": [best[0]], "b": [best[1]], "d2": [float(d2[i, j])]}
        )

    parts = ds.map_batches(local_best, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["d2", "a", "b"]).reset_index(drop=True)
    win = parts.iloc[0]
    return pd.DataFrame(
        {"vec_id_a": [int(win["a"])], "vec_id_b": [int(win["b"])]}
    ).astype("int64")


def embedding_closest_pair_sql() -> str:
    return """
        SELECT CAST(a.vec_id AS BIGINT) AS vec_id_a,
               CAST(b.vec_id AS BIGINT) AS vec_id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ORDER BY list_distance(a.embedding, b.embedding), a.vec_id, b.vec_id
        LIMIT 1
    """


def type_value_sd_floor(sf_dir: str) -> pd.DataFrame:
    """Integer-exact dispersion per event type: floor(sqrt(n*Sxx -
    Sx^2)) over value cents — the population-sd numerator as an exact
    integer square root (math.isqrt), immune to float accumulation.
    The variance numerator exceeds int64 at 100-TB counts, so partials
    fold as int64 (safe: per-batch Sxx ~ 1e14) and only the
    catalog-sized finalize promotes to arbitrary-precision ints; the
    SQL twin uses HUGEINT plus a +-1-corrected double sqrt (double
    sqrt's relative error is far below 1 at these magnitudes, the
    correction makes it exact).

    Distributed plan: one type-keyed groupby of 3 partials."""
    import math

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        x = _cents(t["value"])
        return pa.table(
            {"event_type": t["event_type"], "x": x, "xx": pc.multiply(x, x)}
        )

    g = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"),
            Sum("xx", alias_name="sxx"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    sd = [
        math.isqrt(int(r["n"]) * int(r["sxx"]) - int(r["sx"]) ** 2)
        for _, r in g.iterrows()
    ]
    out = pd.DataFrame(
        {"event_type": g["event_type"], "n": g["n"].astype("int64"), "sd_floor": sd}
    )
    out["sd_floor"] = out["sd_floor"].astype("int64")
    return out


def type_value_sd_floor_sql() -> str:
    return """
        WITH f AS (
            SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS x
            FROM events
        ),
        g AS (
            SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx
            FROM f GROUP BY 1
        ),
        v AS (
            SELECT event_type, n,
                   n * sxx - CAST(sx AS HUGEINT) * sx AS var_num
            FROM g
        ),
        k AS (
            SELECT *, CAST(FLOOR(SQRT(CAST(var_num AS DOUBLE))) AS BIGINT) AS kf
            FROM v
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(CASE
                   WHEN CAST(kf + 1 AS HUGEINT) * (kf + 1) <= var_num THEN kf + 1
                   WHEN CAST(kf AS HUGEINT) * kf > var_num THEN kf - 1
                   ELSE kf END AS BIGINT) AS sd_floor
        FROM k ORDER BY event_type
    """


def _sam_distinct_substrings(s: list) -> int:
    """Distinct non-empty contiguous subsequences of s, counted by a
    suffix automaton (sum of len[v] - len[link[v]]), O(n) states."""
    sa_len, sa_link, trans = [0], [-1], [{}]
    last = 0
    for ch in s:
        cur = len(sa_len)
        sa_len.append(sa_len[last] + 1)
        sa_link.append(-1)
        trans.append({})
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 0
        else:
            q = trans[p][ch]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = len(sa_len)
                sa_len.append(sa_len[p] + 1)
                sa_link.append(sa_link[q])
                trans.append(dict(trans[q]))
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur
    return sum(sa_len[v] - sa_len[sa_link[v]] for v in range(1, len(sa_len)))


def user_distinct_subseq_count(sf_dir: str) -> pd.DataFrame:
    """Distinct contiguous type-subsequence count per user — the
    behavioural-complexity measure (a user looping view,click,view,
    click has far fewer distinct windows than an explorer).  The
    engine builds a suffix automaton per user (linear states, exact
    count as sum(len[v]-len[link[v]])); the SQL twin counts DISTINCT
    array slices over all O(n^2) (i,j) windows — maximally independent
    derivations of the same integer.

    Distributed plan: user-keyed groupby, linear automaton per group."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        s = df["event_type"].tolist()
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "seq_len": [len(s)],
                "n_distinct_subseq": [_sam_distinct_substrings(s)],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def user_distinct_subseq_count_sql() -> str:
    return """
        WITH s AS (
            SELECT user_id,
                   list(event_type ORDER BY ts, event_id) AS seq,
                   COUNT(*) AS n
            FROM events GROUP BY user_id
        ),
        ii AS (
            SELECT user_id, n, seq, UNNEST(generate_series(1, n)) AS i FROM s
        ),
        jj AS (
            SELECT user_id, n, seq, i, UNNEST(generate_series(i, n)) AS j
            FROM ii
        )
        SELECT user_id, CAST(MAX(n) AS BIGINT) AS seq_len,
               CAST(COUNT(DISTINCT array_slice(seq, i, j)) AS BIGINT)
                   AS n_distinct_subseq
        FROM jj GROUP BY user_id ORDER BY user_id
    """


def events_lcs_top2(sf_dir: str) -> pd.DataFrame:
    """Longest common subsequence length between the event-type
    sequences of the two most-active users — the alignment primitive
    behind behavioural-similarity scoring.  The engine runs the
    prefix-max reformulation of the LCS row recurrence (new[j] =
    max(prev[j], runmax_k<=j(prev[k-1] + eq_k)), valid because LCS rows
    are monotone), one vectorized numpy pass per token; the SQL twin
    carries the entire DP row as a LIST column through a recursive CTE
    (DuckDB's recursive term allows no aggregates, so the row-max is a
    list_max over a list_transform slice) — fully independent
    derivations.

    Distributed plan: per-pair work is the anti-diagonal wavefront DP;
    the pair selection (two top-k folds) is the distributed part at
    fixture scale, and the row DP is O(min(n,m)) memory."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    cnt = (
        ds.groupby("user_id").aggregate(Count(alias_name="c")).to_pandas()
        .sort_values(["c", "user_id"], ascending=[False, True])
    )
    ua, ub = int(cnt["user_id"].iloc[0]), int(cnt["user_id"].iloc[1])

    def seq_of(uid: int) -> list:
        def pick(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["user_id"], uid))

        t = (
            ds.map_batches(pick, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["ts", "event_id"])
        )
        return t["event_type"].tolist()

    A, B = seq_of(ua), seq_of(ub)
    prev = np.zeros(len(B) + 1, np.int64)
    barr = np.array(B)
    for a in A:
        eq = (barr == a).astype(np.int64)
        run = np.maximum.accumulate(prev[:-1] + eq)
        new = prev.copy()
        new[1:] = np.maximum(prev[1:], run)
        prev = new
    return pd.DataFrame(
        {
            "user_a": [ua],
            "user_b": [ub],
            "len_a": [len(A)],
            "len_b": [len(B)],
            "lcs_len": [int(prev[-1])],
        }
    ).astype("int64")


def events_lcs_top2_sql() -> str:
    return """
        WITH RECURSIVE top2 AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rk
            FROM events GROUP BY user_id QUALIFY rk <= 2
        ),
        seqa AS (
            SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) AS i,
                   event_type AS t
            FROM events
            WHERE user_id = (SELECT user_id FROM top2 WHERE rk = 1)
        ),
        bl AS (
            SELECT list(event_type ORDER BY ts, event_id) AS b
            FROM events
            WHERE user_id = (SELECT user_id FROM top2 WHERE rk = 2)
        ),
        dims AS (
            SELECT (SELECT MAX(i) FROM seqa) AS n,
                   (SELECT len(b) FROM bl) AS m
        ),
        dp AS (
            SELECT 0 AS i,
                   list_transform(
                       generate_series(0, (SELECT m FROM dims)), x -> 0) AS row,
                   (SELECT b FROM bl) AS b
            UNION ALL
            SELECT dp.i + 1,
                   list_prepend(0,
                       list_transform(generate_series(1, len(dp.row) - 1), j ->
                           GREATEST(
                               dp.row[j + 1],
                               list_max(list_transform(generate_series(1, j), k ->
                                   dp.row[k] + CASE WHEN dp.b[k] = a.t
                                                    THEN 1 ELSE 0 END))))),
                   dp.b
            FROM dp JOIN seqa a ON a.i = dp.i + 1
        )
        SELECT CAST((SELECT user_id FROM top2 WHERE rk = 1) AS BIGINT) AS user_a,
               CAST((SELECT user_id FROM top2 WHERE rk = 2) AS BIGINT) AS user_b,
               CAST(dims.n AS BIGINT) AS len_a,
               CAST(dims.m AS BIGINT) AS len_b,
               CAST(dp.row[dims.m + 1] AS BIGINT) AS lcs_len
        FROM dp, dims WHERE dp.i = dims.n
    """


def daily_value_convex_hull(sf_dir: str) -> pd.DataFrame:
    """Strict convex hull of the (day, daily value cents) point set —
    the extreme days that bound every linear trend line.  The engine
    runs Andrew's monotone chain with strict turns (collinear interior
    points dropped); the SQL twin decides hull membership pointwise by
    Caratheodory: p is NOT a vertex iff it lies on a segment of two
    other points or strictly inside a triangle of three others, all in
    exact integer cross/dot arithmetic — an O(n^4) certificate that is
    algorithm-independent of the chain.

    Distributed plan: one day-keyed groupby collapses the corpus to
    the spine; the chain is O(n log n) on the driver over spine-sized
    input."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table({"day": pa.array(days), "c": _cents(t["value"])})

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("c", alias_name="cents"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    pts = [(int(d), int(c)) for d, c in zip(daily["day"], daily["cents"])]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def chain(points):
        lower, upper = [], []
        for p in points:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                lower.pop()
            lower.append(p)
        for p in reversed(points):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                upper.pop()
            upper.append(p)
        return set(lower) | set(upper)

    hull = sorted(chain(pts))
    return pd.DataFrame(hull, columns=["day", "sum_cents"]).astype("int64")


def daily_value_convex_hull_sql() -> str:
    return """
        WITH d AS (
            SELECT epoch_us(ts) // 86400000000 AS x,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
            FROM events GROUP BY 1
        ),
        seg AS (  -- p strictly inside (or at the end of) a segment qr
            SELECT DISTINCT p.x AS px
            FROM d p, d q, d r
            WHERE q.x <> p.x AND r.x <> p.x AND q.x < r.x
              AND CAST(r.x - q.x AS HUGEINT) * (p.y - q.y)
                  = CAST(r.y - q.y AS HUGEINT) * (p.x - q.x)
              AND p.x BETWEEN q.x AND r.x
              AND p.y BETWEEN LEAST(q.y, r.y) AND GREATEST(q.y, r.y)
        ),
        tri AS (  -- p strictly inside a nondegenerate triangle qrs
            SELECT DISTINCT p.x AS px
            FROM d p, d q, d r, d s
            WHERE q.x < r.x AND r.x < s.x
              AND p.x NOT IN (q.x, r.x, s.x)
              AND SIGN(CAST(r.x - q.x AS HUGEINT) * (p.y - q.y)
                       - CAST(r.y - q.y AS HUGEINT) * (p.x - q.x))
                = SIGN(CAST(s.x - r.x AS HUGEINT) * (p.y - r.y)
                       - CAST(s.y - r.y AS HUGEINT) * (p.x - r.x))
              AND SIGN(CAST(s.x - r.x AS HUGEINT) * (p.y - r.y)
                       - CAST(s.y - r.y AS HUGEINT) * (p.x - r.x))
                = SIGN(CAST(q.x - s.x AS HUGEINT) * (p.y - s.y)
                       - CAST(q.y - s.y AS HUGEINT) * (p.x - s.x))
              AND SIGN(CAST(r.x - q.x AS HUGEINT) * (p.y - q.y)
                       - CAST(r.y - q.y AS HUGEINT) * (p.x - q.x)) <> 0
        )
        SELECT CAST(x AS BIGINT) AS day, CAST(y AS BIGINT) AS sum_cents
        FROM d
        WHERE x NOT IN (SELECT px FROM seg)
          AND x NOT IN (SELECT px FROM tri)
        ORDER BY day
    """


def user_value_inversions(sf_dir: str) -> pd.DataFrame:
    """Inversion count of each user's value stream: pairs of events
    (earlier, later) where the earlier value strictly exceeds the
    later — the sortedness measure that flags declining engagement —
    plus the tie-pair count so the concordant remainder is derivable.
    The SQL twin counts the same pairs with an O(n^2) positional
    self-join; the engine uses a vectorized upper-triangle comparison
    per group (groups are entity-sized; the merge-sort/BIT refinement
    is the documented path for pathological single-entity skew).

    Distributed plan: user-keyed groupby, vectorized per group."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        c = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        n = len(c)
        later = c[None, :] < c[:, None]
        ties = c[None, :] == c[:, None]
        iu = np.triu_indices(n, 1)
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "n": [n],
                "inversions": [int(later[iu].sum())],
                "tie_pairs": [int(ties[iu].sum())],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def user_value_inversions_sql() -> str:
    return """
        WITH s AS (
            SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS i
            FROM events
        )
        ,
        m AS (SELECT user_id, COUNT(*) AS n FROM s GROUP BY 1),
        p AS (
            SELECT a.user_id,
                   SUM(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS inv,
                   SUM(CASE WHEN a.c = b.c THEN 1 ELSE 0 END) AS tie
            FROM s a JOIN s b ON b.user_id = a.user_id AND b.i > a.i
            GROUP BY a.user_id
        )
        SELECT m.user_id, CAST(m.n AS BIGINT) AS n,
               CAST(COALESCE(p.inv, 0) AS BIGINT) AS inversions,
               CAST(COALESCE(p.tie, 0) AS BIGINT) AS tie_pairs
        FROM m LEFT JOIN p USING (user_id) ORDER BY m.user_id
    """


def huffman_total_bits(sf_dir: str) -> pd.DataFrame:
    """Minimum total encoded size (bits) of the event-type stream
    under ANY integer-length prefix code — the Huffman optimum.  The
    engine runs the classical two-smallest-merge heap (total cost =
    sum of all merge weights, deterministic regardless of tie order
    because the COST is unique even when the tree is not); the SQL
    twin proves optimality independently by enumerating every length
    vector l in {1..k-1}^k, keeping those satisfying Kraft-McMillan
    (sum 2^(k-1-l) <= 2^(k-1), integer form), and minimizing
    sum(c*l) — a certificate the heap cannot fake.

    Distributed plan: one type-keyed Count; the heap is
    catalog-sized."""
    import heapq

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    h = (
        ds.groupby("event_type").aggregate(Count(alias_name="c")).to_pandas()
    )
    heap = sorted(int(c) for c in h["c"])
    heapq.heapify(heap)
    total = 0
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        total += a + b
        heapq.heappush(heap, a + b)
    return pd.DataFrame(
        {
            "n_symbols": [len(h)],
            "n_events": [int(h["c"].sum())],
            "total_bits": [total],
        }
    ).astype("int64")


def huffman_total_bits_sql() -> str:
    # k symbols -> max useful depth k-1; Kraft in integer form scaled
    # by 2^(k-1).  The fixture has 5 types so the enumeration is 4^5.
    return """
        WITH h AS (
            SELECT event_type, COUNT(*) AS c,
                   ROW_NUMBER() OVER (ORDER BY event_type) AS i
            FROM events GROUP BY 1
        ),
        k AS (SELECT COUNT(*) AS k FROM h),
        ls AS (SELECT UNNEST(generate_series(1, (SELECT k - 1 FROM k))) AS l),
        combos AS (
            SELECT l1.l AS a, l2.l AS b, l3.l AS c, l4.l AS d, l5.l AS e
            FROM ls l1, ls l2, ls l3, ls l4, ls l5
            WHERE (CAST(1 AS BIGINT) << (4 - l1.l))
                + (CAST(1 AS BIGINT) << (4 - l2.l))
                + (CAST(1 AS BIGINT) << (4 - l3.l))
                + (CAST(1 AS BIGINT) << (4 - l4.l))
                + (CAST(1 AS BIGINT) << (4 - l5.l)) <= 16
        ),
        cost AS (
            SELECT combos.a * (SELECT c FROM h WHERE i = 1)
                 + combos.b * (SELECT c FROM h WHERE i = 2)
                 + combos.c * (SELECT c FROM h WHERE i = 3)
                 + combos.d * (SELECT c FROM h WHERE i = 4)
                 + combos.e * (SELECT c FROM h WHERE i = 5) AS bits
            FROM combos
        )
        SELECT CAST((SELECT k FROM k) AS BIGINT) AS n_symbols,
               CAST((SELECT SUM(c) FROM h) AS BIGINT) AS n_events,
               CAST((SELECT MIN(bits) FROM cost) AS BIGINT) AS total_bits
    """


_VITERBI_EMIT = {
    # state 0 "browse" / state 1 "transact" integer emission scores
    "view": (2, -1),
    "click": (2, -1),
    "purchase": (-1, 3),
    "signup": (-1, 2),
    "error": (-2, -2),
}


def user_viterbi_score(sf_dir: str) -> pd.DataFrame:
    """Viterbi decoding score of a fixed 2-state integer-scored HMM
    (browse/transact) over each user's event-type sequence: start
    scores (0, -5), stay-transition 0 / switch -3, emissions from
    _VITERBI_EMIT — all integers, so the max-score recursion is exact
    in both engines.  Reports the best final score and the winning
    final state (ties -> state 0).  The SQL twin carries the 2-state
    DP through a recursive CTE over all users simultaneously.

    Distributed plan: user-keyed groupby, linear DP per group —
    the model-scoring shape (batched inference) on entity streams."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        s0, s1 = 0, -5
        for t in df["event_type"]:
            e0, e1 = _VITERBI_EMIT[t]
            s0, s1 = max(s0, s1 - 3) + e0, max(s0 - 3, s1) + e1
        return pd.DataFrame(
            {
                "user_id": [int(df["user_id"].iloc[0])],
                "seq_len": [len(df)],
                "best_score": [max(s0, s1)],
                "best_state": [0 if s0 >= s1 else 1],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def user_viterbi_score_sql() -> str:
    e0 = " ".join(
        f"WHEN '{t}' THEN {v[0]}" for t, v in sorted(_VITERBI_EMIT.items())
    )
    e1 = " ".join(
        f"WHEN '{t}' THEN {v[1]}" for t, v in sorted(_VITERBI_EMIT.items())
    )
    return f"""
        WITH RECURSIVE s AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS i
            FROM events
        ),
        lens AS (SELECT user_id, COUNT(*) AS n FROM s GROUP BY 1),
        dp AS (
            SELECT user_id, 0 AS i, 0 AS s0, -5 AS s1 FROM lens
            UNION ALL
            SELECT dp.user_id, dp.i + 1,
                   GREATEST(dp.s0, dp.s1 - 3)
                       + CASE s.event_type {e0} END,
                   GREATEST(dp.s0 - 3, dp.s1)
                       + CASE s.event_type {e1} END
            FROM dp JOIN s ON s.user_id = dp.user_id AND s.i = dp.i + 1
        )
        SELECT dp.user_id, CAST(lens.n AS BIGINT) AS seq_len,
               CAST(GREATEST(dp.s0, dp.s1) AS BIGINT) AS best_score,
               CAST(CASE WHEN dp.s0 >= dp.s1 THEN 0 ELSE 1 END AS BIGINT)
                   AS best_state
        FROM dp JOIN lens ON lens.user_id = dp.user_id AND dp.i = lens.n
        ORDER BY dp.user_id
    """


def daily_hist_max_rectangle(sf_dir: str) -> pd.DataFrame:
    """Largest rectangle under the daily-event-count histogram (the
    classic stack problem): the widest run of consecutive days whose
    minimum daily volume, times the width, is maximal — the
    capacity-floor window a batch scheduler wants.  The engine finds
    the max area with the O(n) monotonic-stack algorithm, then
    canonicalizes the reported window (smallest left day, then
    smallest width) with a spine-sized scan; the SQL twin enumerates
    every (left, right) window with a MIN-over-window.

    Distributed plan: one day-keyed Count to the spine; stack runs on
    the driver over spine-sized input."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table({"day": pa.array(days)})

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    d0, d1 = int(daily["day"].iloc[0]), int(daily["day"].iloc[-1])
    h = np.zeros(d1 - d0 + 1, np.int64)
    h[daily["day"].to_numpy(np.int64) - d0] = daily["c"].to_numpy(np.int64)
    # monotonic stack for the max area
    stack, best = [], 0
    hh = np.append(h, 0)
    for i, v in enumerate(hh):
        start = i
        while stack and stack[-1][1] > v:
            s, sh = stack.pop()
            best = max(best, int(sh) * (i - s))
            start = s
        stack.append((start, v))
    # canonical attaining window via sliding minima (spine-sized)
    n = len(h)
    left = width = height = -1
    done = False
    for li in range(n):
        mn = h[li]
        for ri in range(li, n):
            mn = min(mn, h[ri])
            if int(mn) * (ri - li + 1) == best:
                left, width, height = li, ri - li + 1, int(mn)
                done = True
                break
        if done:
            break
    return pd.DataFrame(
        {
            "max_area": [best],
            "left_day": [d0 + left],
            "width": [width],
            "min_height": [height],
        }
    ).astype("int64")


def daily_hist_max_rectangle_sql() -> str:
    return """
        WITH d AS (
            SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
            FROM events GROUP BY 1
        ),
        spine AS (
            SELECT UNNEST(generate_series(
                (SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d))) AS day
        ),
        hval AS (
            SELECT spine.day, COALESCE(d.c, 0) AS c
            FROM spine LEFT JOIN d USING (day)
        ),
        win AS (
            SELECT a.day AS l, b.day AS r,
                   (SELECT MIN(x.c) FROM hval x
                    WHERE x.day BETWEEN a.day AND b.day) AS mn
            FROM hval a JOIN hval b ON b.day >= a.day
        ),
        scored AS (
            SELECT l, r - l + 1 AS w, mn, mn * (r - l + 1) AS area FROM win
        )
        SELECT CAST(area AS BIGINT) AS max_area,
               CAST(l AS BIGINT) AS left_day,
               CAST(w AS BIGINT) AS width,
               CAST(mn AS BIGINT) AS min_height
        FROM scored
        ORDER BY area DESC, l, w LIMIT 1
    """


def best_rational_rate(sf_dir: str, max_den: int = 50) -> pd.DataFrame:
    """Best rational approximation a/b (b <= 50) of the global purchase
    rate P/N — the compact human-readable ratio ("about 1 in 5") that
    dashboards quote, chosen EXACTLY: |a/b - P/N| minimized with ties
    to the smaller denominator then smaller numerator, every comparison
    done by integer cross-multiplication (|aN - bP| * b' vs
    |a'N - b'P| * b).  The engine scans denominators with the rounding
    candidates floor/ceil(Pb/N); the SQL twin certifies the winner by a
    NOT EXISTS over all ~2.5k candidate fractions.

    Distributed plan: one filtered Count pair; finalize is O(max_den)."""
    from fractions import Fraction

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])

    def flags(t: pa.Table) -> pa.Table:
        return pa.table(
            {"isp": pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())}
        )

    g = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("isp", alias_name="p"), Count(alias_name="n"))
        .to_pandas()
    )
    P, N = int(g["p"].iloc[0]), int(g["n"].iloc[0])
    best = None  # (err Fraction, b, a)
    for b in range(1, max_den + 1):
        for a in {P * b // N, -(-P * b // N)}:
            if 0 <= a <= b:
                cand = (abs(Fraction(a, b) - Fraction(P, N)), b, a)
                if best is None or cand < best:
                    best = cand
    return pd.DataFrame(
        {"p_num": [P], "n_total": [N], "best_a": [best[2]], "best_b": [best[1]]}
    ).astype("int64")


def best_rational_rate_sql(max_den: int = 50) -> str:
    return f"""
        WITH n AS (
            SELECT COUNT(*) FILTER (WHERE event_type = 'purchase') AS p,
                   COUNT(*) AS t
            FROM events
        ),
        bs AS (SELECT UNNEST(generate_series(1, {max_den})) AS b),
        fr AS (SELECT b, UNNEST(generate_series(0, b)) AS a FROM bs),
        sc AS (
            SELECT a, b,
                   ABS(CAST(a AS HUGEINT) * n.t - CAST(b AS HUGEINT) * n.p)
                       AS err
            FROM fr, n
        )
        SELECT CAST(n.p AS BIGINT) AS p_num, CAST(n.t AS BIGINT) AS n_total,
               CAST(sc.a AS BIGINT) AS best_a, CAST(sc.b AS BIGINT) AS best_b
        FROM sc, n
        WHERE NOT EXISTS (
            SELECT 1 FROM sc g
            WHERE g.err * sc.b < sc.err * g.b
               OR (g.err * sc.b = sc.err * g.b
                   AND (g.b < sc.b OR (g.b = sc.b AND g.a < sc.a)))
        )
    """


def orders_balanced_partition(sf_dir: str, k: int = 16) -> pd.DataFrame:
    """Minimum-imbalance two-way split of the k=16 largest order
    totals (the balanced-partition problem a cost allocator faces):
    min over subsets S of |total - 2*sum(S)|, exact cents.  The engine
    runs meet-in-the-middle — 2^(k/2) subset sums per half, sort one
    side, two-candidate binary search per left sum, O(2^(k/2) log) —
    while the SQL twin enumerates all 2^16 bitmasks with a bit-test
    join, so the engine's exponential shortcut is independently
    certified.

    Distributed plan: the top-k fold is distributed; MITM is a
    driver-side finalize whose cost is O(2^(k/2)), the only reason
    k=100 item instances stay tractable at all."""
    import bisect

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["o_orderkey"], "c": _cents(t["o_totalprice"])})

    df = (
        ds.map_batches(prep, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["c", "k"], ascending=[False, True])
        .head(k)
    )
    vals = [int(v) for v in df["c"]]
    total = sum(vals)
    half1, half2 = vals[: k // 2], vals[k // 2:]

    def subset_sums(items):
        sums = [0]
        for v in items:
            sums += [s + v for s in sums]
        return sums

    left = subset_sums(half1)
    right = sorted(subset_sums(half2))
    best = total
    for ls in left:
        target = (total - 2 * ls) / 2.0
        i = bisect.bisect_left(right, target)
        for j in (i - 1, i):
            if 0 <= j < len(right):
                best = min(best, abs(total - 2 * (ls + right[j])))
    return pd.DataFrame(
        {"n_items": [len(vals)], "total_cents": [total], "min_imbalance": [best]}
    ).astype("int64")


def orders_balanced_partition_sql(k: int = 16) -> str:
    return f"""
        WITH t AS (
            SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND(o_totalprice * 100) DESC, o_orderkey)
                       - 1 AS i
            FROM orders
            QUALIFY i < {k}
        ),
        tot AS (SELECT SUM(c) AS total, COUNT(*) AS n FROM t),
        masks AS (SELECT UNNEST(generate_series(0, {2**k - 1})) AS m),
        sums AS (
            SELECT masks.m, COALESCE(SUM(t.c), 0) AS s
            FROM masks LEFT JOIN t ON ((masks.m >> t.i) & 1) = 1
            GROUP BY masks.m
        )
        SELECT CAST(tot.n AS BIGINT) AS n_items,
               CAST(tot.total AS BIGINT) AS total_cents,
               CAST(MIN(ABS(tot.total - 2 * sums.s)) AS BIGINT)
                   AS min_imbalance
        FROM sums, tot GROUP BY tot.n, tot.total
    """


def user_trailing_distinct_types(sf_dir: str) -> pd.DataFrame:
    """Distinct event types each user emitted in the trailing 24 hours
    of every event (window (ts-24h, ts] by TIMESTAMP, so same-ts peers
    count regardless of id order) — the streaming feature an online
    enrichment stage attaches to each event.  The engine keeps a
    two-pointer multiset per user (O(n) per group after one sort); the
    SQL twin re-counts every window with a correlated
    COUNT(DISTINCT).

    Distributed plan: user-keyed groupby; per-group state is the
    O(|types|) count vector — the streaming-sessionize shape."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        types = df["event_type"].tolist()
        n = len(df)
        out = np.zeros(n, np.int64)
        counts: dict = {}
        lo = 0
        i = 0
        day_us = 86_400_000_000
        while i < n:
            j = i
            while j < n and us[j] == us[i]:
                counts[types[j]] = counts.get(types[j], 0) + 1
                j += 1
            while us[lo] <= us[i] - day_us:
                counts[types[lo]] -= 1
                if counts[types[lo]] == 0:
                    del counts[types[lo]]
                lo += 1
            out[i:j] = len(counts)
            i = j
        return pd.DataFrame(
            {"event_id": df["event_id"].astype("int64"), "n_distinct_24h": out}
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def user_trailing_distinct_types_sql() -> str:
    return """
        SELECT e.event_id,
               (SELECT COUNT(DISTINCT x.event_type) FROM events x
                WHERE x.user_id = e.user_id
                  AND x.ts <= e.ts
                  AND x.ts > e.ts - INTERVAL 24 HOUR) AS n_distinct_24h
        FROM events e
        ORDER BY e.event_id
    """


def type_irv_winner(sf_dir: str) -> pd.DataFrame:
    """Instant-runoff (ranked-choice) winner over per-user ballots:
    each user ranks the event types they emitted by (personal count
    DESC, type ASC); rounds tally first choices among non-eliminated
    types, declare a strict-majority winner, otherwise eliminate the
    lowest tally (ties -> alphabetically smallest) and redistribute —
    the preference-aggregation operator a labeling pipeline uses to
    pick a consensus class from ranked annotator votes.  The engine
    loops rounds over the ballot table; the SQL twin unrolls the <= 5
    fixture rounds as static CTE stages (the engine stays general-k).

    Distributed plan: ballots come from one (user,type)-keyed Count;
    each round is a first-choice groupby over the ballot Dataset —
    at most |types| shuffles of entity-sized rows."""
    from collections import Counter

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    prefs = (
        ds.groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    ballots = [
        g.sort_values(["c", "event_type"], ascending=[False, True])["event_type"].tolist()
        for _, g in prefs.groupby("user_id")
    ]
    elim: set = set()
    rnd = 0
    while True:
        rnd += 1
        firsts = [next((t for t in b if t not in elim), None) for b in ballots]
        firsts = [f for f in firsts if f]
        cnt = Counter(firsts)
        top, topc = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if topc * 2 > len(firsts):
            return pd.DataFrame({"winner": [top], "n_rounds": [rnd]}).astype(
                {"n_rounds": "int64"}
            )
        elim.add(sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]))[0][0])


def type_irv_winner_sql(max_rounds: int = 5) -> str:
    def round_cte(k: int) -> str:
        elim = ""
        if k > 1:
            union = " UNION ALL ".join(f"SELECT ty FROM l{j}" for j in range(1, k))
            elim = f"WHERE e.ty NOT IN ({union})"
        return f"""
        f{k} AS (
            SELECT e.user_id, e.ty,
                   ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.i) AS rn
            FROM exploded e {elim}
        ),
        r{k} AS (SELECT ty, COUNT(*) AS c FROM f{k} WHERE rn = 1 GROUP BY ty),
        w{k} AS (SELECT ty FROM r{k}
                 WHERE c * 2 > (SELECT SUM(c) FROM r{k})
                 ORDER BY c DESC, ty LIMIT 1),
        l{k} AS (SELECT ty FROM r{k} ORDER BY c ASC, ty ASC LIMIT 1)"""

    ctes = ",".join(round_cte(k) for k in range(1, max_rounds + 1))
    coalesce = ", ".join(f"(SELECT ty FROM w{k})" for k in range(1, max_rounds + 1))
    when = " ".join(
        f"WHEN EXISTS (SELECT 1 FROM w{k}) THEN {k}" for k in range(1, max_rounds)
    )
    return f"""
        WITH prefs AS (
            SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
        ),
        ballots AS (
            SELECT user_id, list(event_type ORDER BY c DESC, event_type) AS ballot
            FROM prefs GROUP BY user_id
        ),
        exploded AS (
            SELECT user_id, UNNEST(ballot) AS ty,
                   UNNEST(generate_series(1, len(ballot))) AS i
            FROM ballots
        ),{ctes}
        SELECT COALESCE({coalesce}) AS winner,
               CAST(CASE {when} ELSE {max_rounds} END AS BIGINT) AS n_rounds
    """


def compaction_ffd_plan(sf_dir: str) -> pd.DataFrame:
    """First-fit-decreasing compaction plan for the day-partitioned
    event files: items are per-day byte sizes (rows x 100), bin
    capacity is twice the largest file, and FFD (sort by size DESC,
    day ASC; place each into the first bin with room) yields the bin
    count a compactor would schedule — the classic 11/9-OPT+6/9
    guarantee makes the count a planning bound, and determinism makes
    it hashable.  The SQL twin replays the identical greedy as a
    recursive CTE carrying the bins' remaining capacities as a LIST.

    Distributed plan: one day-keyed Count; the greedy is a spine-sized
    driver finalize (bins state is O(n_bins))."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        import numpy as np

        days = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table({"day": pa.array(days)})

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    daily["sz"] = daily["n"].astype(int) * 100
    items = daily.sort_values(["sz", "day"], ascending=[False, True])["sz"].tolist()
    cap = 2 * max(items)
    bins: list = []
    for sz in items:
        for i, rem in enumerate(bins):
            if rem >= sz:
                bins[i] = rem - sz
                break
        else:
            bins.append(cap - sz)
    return pd.DataFrame(
        {
            "n_files": [len(items)],
            "total_bytes": [sum(items)],
            "cap_bytes": [cap],
            "n_bins": [len(bins)],
            "min_slack": [min(bins)],
        }
    ).astype("int64")


def compaction_ffd_plan_sql() -> str:
    return """
        WITH RECURSIVE d AS (
            SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) * 100 AS sz
            FROM events GROUP BY 1
        ),
        cap AS (SELECT 2 * MAX(sz) AS cap FROM d),
        items AS (
            SELECT sz, ROW_NUMBER() OVER (ORDER BY sz DESC, day ASC) AS i FROM d
        ),
        pack AS (
            SELECT 0 AS i, CAST([] AS BIGINT[]) AS bins
            UNION ALL
            SELECT p.i + 1,
                CASE WHEN COALESCE(list_min(list_transform(
                         generate_series(1, len(p.bins)),
                         x -> CASE WHEN p.bins[x] >= it.sz
                                   THEN x ELSE 100000 END)), 100000) = 100000
                     THEN list_append(p.bins, (SELECT cap FROM cap) - it.sz)
                     ELSE list_transform(generate_series(1, len(p.bins)), x ->
                          CASE WHEN x = list_min(list_transform(
                                   generate_series(1, len(p.bins)),
                                   y -> CASE WHEN p.bins[y] >= it.sz
                                             THEN y ELSE 100000 END))
                               THEN p.bins[x] - it.sz ELSE p.bins[x] END)
                END
            FROM pack p JOIN items it ON it.i = p.i + 1
        )
        SELECT CAST((SELECT COUNT(*) FROM items) AS BIGINT) AS n_files,
               CAST((SELECT SUM(sz) FROM d) AS BIGINT) AS total_bytes,
               CAST((SELECT cap FROM cap) AS BIGINT) AS cap_bytes,
               CAST(len(bins) AS BIGINT) AS n_bins,
               CAST(list_min(bins) AS BIGINT) AS min_slack
        FROM pack WHERE i = (SELECT COUNT(*) FROM items)
    """


def part_prefix_trie_stats(sf_dir: str) -> pd.DataFrame:
    """Size of the prefix trie over distinct part names — the node
    count an autocomplete index would allocate — computed WITHOUT
    building a trie: over the sorted distinct names, trie nodes =
    sum(len(name_i)) - sum(LCP(name_i, name_{i-1})), the classic
    sort+LCP identity.  The SQL twin counts DISTINCT substr(name,1,k)
    directly, an enumeration the identity must reproduce exactly.

    Distributed plan: distinct-fold then a sorted spine scan; at scale
    the LCP sum distributes per sorted partition with boundary names
    exchanged once (documented; fixture runs on the driver)."""
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
    names = sorted(set(ds.to_pandas()["p_name"].tolist()))

    def lcp(a: str, b: str) -> int:
        n = min(len(a), len(b))
        for i in range(n):
            if a[i] != b[i]:
                return i
        return n

    total = sum(len(n) for n in names)
    lcps = sum(lcp(a, b) for a, b in zip(names, names[1:]))
    return pd.DataFrame(
        {
            "n_parts": [len(names)],
            "trie_nodes": [total - lcps],
            "max_name_len": [max(len(n) for n in names)],
        }
    ).astype("int64")


def part_prefix_trie_stats_sql() -> str:
    return """
        WITH names AS (SELECT DISTINCT p_name FROM part),
        pref AS (
            SELECT substr(p_name, 1, CAST(k AS INTEGER)) AS pre
            FROM names,
                 LATERAL (SELECT UNNEST(generate_series(1, len(p_name))) AS k)
        )
        SELECT CAST((SELECT COUNT(*) FROM names) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT pre) AS BIGINT) AS trie_nodes,
               CAST((SELECT MAX(len(p_name)) FROM names) AS BIGINT)
                   AS max_name_len
        FROM pref
    """


def events_pr_curve(sf_dir: str, pos_type: str = "purchase", bin_width: int = 10) -> pd.DataFrame:
    """Integer-exact precision/recall curve for the score-threshold
    classifier "predict `pos_type` when value >= threshold": scores
    are bucketed into `bin_width`-unit bins, and for every occupied
    bin t (used as the cut) we report the confusion counts tp/fp/fn
    plus F1 as the exact integer fraction (f1_num=2*tp,
    f1_den=2*tp+fp+fn) — the threshold-sweep evaluation a
    quality-filter tuning pass runs before freezing a cutoff.  All
    outputs are BIGINT sufficient statistics so the hash is
    float-order-independent.

    Distributed plan: per-batch (bin, pos/neg) histogram combine
    inside map_batches, then one bin-sized groupby sum; the reverse
    cumulative sweep runs on the O(bins) spine on the driver."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        import numpy as np

        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / bin_width).astype(np.int64)
        p = (pc.equal(t["event_type"], pos_type)).to_numpy(zero_copy_only=False)
        keys = b * 2 + p.astype(np.int64)
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(uk // 2, pa.int64()),
                "pos": pa.array(uk % 2, pa.int64()),
                "c": pa.array(cnt.astype("int64")),
            }
        )

    agg = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["bin", "pos"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    import numpy as np

    piv = agg.pivot_table(index="bin", columns="pos", values="c", fill_value=0)
    bins = piv.index.to_numpy()
    a = piv[1].to_numpy(dtype=np.int64) if 1 in piv.columns else np.zeros(len(piv), np.int64)
    b = piv[0].to_numpy(dtype=np.int64) if 0 in piv.columns else np.zeros(len(piv), np.int64)
    # predict positive when bin >= t: reverse cumulative sums
    tp = a[::-1].cumsum()[::-1]
    fp = b[::-1].cumsum()[::-1]
    fn = int(a.sum()) - tp
    return pd.DataFrame(
        {
            "thr_bin": bins.astype("int64"),
            "tp": tp,
            "fp": fp,
            "fn": fn,
            "f1_num": 2 * tp,
            "f1_den": 2 * tp + fp + fn,
        }
    ).reset_index(drop=True)


def events_pr_curve_sql(pos_type: str = "purchase", bin_width: int = 10) -> str:
    return f"""
        WITH binned AS (
            SELECT CAST(FLOOR(value / {bin_width}) AS BIGINT) AS bin,
                   CASE WHEN event_type = '{pos_type}' THEN 1 ELSE 0 END AS pos
            FROM events
        ),
        agg AS (
            SELECT bin, SUM(pos) AS a, SUM(1 - pos) AS b
            FROM binned GROUP BY bin
        )
        SELECT bin AS thr_bin,
               CAST(SUM(a) OVER w AS BIGINT) AS tp,
               CAST(SUM(b) OVER w AS BIGINT) AS fp,
               CAST((SELECT SUM(a) FROM agg) - SUM(a) OVER w AS BIGINT) AS fn,
               CAST(2 * SUM(a) OVER w AS BIGINT) AS f1_num,
               CAST(2 * SUM(a) OVER w + SUM(b) OVER w
                    + (SELECT SUM(a) FROM agg) - SUM(a) OVER w AS BIGINT) AS f1_den
        FROM agg
        WINDOW w AS (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
        ORDER BY thr_bin
    """


def type_wilson_bounds(sf_dir: str, threshold: float = 50.0, z: float = 1.96) -> pd.DataFrame:
    """Per-event-type Wilson 95% lower confidence bound on
    P(value > threshold) — the uncertainty-aware ranking statistic
    used to order segments by success rate without letting tiny-n
    groups win on a lucky streak.  n and s are exact BIGINTs; the
    bound is a double computed with the SAME operation order as the
    SQL twin so the doubles are bit-identical.

    Distributed plan: one event_type groupby with per-batch Sum
    pre-aggregation; the Wilson finalize touches O(types) rows."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def flag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "s": pc.cast(pc.greater(t["value"], threshold), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(flag, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("s", alias_name="s"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    n = agg["n"].to_numpy(dtype=np.float64)
    s = agg["s"].to_numpy(dtype=np.float64)
    p = s / n
    zz = z * z
    lb = (p + zz / (2.0 * n) - z * np.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n))) / (
        1.0 + zz / n
    )
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n": agg["n"].astype("int64"),
            "s": agg["s"].astype("int64"),
            "wilson_lb": lb,
        }
    )


def type_wilson_bounds_sql(threshold: float = 50.0, z: float = 1.96) -> str:
    return f"""
        WITH agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN value > {threshold} THEN 1 ELSE 0 END)
                        AS BIGINT) AS s
            FROM events GROUP BY event_type
        ),
        p AS (
            SELECT event_type, n, s,
                   CAST(s AS DOUBLE) / n AS p,
                   CAST(n AS DOUBLE) AS nd
            FROM agg
        )
        SELECT event_type, n, s,
               (p + {z} * {z} / (2.0 * nd)
                  - {z} * SQRT(p * (1.0 - p) / nd
                               + {z} * {z} / (4.0 * nd * nd)))
               / (1.0 + {z} * {z} / nd) AS wilson_lb
        FROM p
        ORDER BY event_type
    """


def events_welch_ttest(
    sf_dir: str, type_a: str = "purchase", type_b: str = "click"
) -> pd.DataFrame:
    """Welch's unequal-variance t-test between the `value`
    distributions of two event types, computed from integer-cent
    sufficient statistics (sum and sum-of-squares of cents are exact
    BIGINTs, so the moments are float-order-independent) — the A/B
    significance primitive.  t and the Welch-Satterthwaite df are
    doubles derived with the identical op order as the SQL twin.

    Distributed plan: per-batch cent/cent^2 partial sums inside
    map_batches, one two-row groupby, O(1) driver finalize.  Scale
    note: sum(cents^2) at 10^12 rows needs int128 accumulation —
    shard the sum by key range before combining."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"], value_set=pa.array([type_a, type_b]))
        t = t.filter(mask)
        c = _cents(t["value"])
        return pa.table(
            {
                "event_type": t["event_type"],
                "c": c,
                "c2": pc.multiply(c, c),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("c", alias_name="sc"), Sum("c2", alias_name="sc2"))
        .to_pandas()
        .set_index("event_type")
    )

    def moments(ty: str):
        n = float(agg.loc[ty, "n"])
        sc = float(agg.loc[ty, "sc"])
        sc2 = float(agg.loc[ty, "sc2"])
        m = sc / n
        v = (sc2 - sc * sc / n) / (n - 1.0)
        return n, m, v

    na, ma, va = moments(type_a)
    nb, mb, vb = moments(type_b)
    se2 = va / na + vb / nb
    t_stat = (ma - mb) / np.sqrt(se2)
    df = se2 * se2 / ((va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0))
    return pd.DataFrame(
        {
            "n_a": pd.Series([int(agg.loc[type_a, "n"])], dtype="int64"),
            "n_b": pd.Series([int(agg.loc[type_b, "n"])], dtype="int64"),
            "t_stat": [float(t_stat)],
            "welch_df": [float(df)],
        }
    )


def events_welch_ttest_sql(type_a: str = "purchase", type_b: str = "click") -> str:
    def mom(ty: str, suf: str) -> str:
        return f"""
        {suf} AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sc,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)
                       * CAST(ROUND(value * 100) AS BIGINT)) AS sc2
            FROM events WHERE event_type = '{ty}'
        ),
        m{suf} AS (
            SELECT n,
                   CAST(sc AS DOUBLE) / n AS m,
                   (CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * sc / n)
                       / (n - 1.0) AS v,
                   CAST(n AS DOUBLE) AS nd
            FROM {suf}
        )"""

    return f"""
        WITH {mom(type_a, "a")}, {mom(type_b, "b")}
        SELECT a.n AS n_a, b.n AS n_b,
               (ma.m - mb.m) / SQRT(ma.v / ma.nd + mb.v / mb.nd) AS t_stat,
               (ma.v / ma.nd + mb.v / mb.nd) * (ma.v / ma.nd + mb.v / mb.nd)
               / ((ma.v / ma.nd) * (ma.v / ma.nd) / (ma.nd - 1.0)
                  + (mb.v / mb.nd) * (mb.v / mb.nd) / (mb.nd - 1.0)) AS welch_df
        FROM a, b, ma, mb
    """


def purchase_km_table(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier risk table for time-to-second-purchase: each user
    with at least one purchase contributes either an observed gap
    (whole days from first to second purchase) or a right-censored
    time (days from first purchase to the corpus's last event).  Rows
    are the distinct times with d (events), c (censorings) and
    n_at_risk (subjects whose time >= t) — the exact integer
    sufficient table from which S(t) = prod(1 - d/n) follows, i.e.
    the retention-curve operator of a cohort analysis.

    Distributed plan: per-user first/second purchase via one
    groupby(user_id) over purchase rows only (filter pushed into the
    read); the day-level counts are a second tiny groupby and the
    reverse-cumulative n_at_risk runs on the O(distinct days) spine."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"])
    ds = ds.filter(expr="event_type == 'purchase'")
    horizon = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"]).max("ts")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy())
        t1 = ts[0]
        if len(ts) >= 2:
            days = (ts[1] - t1) // np.timedelta64(86400000000, "us")
            return pd.DataFrame({"t": [int(days)], "observed": [1]})
        days = (np.datetime64(horizon, "us") - t1) // np.timedelta64(86400000000, "us")
        return pd.DataFrame({"t": [int(days)], "observed": [0]})

    times = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    agg = (
        times.groupby("t")
        .agg(d=("observed", "sum"), n=("observed", "count"))
        .sort_index(ascending=False)
    )
    n_at_risk = agg["n"].cumsum()
    out = pd.DataFrame(
        {
            "t": agg.index.to_numpy(dtype="int64"),
            "d": agg["d"].to_numpy(dtype="int64"),
            "c": (agg["n"] - agg["d"]).to_numpy(dtype="int64"),
            "n_at_risk": n_at_risk.to_numpy(dtype="int64"),
        }
    ).sort_values("t")
    return out.reset_index(drop=True)


def purchase_km_table_sql() -> str:
    return """
        WITH p AS (
            SELECT user_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
            FROM events WHERE event_type = 'purchase'
        ),
        horizon AS (SELECT MAX(ts) AS h FROM events),
        subj AS (
            SELECT p1.user_id,
                   CASE WHEN p2.ts IS NOT NULL
                        THEN CAST(FLOOR(epoch_us(p2.ts - p1.ts) / 86400000000)
                                  AS BIGINT)
                        ELSE CAST(FLOOR(epoch_us((SELECT h FROM horizon) - p1.ts)
                                        / 86400000000) AS BIGINT)
                   END AS t,
                   CASE WHEN p2.ts IS NOT NULL THEN 1 ELSE 0 END AS observed
            FROM (SELECT * FROM p WHERE rn = 1) p1
            LEFT JOIN (SELECT * FROM p WHERE rn = 2) p2 USING (user_id)
        ),
        agg AS (
            SELECT t, CAST(SUM(observed) AS BIGINT) AS d,
                   CAST(SUM(1 - observed) AS BIGINT) AS c,
                   COUNT(*) AS n
            FROM subj GROUP BY t
        )
        SELECT t, d, c,
               CAST(SUM(n) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at_risk
        FROM agg
        ORDER BY t
    """


def score_brier_calibration(sf_dir: str, pos_type: str = "purchase") -> pd.DataFrame:
    """Calibration/reliability audit treating value (capped at 100.00)
    as a probability forecast of `pos_type`: per forecast decile the
    exact integer counts (n, n_pos), the exact forecast mass
    sum_pc (cents), and the decile's Brier numerator
    sum((p_cents - 10000*y)^2) with the implied denominator n*10^8 —
    everything BIGINT so the reliability diagram and Brier score are
    float-order-independent.

    Distributed plan: one pass of per-batch arithmetic plus a
    10-group aggregate; nothing but decile partials cross the wire."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        import numpy as np

        pc_ = np.minimum(
            np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64),
            10000,
        )
        y = pc.equal(t["event_type"], pos_type).to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(pc_ // 1000, 9)
        dev = pc_ - 10000 * y
        return pa.table(
            {
                "bin": pa.array(b),
                "one": pa.array(np.ones(len(b), np.int64)),
                "pos": pa.array(y),
                "pc": pa.array(pc_),
                "sq": pa.array(dev * dev),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Sum("one", alias_name="n"),
            Sum("pos", alias_name="n_pos"),
            Sum("pc", alias_name="sum_pc"),
            Sum("sq", alias_name="brier_num"),
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    return out.astype({"bin": "int64", "n": "int64", "n_pos": "int64",
                       "sum_pc": "int64", "brier_num": "int64"})


def score_brier_calibration_sql(pos_type: str = "purchase") -> str:
    return f"""
        WITH prep AS (
            SELECT LEAST(CAST(ROUND(value * 100) AS BIGINT), 10000) AS pc,
                   CASE WHEN event_type = '{pos_type}' THEN 1 ELSE 0 END AS y
            FROM events
        )
        SELECT LEAST(pc // 1000, 9) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(pc) AS BIGINT) AS sum_pc,
               CAST(SUM((pc - 10000 * y) * (pc - 10000 * y)) AS BIGINT)
                   AS brier_num
        FROM prep
        GROUP BY 1
        ORDER BY bin
    """


def events_type_dow_independence(sf_dir: str) -> pd.DataFrame:
    """Chi-square independence sufficient statistics between
    event_type and day-of-week: the long-format contingency table
    with, per cell, the observed count o, the exact integer deviation
    numerator (n*o - r*c)^2 and its denominator r*c — chi2 =
    sum(dev_num / (den * n)) follows exactly, so the seasonality-vs-
    type audit is hashable without a single float.

    Distributed plan: per-batch (type, dow) histogram combine, one
    cell-sized groupby; marginals and products are a driver finalize
    over O(types x 7) cells."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        dow1 = pc.add(
            pc.cast(pc.day_of_week(t["ts"], count_from_zero=True, week_start=1), pa.int64()),
            1,
        )
        return pa.table(
            {
                "event_type": t["event_type"],
                "dow": pc.if_else(pc.equal(dow1, 7), pa.scalar(0, pa.int64()), dow1),
            }
        )

    cells = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Count(alias_name="o"))
        .to_pandas()
    )
    n = int(cells["o"].sum())
    r = cells.groupby("event_type")["o"].transform("sum").to_numpy(dtype=np.int64)
    c = cells.groupby("dow")["o"].transform("sum").to_numpy(dtype=np.int64)
    o = cells["o"].to_numpy(dtype=np.int64)
    dev = n * o - r * c
    out = pd.DataFrame(
        {
            "event_type": cells["event_type"],
            "dow": cells["dow"].astype("int64"),
            "o": o,
            "dev_num": dev * dev,
            "den": r * c,
        }
    )
    return out.sort_values(["event_type", "dow"]).reset_index(drop=True)


def events_type_dow_independence_sql() -> str:
    return """
        WITH cells AS (
            SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT SUM(o) AS n FROM cells)
        SELECT event_type, dow, o,
               CAST(((SELECT n FROM tot) * o
                     - SUM(o) OVER (PARTITION BY event_type)
                       * SUM(o) OVER (PARTITION BY dow))
                    * ((SELECT n FROM tot) * o
                       - SUM(o) OVER (PARTITION BY event_type)
                         * SUM(o) OVER (PARTITION BY dow)) AS BIGINT)
                   AS dev_num,
               CAST(SUM(o) OVER (PARTITION BY event_type)
                    * SUM(o) OVER (PARTITION BY dow) AS BIGINT) AS den
        FROM cells
        ORDER BY event_type, dow
    """


def _damerau_levenshtein(a: str, b: str) -> int:
    """True Damerau-Levenshtein (unrestricted, alphabet-table DP) —
    matches DuckDB's damerau_levenshtein ('CA'->'ABC' = 2, not OSA's
    3); pinned against the built-in on random strings in tests."""
    la, lb = len(a), len(b)
    maxd = la + lb
    da: dict = {}
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            ell = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][ell] + (i - k - 1) + 1 + (j - ell - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def part_word_canonical_match(sf_dir: str) -> pd.DataFrame:
    """Entity canonicalization by edit distance: every distinct word
    appearing in p_name is matched to its nearest canonical vocabulary
    entry (the distinct p_type values) under true Damerau-Levenshtein
    distance, ties broken by the alphabetically smaller canon — the
    noisy-token -> controlled-vocabulary mapping step of a catalog
    cleanup.  Distances are integers, so the result is exactly
    hashable against DuckDB's damerau_levenshtein built-in.

    Distributed plan: distinct words via one groupby over per-batch
    exploded tokens; the canonical list (O(10) strings) is broadcast
    via ray.put and the DP runs per word inside map_batches.  Scale
    path: length-bound pruning (|len(w)-len(c)| >= current best skips
    the DP) — applied here too."""
    import numpy as np

    canon = sorted(
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_type"])
        .unique("p_type")
    )
    cref = ray.put(canon)

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def explode(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["p_name"], " "))
        return pa.table({"word": words})

    words = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Count(alias_name="n_uses"))
    )

    def best(t: pa.Table) -> pa.Table:
        cl = ray.get(cref)
        ws = t["word"].to_pylist()
        outs, dists = [], []
        for w in ws:
            bd, bc = None, None
            for c in cl:
                if bd is not None and abs(len(w) - len(c)) >= bd:
                    continue
                dd = _damerau_levenshtein(w, c)
                if bd is None or dd < bd or (dd == bd and c < bc):
                    bd, bc = dd, c
            outs.append(bc)
            dists.append(bd)
        return pa.table(
            {
                "word": t["word"],
                "n_uses": t["n_uses"],
                "canon": pa.array(outs, pa.string()),
                "dl": pa.array(np.asarray(dists, dtype=np.int64)),
            }
        )

    out = words.map_batches(best, batch_format="pyarrow").to_pandas()
    out["n_uses"] = out["n_uses"].astype("int64")
    return out.sort_values("word").reset_index(drop=True)


def part_word_canonical_match_sql() -> str:
    return """
        WITH words AS (
            SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part
        ),
        agg AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS n_uses
            FROM words GROUP BY word
        ),
        canon AS (SELECT DISTINCT p_type AS c FROM part),
        scored AS (
            SELECT a.word, a.n_uses, c.c,
                   CAST(damerau_levenshtein(a.word, c.c) AS BIGINT) AS dl,
                   ROW_NUMBER() OVER (PARTITION BY a.word
                                      ORDER BY damerau_levenshtein(a.word, c.c),
                                               c.c) AS rn
            FROM agg a CROSS JOIN canon c
        )
        SELECT word, n_uses, c AS canon, dl
        FROM scored WHERE rn = 1
        ORDER BY word
    """


def custkey_luhn_audit(sf_dir: str) -> pd.DataFrame:
    """Checksum-integrity audit: treat each c_custkey zero-padded to
    10 digits as an account number; report per (is_valid, check_digit)
    the customer count, where is_valid is the Luhn validity of the
    10-digit number itself and check_digit is the Luhn digit that
    would terminate its first 9 digits — the ingestion-time
    identifier-validation primitive, exactly reproducible in SQL as
    unrolled digit arithmetic.

    Distributed plan: one vectorized numpy pass per batch, then a
    20-cell groupby sum."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def prep(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # digits of the zero-padded 10-digit number; i counts from the right
        total = np.zeros_like(k)
        payload = np.zeros_like(k)
        for i in range(10):
            d = (k // 10**i) % 10
            dd = np.where(i % 2 == 1, np.where(d * 2 > 9, d * 2 - 9, d * 2), d)
            total += dd
            if i >= 1:
                # Luhn sum of the 9-digit payload (digits 1..9 of the
                # 10-digit form), doubling from its rightmost digit
                pd_ = np.where((i - 1) % 2 == 0, np.where(d * 2 > 9, d * 2 - 9, d * 2), d)
                payload += pd_
        valid = (total % 10 == 0).astype(np.int64)
        check = (10 - payload % 10) % 10
        return pa.table(
            {
                "is_valid": pa.array(valid),
                "check_digit": pa.array(check),
                "one": pa.array(np.ones(len(k), np.int64)),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["is_valid", "check_digit"])
        .aggregate(Sum("one", alias_name="n"))
        .to_pandas()
        .sort_values(["is_valid", "check_digit"])
        .reset_index(drop=True)
    )
    return out.astype({"is_valid": "int64", "check_digit": "int64", "n": "int64"})


def custkey_luhn_audit_sql() -> str:
    def digit(i: int) -> str:
        return f"((c_custkey // {10**i}) % 10)"

    def luhn_term(i: int, doubled: bool) -> str:
        d = digit(i)
        if not doubled:
            return d
        return f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)"

    total = " + ".join(luhn_term(i, i % 2 == 1) for i in range(10))
    payload = " + ".join(luhn_term(i, (i - 1) % 2 == 0) for i in range(1, 10))
    return f"""
        WITH prep AS (
            SELECT CASE WHEN ({total}) % 10 = 0 THEN 1 ELSE 0 END AS is_valid,
                   (10 - ({payload}) % 10) % 10 AS check_digit
            FROM customer
        )
        SELECT CAST(is_valid AS BIGINT) AS is_valid,
               CAST(check_digit AS BIGINT) AS check_digit,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM prep GROUP BY 1, 2
        ORDER BY is_valid, check_digit
    """


def string_dictionary_audit(sf_dir: str) -> pd.DataFrame:
    """Columnar-layout planning audit: for each low-cardinality string
    column, the exact integer inputs to the dictionary-encoding
    decision — row count, distinct count, raw payload bytes
    (sum of byte lengths) and dictionary payload bytes (byte length
    summed over distinct values) — what a Parquet writer weighs when
    choosing PLAIN vs RLE_DICTIONARY per column chunk.

    Distributed plan: per-batch value-count combine inside
    map_batches, one value-keyed groupby per column (the shuffle
    carries one row per distinct value per block), driver finalize
    over O(distinct) rows."""
    cols = [
        ("events", "event_type"),
        ("orders", "o_orderpriority"),
        ("customer", "c_mktsegment"),
        ("documents", "lang"),
        ("documents", "source"),
        ("part", "p_brand"),
    ]
    rows = []
    for table, col in cols:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def vc(t: pa.Table, _col=col) -> pa.Table:
            counts = t[_col].combine_chunks().value_counts()
            return pa.table(
                {
                    "v": counts.field("values"),
                    "c": pc.cast(counts.field("counts"), pa.int64()),
                }
            )

        dist = (
            ds.map_batches(vc, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
        lens = dist["v"].str.encode("utf-8").str.len().astype("int64")
        rows.append(
            {
                "table_name": table,
                "column_name": col,
                "n_rows": int(dist["c"].sum()),
                "n_distinct": len(dist),
                "raw_bytes": int((lens * dist["c"]).sum()),
                "dict_bytes": int(lens.sum()),
            }
        )
    out = pd.DataFrame(rows).astype(
        {"n_rows": "int64", "n_distinct": "int64", "raw_bytes": "int64", "dict_bytes": "int64"}
    )
    return out.sort_values(["table_name", "column_name"]).reset_index(drop=True)


def string_dictionary_audit_sql() -> str:
    parts = []
    for table, col in [
        ("events", "event_type"),
        ("orders", "o_orderpriority"),
        ("customer", "c_mktsegment"),
        ("documents", "lang"),
        ("documents", "source"),
        ("part", "p_brand"),
    ]:
        parts.append(f"""
        SELECT '{table}' AS table_name, '{col}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(SUM(strlen({col})) AS BIGINT) AS raw_bytes,
               CAST((SELECT SUM(strlen(v))
                     FROM (SELECT DISTINCT {col} AS v FROM {table})) AS BIGINT)
                   AS dict_bytes
        FROM {table}""")
    u = " UNION ALL ".join(parts)
    return f"SELECT * FROM ({u}) ORDER BY table_name, column_name"


def orders_weighted_sample(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Deterministic weighted sampling without replacement (the A-ES /
    Efraimidis-Spirakis scheme): each order draws u from the first 52
    bits of md5(o_orderkey) (exactly representable in a double) and
    gets priority u^(1/w) with w = o_totalprice; the global top-k by
    priority is a weighted sample that is REPRODUCIBLE across runs,
    shards and cluster sizes — the property that matters when a 100-TB
    job resumes.  Both sides compute pow on IEEE doubles via libm, so
    the priorities are bit-identical (same precedent as
    bigram_lm_scores' ln).

    Distributed plan: per-batch local top-k inside map_batches, tiny
    driver merge — no shuffle, no sort of the full table."""
    import hashlib

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        import math

        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        w = t["o_totalprice"].to_numpy(zero_copy_only=False)
        # math.pow = libm pow = DuckDB's POW, bit-identical; numpy's
        # vectorized ** can differ by 1 ulp
        pr = np.array(
            [
                math.pow(
                    int(hashlib.md5(str(int(kk)).encode()).hexdigest()[:13], 16)
                    / float(2**52),
                    1.0 / ww,
                )
                for kk, ww in zip(keys, w)
            ],
            dtype=np.float64,
        )
        order = np.lexsort((keys, -pr))[:k]
        return pa.table(
            {
                "o_orderkey": pa.array(keys[order], pa.int64()),
                "priority": pa.array(pr[order], pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["priority", "o_orderkey"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def orders_weighted_sample_sql(k: int = 50) -> str:
    return f"""
        WITH pr AS (
            SELECT o_orderkey,
                   POW(CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13))
                            AS UBIGINT) AS DOUBLE) / 4503599627370496.0,
                       1.0 / o_totalprice) AS priority
            FROM orders
        )
        SELECT o_orderkey, priority
        FROM pr
        ORDER BY priority DESC, o_orderkey
        LIMIT {k}
    """


def daily_holt_linear(sf_dir: str) -> pd.DataFrame:
    """Holt's linear-trend double exponential smoothing (alpha = beta
    = 1/2) over the daily event-count series: l_t = (x_t + (l_{t-1} +
    b_{t-1})) / 2, b_t = ((l_t - l_{t-1}) + b_{t-1}) / 2, seeded
    l_0 = x_0, b_0 = 0 — the trend-aware forecast curve a capacity
    planner smooths ingest volume with.  The engine folds the
    recurrence with EXACTLY the SQL twin's operation order, so the
    float64 level/trend columns are bit-identical to the recursive-CTE
    oracle.

    Distributed plan: the corpus-sized work is one date-keyed count;
    the recurrence runs on the O(days) spine on the driver."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def day_of(t: pa.Table) -> pa.Table:
        d = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table({"day": pa.array(d)})

    daily = (
        ds.map_batches(day_of, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="x"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    x = daily["x"].to_numpy(dtype=np.float64)
    lvl = np.empty(len(x))
    trd = np.empty(len(x))
    lvl[0], trd[0] = x[0], 0.0
    for i in range(1, len(x)):
        lvl[i] = (x[i] + (lvl[i - 1] + trd[i - 1])) / 2.0
        trd[i] = ((lvl[i] - lvl[i - 1]) + trd[i - 1]) / 2.0
    return pd.DataFrame(
        {
            "day": daily["day"].astype("int64"),
            "x": daily["x"].astype("int64"),
            "level": lvl,
            "trend": trd,
        }
    )


def daily_holt_linear_sql() -> str:
    return """
        WITH RECURSIVE daily AS (
            SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        seq AS (
            SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
        ),
        holt AS (
            SELECT rn, day, x, CAST(x AS DOUBLE) AS level,
                   CAST(0.0 AS DOUBLE) AS trend
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.rn, s.day, s.x, n.nl,
                   ((n.nl - h.level) + h.trend) / 2.0
            FROM holt h JOIN seq s ON s.rn = h.rn + 1
            CROSS JOIN LATERAL (
                SELECT (CAST(s.x AS DOUBLE) + (h.level + h.trend)) / 2.0 AS nl
            ) n
        )
        SELECT day, x, level, trend FROM holt ORDER BY day
    """


def blocking_plan_audit(sf_dir: str) -> pd.DataFrame:
    """Entity-resolution blocking-key quality audit: ground-truth
    "duplicate" part pairs are those sharing (p_brand, p_type); three
    candidate blocking strategies (first p_name word; p_size; first
    word + p_size) are each scored by candidate_pairs (sum of C(n,2)
    over blocks — the comparisons a linkage job would actually run),
    covered_true_pairs (true pairs landing in the same block) and
    total_true_pairs — reduction ratio and pair completeness follow
    exactly from these BIGINTs.  The audit every record-linkage
    pipeline runs before committing to a blocking key.

    Distributed plan: per strategy one (block[, truth-key])-keyed
    count; pair counts are per-group combinatorics summed over
    O(blocks) rows."""
    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size"]
    )

    def prep(t: pa.Table) -> pa.Table:
        first_word = pc.list_element(pc.split_pattern(t["p_name"], " "), 0)
        return pa.table(
            {
                "w": first_word,
                "sz": pc.cast(t["p_size"], pa.int64()),
                "truth": pc.binary_join_element_wise(
                    t["p_brand"], t["p_type"], "\x1f"
                ),
            }
        )

    rows = ds.map_batches(prep, batch_format="pyarrow")

    def pairs(n: "pd.Series") -> "pd.Series":
        return n * (n - 1) // 2

    total_true = int(
        pairs(
            rows.groupby("truth").aggregate(Count(alias_name="n")).to_pandas()["n"]
        ).sum()
    )
    out = []
    strategies = {
        "first_word": ["w"],
        "size": ["sz"],
        "first_word+size": ["w", "sz"],
    }
    for name, keys in strategies.items():
        blocks = rows.groupby(keys).aggregate(Count(alias_name="n")).to_pandas()
        cand = int(pairs(blocks["n"]).sum())
        both = rows.groupby(keys + ["truth"]).aggregate(Count(alias_name="n")).to_pandas()
        covered = int(pairs(both["n"]).sum())
        out.append(
            {
                "strategy": name,
                "n_blocks": len(blocks),
                "candidate_pairs": cand,
                "covered_true_pairs": covered,
                "total_true_pairs": total_true,
            }
        )
    res = pd.DataFrame(out).astype(
        {
            "n_blocks": "int64",
            "candidate_pairs": "int64",
            "covered_true_pairs": "int64",
            "total_true_pairs": "int64",
        }
    )
    return res.sort_values("strategy").reset_index(drop=True)


def blocking_plan_audit_sql() -> str:
    parts = []
    for name, key in [
        ("first_word", "string_split(p_name, ' ')[1]"),
        ("size", "CAST(p_size AS VARCHAR)"),
        ("first_word+size", "string_split(p_name, ' ')[1] || ':' || p_size"),
    ]:
        parts.append(f"""
        SELECT '{name}' AS strategy,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM (SELECT {key} AS b FROM part GROUP BY 1)) AS n_blocks,
               (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT)
                FROM (SELECT COUNT(*) AS n FROM part GROUP BY {key}))
                   AS candidate_pairs,
               (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT)
                FROM (SELECT COUNT(*) AS n FROM part
                      GROUP BY {key}, p_brand, p_type)) AS covered_true_pairs,
               (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT)
                FROM (SELECT COUNT(*) AS n FROM part GROUP BY p_brand, p_type))
                   AS total_true_pairs""")
    u = " UNION ALL ".join(parts)
    return f"SELECT * FROM ({u}) ORDER BY strategy"


def event_props_json_audit(sf_dir: str) -> pd.DataFrame:
    """Semi-structured-column audit: parse the JSON `props` payload per
    event and aggregate per event_type the exact integer stats of the
    `k` field (present-count, sum, min, max) plus malformed/missing
    counts — the schema-discovery pass run before promoting a JSON
    blob column to typed columns.

    Distributed plan: JSON parse inside map_batches (pure per-row),
    one type-keyed groupby of integer partials."""
    import json

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def parse(t: pa.Table) -> pa.Table:
        types = t["event_type"].to_pylist()
        props = t["props"].to_pylist()
        has_k, k_val, bad = [], [], []
        for p in props:
            try:
                obj = json.loads(p) if p is not None else None
                if isinstance(obj, dict) and isinstance(obj.get("k"), int):
                    has_k.append(1)
                    k_val.append(obj["k"])
                    bad.append(0)
                else:
                    has_k.append(0)
                    k_val.append(0)
                    bad.append(0 if obj is not None else 1)
            except (ValueError, TypeError):
                has_k.append(0)
                k_val.append(0)
                bad.append(1)
        # min/max only over rows that have k: encode absent as extremes
        kv = np.asarray(k_val, np.int64)
        hk = np.asarray(has_k, np.int64)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "one": pa.array(np.ones(len(types), np.int64)),
                "has_k": pa.array(hk),
                "k_sum": pa.array(kv * hk),
                "k_min": pa.array(np.where(hk == 1, kv, 2**62)),
                "k_max": pa.array(np.where(hk == 1, kv, -(2**62))),
                "bad": pa.array(np.asarray(bad, np.int64)),
            }
        )

    out = (
        ds.map_batches(parse, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("one", alias_name="n"),
            Sum("has_k", alias_name="n_with_k"),
            Sum("k_sum", alias_name="k_sum"),
            Min("k_min", alias_name="k_min"),
            Max("k_max", alias_name="k_max"),
            Sum("bad", alias_name="n_malformed"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out.astype(
        {
            "n": "int64",
            "n_with_k": "int64",
            "k_sum": "int64",
            "k_min": "int64",
            "k_max": "int64",
            "n_malformed": "int64",
        }
    )


def event_props_json_audit_sql() -> str:
    return """
        WITH parsed AS (
            SELECT event_type,
                   CASE WHEN props IS NOT NULL AND json_valid(props)
                        THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                   END AS k,
                   CASE WHEN props IS NULL OR NOT json_valid(props)
                        THEN 1 ELSE 0 END AS bad
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_with_k,
               CAST(COALESCE(SUM(k), 0) AS BIGINT) AS k_sum,
               CAST(COALESCE(MIN(k), 4611686018427387904) AS BIGINT) AS k_min,
               CAST(COALESCE(MAX(k), -4611686018427387904) AS BIGINT) AS k_max,
               CAST(SUM(bad) AS BIGINT) AS n_malformed
        FROM parsed
        GROUP BY event_type
        ORDER BY event_type
    """


def price_quantile_normalize(sf_dir: str) -> pd.DataFrame:
    """Quantile normalization of p_retailprice within each brand onto
    the GLOBAL price distribution: a part ranked r (of n) inside its
    brand maps to the global order statistic at index
    (r-1)*(N-1) // (n-1) — the cross-cohort feature-normalization op
    (microarray-style quantile normalization).  The mapping is pure
    integer index arithmetic into the sorted global values, so the
    float column is copied, never computed — exactly hashable.

    Distributed plan: the global sorted value spine is one
    entity-table sort broadcast via ray.put; per-brand ranks come from
    a brand-keyed groupby; each task maps ranks to spine values with
    zero arithmetic."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_retailprice"])
    spine = np.sort(
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_retailprice"])
        .to_pandas()["p_retailprice"]
        .to_numpy()
    )
    big_n = len(spine)
    sref = ray.put(spine)

    def per_brand(g: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(sref)
        g = g.sort_values(["p_retailprice", "p_partkey"], kind="stable").reset_index(drop=True)
        n = len(g)
        r = np.arange(1, n + 1, dtype=np.int64)
        idx = (r - 1) * (big_n - 1) // (n - 1) if n > 1 else np.full(1, (big_n - 1) // 2, np.int64)
        return pd.DataFrame(
            {
                "p_partkey": g["p_partkey"].astype("int64"),
                "p_brand": g["p_brand"],
                "brand_rank": r,
                "norm_price": sp[idx],
            }
        )

    out = (
        ds.groupby("p_brand")
        .map_groups(per_brand, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("p_partkey").reset_index(drop=True)


def price_quantile_normalize_sql() -> str:
    return """
        WITH spine AS (
            SELECT list(p_retailprice ORDER BY p_retailprice) AS g,
                   COUNT(*) AS big_n
            FROM part
        ),
        ranked AS (
            SELECT p_partkey, p_brand,
                   ROW_NUMBER() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice, p_partkey)
                       AS brand_rank,
                   COUNT(*) OVER (PARTITION BY p_brand) AS n
            FROM part
        )
        SELECT r.p_partkey, r.p_brand,
               CAST(r.brand_rank AS BIGINT) AS brand_rank,
               s.g[CAST(CASE WHEN r.n > 1
                        THEN (r.brand_rank - 1) * (s.big_n - 1) // (r.n - 1)
                        ELSE (s.big_n - 1) // 2 END AS INTEGER) + 1]
                   AS norm_price
        FROM ranked r CROSS JOIN spine s
        ORDER BY p_partkey
    """


def daily_periodogram(sf_dir: str, max_k: int = 8) -> pd.DataFrame:
    """Coarse discrete-Fourier periodogram of the daily event-count
    series: for each frequency k, the real and imaginary accumulators
    with every per-day term quantized to micro-units
    (floor(cos_or_sin * x * 1e6 + 0.5)) BEFORE summation, so the sums
    are exact integers and immune to accumulation order — the
    seasonality detector of an ingest-volume monitor (libm cos/sin ==
    DuckDB's, same precedent as pmi_collocations' ln).

    Distributed plan: the corpus-sized work is one date-keyed count;
    the k x days term table folds on the tiny spine."""
    import math

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def day_of(t: pa.Table) -> pa.Table:
        d = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pa.table({"day": pa.array(d)})

    daily = (
        ds.map_batches(day_of, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="x"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    n = len(daily)
    x = daily["x"].to_numpy(dtype=np.int64)
    rows = []
    for k in range(1, max_k + 1):
        re = im = 0
        for d in range(n):
            ang = -2.0 * math.pi * k * d / n
            re += int(math.floor(math.cos(ang) * x[d] * 1e6 + 0.5))
            im += int(math.floor(math.sin(ang) * x[d] * 1e6 + 0.5))
        rows.append({"k": k, "re_micro": re, "im_micro": im})
    return pd.DataFrame(rows).astype({"k": "int64", "re_micro": "int64", "im_micro": "int64"})


def daily_periodogram_sql(max_k: int = 8) -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        seq AS (
            SELECT x, ROW_NUMBER() OVER (ORDER BY day) - 1 AS d,
                   (SELECT COUNT(*) FROM daily) AS n
            FROM daily
        ),
        terms AS (
            SELECT k.k, s.d,
                   CAST(FLOOR(cos(-2.0 * pi() * k.k * s.d / s.n) * s.x * 1e6 + 0.5)
                        AS BIGINT) AS re_t,
                   CAST(FLOOR(sin(-2.0 * pi() * k.k * s.d / s.n) * s.x * 1e6 + 0.5)
                        AS BIGINT) AS im_t
            FROM seq s
            CROSS JOIN (SELECT UNNEST(range(1, {max_k + 1})) AS k) k
        )
        SELECT k, CAST(SUM(re_t) AS BIGINT) AS re_micro,
               CAST(SUM(im_t) AS BIGINT) AS im_micro
        FROM terms GROUP BY k ORDER BY k
    """


def acctbal_winsorize(sf_dir: str, lo_pct: int = 5, hi_pct: int = 95) -> pd.DataFrame:
    """Winsorization of customer account balances at exact order
    statistics: the bounds are the ceil(n*p/100)-th smallest values
    (pure index arithmetic — no interpolation), every output value is
    a COPY of an input value (clamp = comparison only), so the float
    column hashes exactly.  The outlier-robust feature-capping op.

    Distributed plan: the two bound values come from the sorted spine
    (one entity-table sort); the clamp itself is an embarrassingly
    parallel map_batches with the two bounds broadcast."""
    import numpy as np

    vals = np.sort(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_acctbal"])
        .to_pandas()["c_acctbal"]
        .to_numpy()
    )
    n = len(vals)
    lo = vals[max(1, -(-n * lo_pct // 100)) - 1]
    hi = vals[max(1, -(-n * hi_pct // 100)) - 1]

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])

    def clamp(t: pa.Table) -> pa.Table:
        v = t["c_acctbal"].to_numpy(zero_copy_only=False)
        w = np.clip(v, lo, hi)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_acctbal": t["c_acctbal"],
                "wins_bal": pa.array(w, pa.float64()),
                "clipped": pa.array(((v < lo) | (v > hi)).astype(np.int64)),
            }
        )

    out = ds.map_batches(clamp, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def acctbal_winsorize_sql(lo_pct: int = 5, hi_pct: int = 95) -> str:
    return f"""
        WITH spine AS (
            SELECT list(c_acctbal ORDER BY c_acctbal) AS g, COUNT(*) AS n
            FROM customer
        ),
        bounds AS (
            SELECT g[CAST(GREATEST(1, CEIL(n * {lo_pct} / 100.0)) AS INTEGER)] AS lo,
                   g[CAST(GREATEST(1, CEIL(n * {hi_pct} / 100.0)) AS INTEGER)] AS hi
            FROM spine
        )
        SELECT c.c_custkey, c.c_acctbal,
               CASE WHEN c.c_acctbal < b.lo THEN b.lo
                    WHEN c.c_acctbal > b.hi THEN b.hi
                    ELSE c.c_acctbal END AS wins_bal,
               CAST(CASE WHEN c.c_acctbal < b.lo OR c.c_acctbal > b.hi
                         THEN 1 ELSE 0 END AS BIGINT) AS clipped
        FROM customer c CROSS JOIN bounds b
        ORDER BY c_custkey
    """


def user_running_median(sf_dir: str) -> pd.DataFrame:
    """Per-user running median of event values in event_id order — the
    streaming robust-center feature an online anomaly scorer keeps per
    entity.  Medians of even prefixes are (a+b)/2.0 with the identical
    op order as DuckDB's windowed MEDIAN, so the doubles hash-match.

    Distributed plan: one user-keyed groupby; inside each group the
    replay is an insort over the user's own history (bounded per
    entity), vectorized output."""
    import bisect

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"])

    def replay(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="stable").reset_index(drop=True)
        hist: list = []
        med = []
        for v in g["value"]:
            bisect.insort(hist, v)
            n = len(hist)
            if n % 2:
                med.append(hist[n // 2])
            else:
                med.append((hist[n // 2 - 1] + hist[n // 2]) / 2.0)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "running_median": med,
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(replay, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def user_running_median_sql() -> str:
    return """
        SELECT event_id, user_id,
               MEDIAN(value) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running_median
        FROM events
        ORDER BY event_id
    """


def user_interval_union(sf_dir: str) -> pd.DataFrame:
    """Union-coverage per user: total seconds covered by the UNION of
    the same deterministic event intervals user_interval_scheduling
    builds ([s, s + 60 + w%600), s = epoch second, w = value cents) —
    the busy-time / utilization measure behind sessionization and SLA
    accounting, where overlapping activity must not double-count.
    Classic gaps-and-islands: sorted by start, an interval starts a new
    island when its start exceeds the running max end.

    Distributed plan: user-keyed groupby; inside each group one sort +
    vectorized cummax — no cross-user state, integer arithmetic only."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000)
        return pa.table({"user_id": t["user_id"], "s": s, "w": _cents(t["value"])})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g["s"].to_numpy(np.int64)
        e = s + 60 + (g["w"].to_numpy(np.int64) % 600)
        order = np.lexsort((e, s))
        s, e = s[order], e[order]
        run_end = np.maximum.accumulate(e)
        # island starts where s > max end of everything before
        prev_end = np.concatenate(([np.iinfo(np.int64).min], run_end[:-1]))
        new_island = s > prev_end
        island = np.cumsum(new_island) - 1
        starts = s[new_island]
        ends = np.maximum.reduceat(e, np.flatnonzero(new_island))
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_intervals": [len(s)],
                "n_islands": [int(island[-1]) + 1 if len(s) else 0],
                "covered_s": [int((ends - starts).sum())],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def user_interval_union_sql() -> str:
    return """
        WITH iv AS (
            SELECT user_id AS u, epoch_us(ts) // 1000000 AS s,
                   epoch_us(ts) // 1000000 + 60 +
                       (CAST(ROUND(value * 100) AS BIGINT) % 600) AS e
            FROM events
        ),
        flagged AS (
            SELECT u, s, e,
                   CASE WHEN s > COALESCE(MAX(e) OVER (
                            PARTITION BY u ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            -9223372036854775808)
                        THEN 1 ELSE 0 END AS new_island
            FROM iv
        ),
        islands AS (
            SELECT u, s, e,
                   SUM(new_island) OVER (
                       PARTITION BY u ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS island
            FROM flagged
        )
        SELECT CAST(u AS BIGINT) AS user_id,
               CAST(SUM(n) AS BIGINT) AS n_intervals,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(ilen) AS BIGINT) AS covered_s
        FROM (
            SELECT u, island, MAX(e) - MIN(s) AS ilen, COUNT(*) AS n
            FROM islands GROUP BY u, island
        ) t
        GROUP BY u ORDER BY u
    """


def cust_edf_lateness(sf_dir: str) -> pd.DataFrame:
    """Earliest-deadline-first replay of each customer's order backlog:
    orders are jobs on one machine starting at t=0, deadline = days
    since the customer's first order (+1 day, in seconds), processing
    time = 60 + totalprice-cents % 3600 seconds.  EDF (Jackson's rule)
    provably minimizes maximum lateness on one machine, so the reported
    max_lateness_s is the best achievable — the schedulability audit a
    backfill queue runs against its SLAs.

    Distributed plan: customer-keyed groupby; per group one sort by
    (deadline, orderkey) + cumsum — integer arithmetic end-to-end."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def keys(t: pa.Table) -> pa.Table:
        d = pc.divide(
            pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()),
            86_400_000_000,
        )
        return pa.table(
            {
                "cust": t["o_custkey"],
                "ok": t["o_orderkey"],
                "day": d,
                "p": _cents(t["o_totalprice"]),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        day = g["day"].to_numpy(np.int64)
        ok = g["ok"].to_numpy(np.int64)
        p = 60 + (g["p"].to_numpy(np.int64) % 3600)
        dl = (day - day.min() + 1) * 86400
        order = np.lexsort((ok, dl))
        dl, p = dl[order], p[order]
        c = np.cumsum(p)
        late = c - dl
        return pd.DataFrame(
            {
                "o_custkey": [int(g["cust"].iloc[0])],
                "n_jobs": [len(p)],
                "n_late": [int((late > 0).sum())],
                "max_lateness_s": [int(max(late.max(), 0))],
                "makespan_s": [int(c[-1])],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("cust")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_custkey").reset_index(drop=True).astype("int64")


def cust_edf_lateness_sql() -> str:
    return """
        WITH j AS (
            SELECT o_custkey AS c, o_orderkey AS k,
                   epoch_us(o_orderdate) // 86400000000 AS day,
                   60 + (CAST(ROUND(o_totalprice * 100) AS BIGINT) % 3600) AS p
            FROM orders
        ),
        rel AS (
            SELECT c, k, p,
                   (day - MIN(day) OVER (PARTITION BY c) + 1) * 86400 AS dl
            FROM j
        ),
        sched AS (
            SELECT c, dl,
                   SUM(p) OVER (PARTITION BY c ORDER BY dl, k
                                ROWS UNBOUNDED PRECEDING) AS fin
            FROM rel
        )
        SELECT CAST(c AS BIGINT) AS o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_jobs,
               CAST(COUNT(*) FILTER (WHERE fin > dl) AS BIGINT) AS n_late,
               CAST(GREATEST(MAX(fin - dl), 0) AS BIGINT) AS max_lateness_s,
               CAST(MAX(fin) AS BIGINT) AS makespan_s
        FROM sched GROUP BY c ORDER BY c
    """


def neyman_allocation(sf_dir: str, budget: int = 1000) -> pd.DataFrame:
    """Neyman-optimal stratified sample allocation across event types:
    stratum h gets budget * (N_h * sigma_h) / sum(N * sigma) samples,
    where N_h*sigma_h is computed EXACTLY as isqrt(n*Sxx - Sx^2) over
    value cents (the same integer dispersion type_value_sd_floor
    floors), and fractional seats resolve by largest remainder with
    event_type tie-break — the variance-minimizing survey design for a
    fixed label/inspection budget, made bit-deterministic.

    Distributed plan: one type-keyed groupby of (n, Sx, Sxx) partials;
    the allocation arithmetic runs over the type-catalog-sized table."""
    import math

    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        x = _cents(t["value"])
        return pa.table(
            {"event_type": t["event_type"], "x": x, "xx": pc.multiply(x, x)}
        )

    g = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"),
            Sum("xx", alias_name="sxx"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    w = [
        math.isqrt(int(n) * int(sxx) - int(sx) * int(sx))
        for n, sx, sxx in zip(g["n"], g["sx"], g["sxx"])
    ]
    W = sum(w)
    base = [budget * wi // W for wi in w]
    rem = [budget * wi % W for wi in w]
    extra = budget - sum(base)
    order = sorted(range(len(w)), key=lambda i: (-rem[i], g["event_type"].iloc[i]))
    alloc = list(base)
    for i in order[:extra]:
        alloc[i] += 1
    return pd.DataFrame(
        {
            "event_type": g["event_type"],
            "n": g["n"].astype("int64"),
            "weight": pd.Series(w, dtype="int64"),
            "alloc": pd.Series(alloc, dtype="int64"),
        }
    )


def neyman_allocation_sql(budget: int = 1000) -> str:
    return f"""
        WITH f AS (
            SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS x
            FROM events
        ),
        g AS (
            SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx
            FROM f GROUP BY 1
        ),
        v AS (
            SELECT event_type, n,
                   n * sxx - CAST(sx AS HUGEINT) * sx AS var_num
            FROM g
        ),
        k AS (
            SELECT *, CAST(FLOOR(SQRT(CAST(var_num AS DOUBLE))) AS BIGINT) AS kf
            FROM v
        ),
        w AS (
            SELECT event_type, n,
                   CAST(CASE
                       WHEN CAST(kf + 1 AS HUGEINT) * (kf + 1) <= var_num THEN kf + 1
                       WHEN CAST(kf AS HUGEINT) * kf > var_num THEN kf - 1
                       ELSE kf END AS HUGEINT) AS wt
            FROM k
        ),
        tot AS (SELECT SUM(wt) AS big_w FROM w),
        basesum AS (
            SELECT SUM({budget} * wt // (SELECT big_w FROM tot)) AS base_sum
            FROM w
        ),
        seats AS (
            SELECT event_type, n, wt,
                   {budget} * wt // (SELECT big_w FROM tot) AS base,
                   {budget} * wt % (SELECT big_w FROM tot) AS rem
            FROM w
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, event_type) AS rk
            FROM seats
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(wt AS BIGINT) AS weight,
               CAST(base + CASE WHEN rk <= {budget} - (SELECT base_sum FROM basesum)
                                THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM ranked ORDER BY event_type
    """


def type_hoover_index(sf_dir: str) -> pd.DataFrame:
    """Hoover (Robin Hood) inequality index per event type over value
    cents, as an EXACT integer fraction: numerator = sum|n*x_i - Sx|,
    denominator = 2*n*Sx — the share of total value that would have to
    move between events to equalize them.  No floats anywhere, so the
    SQL twin is bit-identical.

    Distributed plan: two passes — a type-catalog-sized groupby of
    (n, Sx), broadcast back into a second map_batches that folds
    |n*x_i - Sx| partials through the same tiny groupby (the classic
    broadcast-stats-then-scan shape; no data-sized shuffle)."""
    import ray
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"], "x": _cents(t["value"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    stats = (
        prepped.groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("x", alias_name="sx"))
        .to_pandas()
    )
    lut = {t: (int(n), int(sx)) for t, n, sx in zip(stats["event_type"], stats["n"], stats["sx"])}
    lut_ref = ray.put(lut)

    def dev(t: pa.Table, *, lut_ref) -> pa.Table:
        import numpy as np

        lut = ray.get(lut_ref)
        types = t["event_type"].to_pylist()
        x = t["x"].to_numpy(zero_copy_only=False).astype(object)
        # python-int arithmetic: n*x can exceed int64 at 100-TB counts
        d = [abs(lut[tt][0] * int(xi) - lut[tt][1]) for tt, xi in zip(types, x)]
        df = pd.DataFrame({"event_type": types, "d": d})
        g = df.groupby("event_type", as_index=False)["d"].sum()
        g["d"] = g["d"].astype(object)
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "d": pa.array([str(v) for v in g["d"]], pa.string()),
            }
        )

    parts = prepped.map_batches(dev, batch_format="pyarrow", fn_kwargs={"lut_ref": lut_ref}).to_pandas()
    parts["d"] = parts["d"].map(int)
    num = parts.groupby("event_type", as_index=False)["d"].sum()
    out = stats.merge(num, on="event_type").sort_values("event_type").reset_index(drop=True)
    out["hoover_num"] = out["d"].astype("int64")
    out["hoover_den"] = (2 * out["n"].astype("int64") * out["sx"].astype("int64")).astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "n", "hoover_num", "hoover_den"]]


def type_hoover_index_sql() -> str:
    return """
        WITH f AS (
            SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS x
            FROM events
        ),
        g AS (
            SELECT event_type, COUNT(*) AS n, SUM(x) AS sx FROM f GROUP BY 1
        )
        SELECT f.event_type, CAST(g.n AS BIGINT) AS n,
               CAST(SUM(ABS(CAST(g.n AS HUGEINT) * f.x - g.sx)) AS BIGINT)
                   AS hoover_num,
               CAST(2 * g.n * g.sx AS BIGINT) AS hoover_den
        FROM f JOIN g USING (event_type)
        GROUP BY f.event_type, g.n, g.sx
        ORDER BY f.event_type
    """


def part_abc_classification(sf_dir: str) -> pd.DataFrame:
    """ABC inventory classification: parts sorted by lineitem revenue
    (cents, DESC, partkey tie-break) split into class A (cumulative
    share <= 80%), B (<= 95%), C (rest), with exact integer threshold
    tests (cum*5 <= 4*total, cum*20 <= 19*total) so no float share is
    ever computed — the Pareto stock-control census.

    Distributed plan: per-part revenue is one part-keyed groupby; the
    global ordered prefix-sum then runs WITHOUT a global sort via the
    two-phase Blelloch scan quality_budget_selection establishes,
    keyed by an order-preserving coarse bucket of the revenue
    (bit-length + top 8 bits), so only the bucket catalog visits the
    driver and each bucket's exact (rev DESC, partkey) order is local
    to its down-sweep group."""
    import numpy as np

    import ray
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"l_partkey": t["l_partkey"], "rev": _cents(t["l_extendedprice"])}
        )

    def coarse(rev: "np.ndarray") -> "np.ndarray":
        # order-preserving bucket: bitlen*256 + top-8-bits
        out = np.empty(len(rev), dtype=np.int64)
        for i, r in enumerate(rev):
            r = int(r)
            bl = r.bit_length()
            out[i] = bl * 256 + (r >> max(0, bl - 8))
        return out

    per_part = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("rev", alias_name="rev"))
        .map_batches(
            lambda t: pa.table(
                {
                    "l_partkey": t["l_partkey"],
                    "rev": t["rev"],
                    "bucket": pa.array(
                        coarse(t["rev"].to_numpy(zero_copy_only=False)), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    sums = (
        per_part.groupby("bucket")
        .aggregate(Sum("rev", alias_name="s"))
        .to_pandas()
        .sort_values("bucket", ascending=False)
        .reset_index(drop=True)
    )
    total = int(sums["s"].sum())
    excl = sums["s"].cumsum().shift(1, fill_value=0)
    offsets = dict(zip(sums["bucket"].astype(int), excl.astype(int)))
    oref = ray.put((offsets, total))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        offs, tot = ray.get(oref)
        off = offs[int(g["bucket"].iloc[0])]
        g = g.sort_values(["rev", "l_partkey"], ascending=[False, True])
        cum = g["rev"].cumsum() + off
        cls = np.where(cum * 5 <= tot * 4, "A", np.where(cum * 20 <= tot * 19, "B", "C"))
        out = pd.DataFrame({"cls": cls, "rev": g["rev"].to_numpy()})
        return out.groupby("cls", as_index=False).agg(
            n_parts=("rev", "size"), revenue_cents=("rev", "sum")
        )

    out = (
        per_part.groupby("bucket")
        .map_groups(classify, batch_format="pandas")
        .groupby("cls")
        .aggregate(
            Sum("n_parts", alias_name="n_parts"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
        .sort_values("cls")
        .reset_index(drop=True)
    )
    out["n_parts"] = out["n_parts"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


def part_abc_classification_sql() -> str:
    return """
        WITH pr AS (
            SELECT l_partkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev
            FROM lineitem GROUP BY 1
        ),
        c AS (
            SELECT l_partkey, rev,
                   SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(rev) OVER () AS total
            FROM pr
        )
        SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
                    WHEN cum * 20 <= total * 19 THEN 'B'
                    ELSE 'C' END AS cls,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(rev) AS BIGINT) AS revenue_cents
        FROM c GROUP BY 1 ORDER BY 1
    """


def user_lru_hit_audit(sf_dir: str, cache_size: int = 8) -> pd.DataFrame:
    """LRU cache-hit replay per user: items are the props 'k' payload
    values, accesses ordered by (ts, event_id); an access HITS an
    LRU cache of size C iff the item was seen before and fewer than C
    DISTINCT items were touched since that previous access (the classic
    stack-distance < C criterion, which makes the stateful replay
    exactly expressible in SQL as a distinct-count between positions) —
    the working-set profile a cache/shard tier is sized from.

    Distributed plan: user-keyed groupby; the replay inside each group
    is one ordered pass with a position-index dict (O(n) per user)."""
    import json as _json

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "props"]
    )

    def keys(t: pa.Table) -> pa.Table:
        items = [int(_json.loads(p)["k"]) for p in t["props"].to_pylist()]
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "tsu": ts,
                "event_id": t["event_id"],
                "item": pa.array(items, pa.int64()),
            }
        )

    def replay(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tsu", "event_id"], kind="stable")
        items = g["item"].tolist()
        last_pos: dict = {}
        # distinct items since position p = number of items whose LAST
        # occurrence so far is > p; track via sorted last-positions
        hits = cold = 0
        for pos, it in enumerate(items):
            if it not in last_pos:
                cold += 1
            else:
                prev = last_pos[it]
                depth = sum(1 for q in last_pos.values() if q > prev)
                if depth < cache_size:
                    hits += 1
            last_pos[it] = pos
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_accesses": [len(items)],
                "n_cold": [cold],
                "n_hits": [hits],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(replay, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def user_lru_hit_audit_sql(cache_size: int = 8) -> str:
    return f"""
        WITH a AS (
            SELECT user_id AS u,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        p AS (
            SELECT u, item, rn,
                   LAG(rn) OVER (PARTITION BY u, item ORDER BY rn) AS prn
            FROM a
        ),
        d AS (
            SELECT p.u, p.rn, p.prn,
                   (SELECT COUNT(DISTINCT a2.item) FROM a a2
                    WHERE a2.u = p.u AND a2.rn > p.prn AND a2.rn < p.rn)
                       AS depth
            FROM p WHERE p.prn IS NOT NULL
        )
        SELECT CAST(u AS BIGINT) AS user_id,
               CAST(n_total AS BIGINT) AS n_accesses,
               CAST(n_total - n_rep AS BIGINT) AS n_cold,
               CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits
        FROM (SELECT u, COUNT(*) AS n_total,
                     COUNT(*) FILTER (WHERE prn IS NOT NULL) AS n_rep
              FROM p GROUP BY u) t
        LEFT JOIN (SELECT u AS u2,
                          COUNT(*) FILTER (WHERE depth < {cache_size}) AS n_hits
                   FROM d GROUP BY u) h
          ON h.u2 = t.u
        ORDER BY u
    """


def belady_opt_cache_audit(sf_dir: str, cache_size: int = 8) -> pd.DataFrame:
    """Belady OPT vs LRU cache replay per user (items = props 'k',
    access order (ts, event_id), cache size C): the optimal offline
    policy evicts the item reused furthest in the future, and
    opt_hits - lru_hits is exactly the headroom a smarter admission
    policy could still buy — the canonical cache-sizing study.  OPT
    needs future knowledge, so the replay is inherently stateful
    (rows-only in the driver contract); pytest certifies both policies
    against independent simulators and pins the OPT >= LRU theorem.

    Distributed plan: user-keyed groupby; each group replays once with
    a next-use index (O(n log C)) — no cross-user state."""
    import heapq
    import json as _json

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "props"]
    )

    def keys(t: pa.Table) -> pa.Table:
        items = [int(_json.loads(p)["k"]) for p in t["props"].to_pylist()]
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "tsu": ts,
                "event_id": t["event_id"],
                "item": pa.array(items, pa.int64()),
            }
        )

    def replay(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tsu", "event_id"], kind="stable")
        items = g["item"].tolist()
        n = len(items)
        # next-use index
        nxt = [n] * n
        last: dict = {}
        for i in range(n - 1, -1, -1):
            nxt[i] = last.get(items[i], n)
            last[items[i]] = i
        # OPT: lazy max-heap of (-next_use, item); entries go stale on
        # re-access, validated against cur_next before evicting
        cache: dict = {}
        heap: list = []
        opt_hits = 0
        for i, it in enumerate(items):
            if it in cache:
                opt_hits += 1
            elif len(cache) >= cache_size:
                while True:
                    negnu, cand = heapq.heappop(heap)
                    if cand in cache and cache[cand] == -negnu:
                        del cache[cand]
                        break
            cache[it] = nxt[i]
            heapq.heappush(heap, (-nxt[i], it))
        # LRU via the stack-distance criterion (same as user_lru_hit_audit)
        last_pos: dict = {}
        lru_hits = cold = 0
        for pos, it in enumerate(items):
            if it not in last_pos:
                cold += 1
            else:
                if sum(1 for q in last_pos.values() if q > last_pos[it]) < cache_size:
                    lru_hits += 1
            last_pos[it] = pos
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_accesses": [n],
                "n_cold": [cold],
                "lru_hits": [lru_hits],
                "opt_hits": [opt_hits],
                "opt_gap": [opt_hits - lru_hits],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(replay, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def event_nearmiss_dups(sf_dir: str, window_s: int = 7200) -> pd.DataFrame:
    """Near-miss duplicate census: per event type, how many events
    repeat the SAME (user, type) within `window_s` seconds of the
    previous one — the retry/double-submit signal an ingestion
    pipeline measures before turning on idempotency-window dedup
    (the streaming_windowed_dedup operator's sizing input).

    Distributed plan: (user, type)-keyed groupby; inside each group a
    vectorized diff against the sorted timestamps — integer partials
    through a type-sized final fold."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"])

    def keys(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000)
        return pa.table(
            {"user_id": t["user_id"], "event_type": t["event_type"], "s": s}
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sort(g["s"].to_numpy(np.int64))
        gaps = np.diff(s)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_events": [len(s)],
                "n_nearmiss": [int((gaps <= window_s).sum())],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .map_groups(fold, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_nearmiss", alias_name="n_nearmiss"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["n_nearmiss"] = out["n_nearmiss"].astype("int64")
    return out


def event_nearmiss_dups_sql(window_s: int = 7200) -> str:
    return f"""
        WITH a AS (
            SELECT user_id, event_type, epoch_us(ts) // 1000000 AS s
            FROM events
        ),
        g AS (
            SELECT event_type,
                   s - LAG(s) OVER (PARTITION BY user_id, event_type
                                    ORDER BY s) AS gap
            FROM a
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) FILTER (WHERE gap <= {window_s}) AS BIGINT)
                   AS n_nearmiss
        FROM g GROUP BY event_type ORDER BY event_type
    """


def daily_range_shard_plan(sf_dir: str, n_shards: int = 8) -> pd.DataFrame:
    """Range-shard boundary planning: split the daily order-revenue
    series into `n_shards` CONTIGUOUS day ranges minimizing the
    heaviest shard (the classic 'split array largest sum' minimax,
    solved exactly by binary search over the cap + greedy feasibility)
    — how a time-partitioned backfill picks its date boundaries so no
    worker gets a hot range.  The optimal cap is unique (the boundary
    set is not), so the audit reports cap + per-shard loads of the
    canonical greedy split.  Iterative/stateful — rows-only in the
    driver contract; pytest certifies against a brute-force DP.

    Distributed plan: the day spine comes from one day-keyed groupby
    (calendar-sized); the binary search runs over that bounded table
    on the driver — the data-sized pass is only the aggregate."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])

    def keys(t: pa.Table) -> pa.Table:
        d = pc.divide(
            pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()),
            86_400_000_000,
        )
        return pa.table({"day": d, "rev": _cents(t["o_totalprice"])})

    daily = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    rev = daily["rev"].to_numpy(np.int64)

    def feasible(cap: int) -> bool:
        used, acc = 1, 0
        for r in rev:
            if r > cap:
                return False
            if acc + r > cap:
                used += 1
                acc = 0
            acc += int(r)
        return used <= n_shards

    lo, hi = int(rev.max()), int(rev.sum())
    while lo < hi:
        mid = (lo + hi) // 2
        if feasible(mid):
            hi = mid
        else:
            lo = mid + 1
    cap = lo
    # canonical greedy split at the optimal cap
    loads, acc = [], 0
    for r in rev:
        if acc + int(r) > cap:
            loads.append(acc)
            acc = 0
        acc += int(r)
    loads.append(acc)
    while len(loads) < n_shards:
        loads.append(0)
    return pd.DataFrame(
        {
            "shard": pd.Series(range(len(loads)), dtype="int64"),
            "load_cents": pd.Series(loads, dtype="int64"),
            "opt_cap_cents": pd.Series([cap] * len(loads), dtype="int64"),
        }
    )


def value_trailing_digit_audit(sf_dir: str) -> pd.DataFrame:
    """Trailing-digit uniformity audit (the fraud/synthetic-data
    complement of the Benford leading-digit test): distribution of the
    last two digits of value cents per event type, reported as the
    exact chi-square sufficient statistics against uniform(0..99) —
    observed counts per cell would be 100 rows/type, so the audit
    folds them into n, sum((O_i*100 - n)^2) (the integer chi-square
    numerator scaled by 100^2/n) plus min/max cell counts.

    Distributed plan: one (type, cents%100)-keyed groupby of counts
    (bounded 100x|types| rows), finalized into type-sized stats."""
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def keys(t: pa.Table) -> pa.Table:
        import numpy as np

        # values are non-negative cents, so numpy % == SQL % here
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "d2": pa.array(cents % 100, pa.int64()),
            }
        )

    cells = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["event_type", "d2"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    rows = []
    for t, g in cells.groupby("event_type"):
        obs = {int(d): int(c) for d, c in zip(g["d2"], g["c"])}
        n = sum(obs.values())
        counts = [obs.get(d, 0) for d in range(100)]
        chi_num = sum((o * 100 - n) ** 2 for o in counts)
        rows.append(
            {
                "event_type": t,
                "n": n,
                "n_cells_hit": len(obs),
                "chi2_numerator": chi_num,
                "max_cell": max(counts),
                "min_cell": min(counts),
            }
        )
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    for c in out.columns:
        if c != "event_type":
            out[c] = out[c].astype("int64")
    return out


def value_trailing_digit_audit_sql() -> str:
    return """
        WITH f AS (
            SELECT event_type,
                   CAST(ROUND(value * 100) AS BIGINT) % 100 AS d2
            FROM events
        ),
        cells AS (
            SELECT event_type, d2, COUNT(*) AS c FROM f GROUP BY 1, 2
        ),
        spine AS (
            SELECT t.event_type, g.d AS d2, COALESCE(c.c, 0) AS c
            FROM (SELECT DISTINCT event_type FROM f) t
            CROSS JOIN generate_series(0, 99) g(d)
            LEFT JOIN cells c ON c.event_type = t.event_type AND c.d2 = g.d
        ),
        tot AS (SELECT event_type, SUM(c) AS n FROM spine GROUP BY 1)
        SELECT s.event_type,
               CAST(t.n AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE s.c > 0) AS BIGINT) AS n_cells_hit,
               CAST(SUM((s.c * 100 - t.n) * (s.c * 100 - t.n)) AS BIGINT)
                   AS chi2_numerator,
               CAST(MAX(s.c) AS BIGINT) AS max_cell,
               CAST(MIN(s.c) AS BIGINT) AS min_cell
        FROM spine s JOIN tot t USING (event_type)
        GROUP BY s.event_type, t.n
        ORDER BY s.event_type
    """


def important_parts_q11(sf_dir: str, threshold_ppm: int = 600) -> pd.DataFrame:
    """TPC-H Q11 shape ('important stock'): parts whose share of total
    lineitem revenue exceeds threshold_ppm parts-per-million, with the
    share as an exact integer — the two-phase global-threshold filter
    (one tiny total-aggregate broadcast, then a part-keyed groupby
    filtered against it) that Q11's HAVING > SUM(...)*fraction needs.

    Distributed plan: phase 1 computes the global total (scalar);
    phase 2 is the part-keyed groupby with the threshold applied to
    integer cross-products (rev * 1e6 > total * ppm) — no floats."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"l_partkey": t["l_partkey"], "rev": _cents(t["l_extendedprice"])}
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    per_part = (
        prepped.groupby("l_partkey")
        .aggregate(Sum("rev", alias_name="revenue_cents"))
        .to_pandas()
    )
    total = int(per_part["revenue_cents"].sum())
    per_part["revenue_cents"] = per_part["revenue_cents"].astype("int64")
    keep = per_part[per_part["revenue_cents"] * 1_000_000 > total * threshold_ppm].copy()
    keep["share_ppm"] = (keep["revenue_cents"] * 1_000_000 // total).astype("int64")
    keep["l_partkey"] = keep["l_partkey"].astype("int64")
    return (
        keep.sort_values(["revenue_cents", "l_partkey"], ascending=[False, True])
        .reset_index(drop=True)[["l_partkey", "revenue_cents", "share_ppm"]]
    )


def important_parts_q11_sql(threshold_ppm: int = 600) -> str:
    return f"""
        WITH pr AS (
            SELECT l_partkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                       AS revenue_cents
            FROM lineitem GROUP BY 1
        ),
        tot AS (SELECT SUM(revenue_cents) AS t FROM pr)
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
               CAST(revenue_cents AS BIGINT) AS revenue_cents,
               CAST(revenue_cents * 1000000 // (SELECT t FROM tot) AS BIGINT)
                   AS share_ppm
        FROM pr
        WHERE revenue_cents * 1000000 > (SELECT t FROM tot) * {threshold_ppm}
        ORDER BY revenue_cents DESC, l_partkey
    """


def events_idle_gaps_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k longest global inactivity gaps in the event stream — the
    outage detector: sort every event time once, then the k largest
    gaps between CONSECUTIVE events system-wide, with start/end
    seconds (ties break on start time).

    Distributed plan: events bucket by coarse time range (hour); each
    bucket computes internal gaps after a local sort, and the driver
    stitches only the bucket-summary (min/max per hour bucket) for
    cross-bucket gaps — same block-stitched scan as the keyspace
    fragmentation audit, on the time axis."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 1_000_000)
        return pa.table(
            {"bucket": pc.divide(s, pa.scalar(3600, pa.int64())), "s": s}
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sort(g["s"].to_numpy(np.int64))
        gaps = np.diff(s)
        order = np.argsort(-gaps, kind="stable")[:k]
        rows = {
            "bucket": [int(g["bucket"].iloc[0])] * (len(order) + 1),
            "gap_s": [int(gaps[i]) for i in order] + [-1],
            "start_s": [int(s[i]) for i in order] + [int(s[0])],
            "end_s": [int(s[i + 1]) for i in order] + [int(s[-1])],
            "is_summary": [0] * len(order) + [1],
        }
        return pd.DataFrame(rows)

    parts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
    )
    summaries = parts[parts["is_summary"] == 1].sort_values("bucket")
    cands = parts[parts["is_summary"] == 0][["gap_s", "start_s", "end_s"]]
    stitched = []
    prev_end = None
    for _, r in summaries.iterrows():
        if prev_end is not None:
            stitched.append(
                {"gap_s": int(r["start_s"]) - prev_end, "start_s": prev_end, "end_s": int(r["start_s"])}
            )
        prev_end = int(r["end_s"])
    allc = pd.concat([cands, pd.DataFrame(stitched)], ignore_index=True)
    out = (
        allc.sort_values(["gap_s", "start_s"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def events_idle_gaps_topk_sql(k: int = 10) -> str:
    return f"""
        WITH s AS (
            SELECT epoch_us(ts) // 1000000 AS t FROM events
        ),
        g AS (
            SELECT LAG(t) OVER (ORDER BY t) AS start_s, t AS end_s
            FROM s
        )
        SELECT CAST(end_s - start_s AS BIGINT) AS gap_s,
               CAST(start_s AS BIGINT) AS start_s,
               CAST(end_s AS BIGINT) AS end_s
        FROM g WHERE start_s IS NOT NULL
        ORDER BY gap_s DESC, start_s LIMIT {k}
    """


def late_ship_orders(sf_dir: str, grace_days: int = 60) -> pd.DataFrame:
    """Late-shipment census (TPC-H Q4 turned into an inequality EXISTS):
    per order priority, how many orders have at least one lineitem that
    shipped more than `grace_days` after the order date, plus the worst
    lateness in days for the priority class.

    Distributed plan — aggregate-before-join: lineitem collapses to ONE
    row per orderkey (max l_shipdate) via a combiner-style groupby, so
    the join exchange carries |orders| rows, not |lineitem|; orders
    streams and joins against the per-key max, and the date-arithmetic
    filter + tiny priority groupby finish. At 10^12 rows the per-key
    max is the only big shuffle, and it moves (key, date) pairs only."""
    import numpy as np

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def prep_li(t: pa.Table) -> pa.Table:
        # per-batch partial max: shrinks the exchange to per-batch
        # distinct orderkeys before the global groupby
        g = t.group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        return pa.table(
            {
                "l_orderkey": g["l_orderkey"],
                "ship_us": pc.cast(
                    pc.cast(g["l_shipdate_max"], pa.timestamp("us")), pa.int64()
                ),
            }
        )

    maxship = (
        li.map_batches(prep_li, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Max("ship_us", alias_name="ship_us"))
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def prep_o(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderpriority": t["o_orderpriority"],
                "order_us": pc.cast(
                    pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()
                ),
            }
        )

    joined = orders.map_batches(prep_o, batch_format="pyarrow").join(
        maxship,
        join_type="inner",
        num_partitions=8,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def late_rows(t: pa.Table) -> pa.Table:
        day_us = 86_400_000_000
        late_days = pc.divide(
            pc.subtract(t["ship_us"], t["order_us"]), pa.scalar(day_us, pa.int64())
        )
        keep = pc.greater(late_days, pa.scalar(grace_days, pa.int64()))
        f = t.filter(keep)
        return pa.table(
            {
                "o_orderpriority": f["o_orderpriority"],
                "late_days": pc.cast(late_days.filter(keep), pa.int64()),
            }
        )

    out = (
        joined.map_batches(late_rows, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Count(alias_name="n_late_orders"), Max("late_days", alias_name="worst_late_days")
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    out["n_late_orders"] = out["n_late_orders"].astype("int64")
    out["worst_late_days"] = out["worst_late_days"].astype("int64")
    return out[["o_orderpriority", "n_late_orders", "worst_late_days"]]


def late_ship_orders_sql(grace_days: int = 60) -> str:
    return f"""
        WITH ms AS (
            SELECT l_orderkey, MAX(l_shipdate) AS mship
            FROM lineitem GROUP BY 1
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_late_orders,
               CAST(MAX(DATEDIFF('day', o_orderdate, mship)) AS BIGINT)
                   AS worst_late_days
        FROM orders o JOIN ms ON o.o_orderkey = ms.l_orderkey
        WHERE DATEDIFF('day', o_orderdate, mship) > {grace_days}
        GROUP BY 1 ORDER BY 1
    """


def impossible_ship_audit(sf_dir: str) -> pd.DataFrame:
    """Referential time-sanity audit: lineitems whose ship date precedes
    their own order's order date — impossible rows that signal clock
    skew or key collisions upstream. Census per order status: violating
    row count, distinct orders touched, and the worst negative lag.

    Distributed plan: the orders (key, date, status) projection is the
    small side — broadcast once via ray.put — and lineitem streams
    through a task-pool map_batches doing a vectorized Arrow hash join
    + inequality filter per batch; a tiny status groupby finishes.
    Row-level (unlike late_ship_orders' order-level EXISTS): every
    violating lineitem row counts."""
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    )
    odict = pa.table(
        {
            "o_orderkey": orders["o_orderkey"],
            "order_us": pc.cast(
                pc.cast(orders["o_orderdate"], pa.timestamp("us")), pa.int64()
            ),
            "o_orderstatus": orders["o_orderstatus"],
        }
    )
    oref = ray.put(odict)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def probe(t: pa.Table, *, oref) -> pa.Table:
        od = ray.get(oref)  # zero-copy plasma read per task
        j = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ship_us": pc.cast(
                    pc.cast(t["l_shipdate"], pa.timestamp("us")), pa.int64()
                ),
            }
        ).join(od, keys="l_orderkey", right_keys="o_orderkey")
        bad = j.filter(pc.less(j["ship_us"], j["order_us"]))
        lag_days = pc.divide(
            pc.subtract(bad["ship_us"], bad["order_us"]),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        # ceil toward zero for negatives: integer division in Arrow
        # truncates toward zero, same as DATEDIFF on whole-day stamps
        return pa.table(
            {
                "o_orderstatus": bad["o_orderstatus"],
                "l_orderkey": bad["l_orderkey"],
                "lag_days": pc.cast(lag_days, pa.int64()),
            }
        )

    bad = li.map_batches(probe, batch_format="pyarrow", fn_kwargs={"oref": oref})

    def partial(t: pa.Table) -> pa.Table:
        # per-batch combiner: collapse to (status, order) before the
        # exchange; the global per-order groupby below makes the
        # distinct-order count exact even when one order's lineitems
        # straddle batches
        g = t.group_by(["o_orderstatus", "l_orderkey"]).aggregate(
            [("lag_days", "min"), ("l_orderkey", "count")]
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "l_orderkey": g["l_orderkey"],
                "min_lag": g["lag_days_min"],
                "n_rows": pc.cast(g["l_orderkey_count"], pa.int64()),
            }
        )

    per_order = (
        bad.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "l_orderkey"])
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Min("min_lag", alias_name="min_lag"),
        )
    )
    out = (
        per_order.groupby("o_orderstatus")
        .aggregate(
            Sum("n_rows", alias_name="n_bad_rows"),
            Count(alias_name="n_bad_orders"),
            Min("min_lag", alias_name="worst_lag_days"),
        )
        .to_pandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    for c in ("n_bad_rows", "n_bad_orders", "worst_lag_days"):
        out[c] = out[c].astype("int64")
    return out[["o_orderstatus", "n_bad_rows", "n_bad_orders", "worst_lag_days"]]


def impossible_ship_audit_sql() -> str:
    return """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_bad_rows,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_bad_orders,
               CAST(MIN(DATEDIFF('day', o_orderdate, l_shipdate)) AS BIGINT)
                   AS worst_lag_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l_shipdate < o_orderdate
        GROUP BY 1 ORDER BY 1
    """


def part_supplier_price_spread(sf_dir: str, min_suppliers: int = 2, k: int = 50) -> pd.DataFrame:
    """Same-part cross-supplier pricing spread: for parts sold by at
    least `min_suppliers` distinct suppliers, the spread between the
    cheapest and dearest supplier's floor-exact unit price (total cents
    // total quantity per (part, supplier)). Top-k widest spreads —
    the 'who is overcharging for this part' sourcing signal.

    Distributed plan — hierarchical re-aggregation: level 1 groups on
    the FINE key (part, supplier) with per-batch partial sums feeding
    one exchange; level 2 re-groups level-1 output on part alone (a
    dataset already ~|parts x avg suppliers| small). Unit prices are
    integer floor divisions so the result is bit-stable."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    def prep(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("l_extendedprice", "sum"), ("l_quantity", "sum")]
        )
        return pa.table(
            {
                "l_partkey": g["l_partkey"],
                "l_suppkey": g["l_suppkey"],
                "price_c": _cents(g["l_extendedprice_sum"]),
                "qty": pc.cast(g["l_quantity_sum"], pa.int64()),
            }
        )

    fine = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Sum("price_c", alias_name="price_c"), Sum("qty", alias_name="qty"))
    )

    def unit(t: pa.Table) -> pa.Table:
        up = pc.divide(t["price_c"], t["qty"])  # int64 // int64 in Arrow
        return pa.table({"l_partkey": t["l_partkey"], "unit_c": pc.cast(up, pa.int64())})

    coarse = (
        fine.map_batches(unit, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Min("unit_c", alias_name="min_unit_c"),
            Max("unit_c", alias_name="max_unit_c"),
        )
        .to_pandas()
    )
    coarse = coarse[coarse["n_suppliers"] >= min_suppliers].copy()
    coarse["spread_c"] = coarse["max_unit_c"] - coarse["min_unit_c"]
    for c in ("l_partkey", "n_suppliers", "min_unit_c", "max_unit_c", "spread_c"):
        coarse[c] = coarse[c].astype("int64")
    return (
        coarse.sort_values(["spread_c", "l_partkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)[
            ["l_partkey", "n_suppliers", "min_unit_c", "max_unit_c", "spread_c"]
        ]
    )


def part_supplier_price_spread_sql(min_suppliers: int = 2, k: int = 50) -> str:
    return f"""
        WITH fine AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                       // SUM(CAST(l_quantity AS BIGINT)) AS unit_c
            FROM lineitem GROUP BY 1, 2
        ),
        coarse AS (
            SELECT l_partkey,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   CAST(MIN(unit_c) AS BIGINT) AS min_unit_c,
                   CAST(MAX(unit_c) AS BIGINT) AS max_unit_c
            FROM fine GROUP BY 1
        )
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey, n_suppliers,
               min_unit_c, max_unit_c,
               max_unit_c - min_unit_c AS spread_c
        FROM coarse WHERE n_suppliers >= {min_suppliers}
        ORDER BY spread_c DESC, l_partkey LIMIT {k}
    """


def events_minute_skew(sf_dir: str) -> pd.DataFrame:
    """Minute-of-hour uniformity audit — the time-axis complement of
    the trailing-digit test: real event streams are near-uniform over
    minute-of-hour; batch imports, cron jobs, and synthetic generators
    spike specific minutes. Per minute 0..59: event count and its
    floor-exact share in ppm of the whole stream.

    Distributed plan: per-batch partial counts (60-way) make the
    exchange 60 rows per block regardless of input size; one tiny
    groupby folds them and the shares are integer divisions."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        minute = pc.minute(pc.cast(t["ts"], pa.timestamp("us")))
        g = (
            pa.table({"minute": pc.cast(minute, pa.int64())})
            .group_by("minute")
            .aggregate([("minute", "count")])
        )
        return pa.table(
            {"minute": g["minute"], "n": pc.cast(g["minute_count"], pa.int64())}
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("minute")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("minute")
        .reset_index(drop=True)
    )
    total = int(out["n"].sum())
    out["minute"] = out["minute"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["share_ppm"] = (out["n"] * 1_000_000 // total).astype("int64")
    return out[["minute", "n", "share_ppm"]]


def events_minute_skew_sql() -> str:
    return """
        WITH c AS (
            SELECT CAST(EXTRACT(minute FROM ts) AS BIGINT) AS minute,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        )
        SELECT minute, n,
               CAST(n * 1000000 // (SELECT SUM(n) FROM c) AS BIGINT)
                   AS share_ppm
        FROM c ORDER BY minute
    """


def segment_priority_mix(sf_dir: str) -> pd.DataFrame:
    """Market-segment x order-priority contingency: per (c_mktsegment,
    o_orderpriority) cell, order count, revenue in cents, and the
    cell's floor-exact ppm share of its segment's orders — the 2-D mix
    table a drift monitor compares release-over-release.

    Distributed plan: the customer key->segment projection broadcasts
    once (ray.put); orders streams through a task-pool probe doing an
    Arrow hash join + per-batch partial (segment, priority) sums, so
    the exchange carries at most |segments x priorities| rows per
    block; shares are integer divisions on the folded result."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    cref = ray.put(cust)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )

    def probe(t: pa.Table, *, cref) -> pa.Table:
        cust = ray.get(cref)
        j = pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderpriority": t["o_orderpriority"],
                "price_c": _cents(t["o_totalprice"]),
            }
        ).join(cust, keys="o_custkey", right_keys="c_custkey")
        g = j.group_by(["c_mktsegment", "o_orderpriority"]).aggregate(
            [("price_c", "sum"), ("price_c", "count")]
        )
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "o_orderpriority": g["o_orderpriority"],
                "revenue_cents": g["price_c_sum"],
                "n_orders": pc.cast(g["price_c_count"], pa.int64()),
            }
        )

    out = (
        orders.map_batches(probe, batch_format="pyarrow", fn_kwargs={"cref": cref})
        .groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
    )
    seg_tot = out.groupby("c_mktsegment")["n_orders"].transform("sum")
    out["seg_share_ppm"] = (out["n_orders"] * 1_000_000 // seg_tot).astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return (
        out.sort_values(["c_mktsegment", "o_orderpriority"])
        .reset_index(drop=True)[
            ["c_mktsegment", "o_orderpriority", "n_orders", "revenue_cents", "seg_share_ppm"]
        ]
    )


def segment_priority_mix_sql() -> str:
    return """
        WITH cell AS (
            SELECT c_mktsegment, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        )
        SELECT c_mktsegment, o_orderpriority, n_orders, revenue_cents,
               CAST(n_orders * 1000000 //
                    SUM(n_orders) OVER (PARTITION BY c_mktsegment)
                    AS BIGINT) AS seg_share_ppm
        FROM cell ORDER BY c_mktsegment, o_orderpriority
    """


def _bit_length_exact(v):
    """Exact floor(log2(v)) for int64 v >= 1 via frexp: frexp returns
    (m, e) with v == m * 2**e and 0.5 <= m < 1, exact for v < 2**53,
    so e - 1 is the bit-length-minus-one bucket with no float-log
    boundary risk (np.log2(2**k - 1) can round UP at large k)."""
    import numpy as np

    _, e = np.frexp(v.astype(np.float64))
    return (e - 1).astype(np.int64)


def orders_price_log2_histogram(sf_dir: str) -> pd.DataFrame:
    """HDR-style order-value histogram: orders bucketed by
    floor(log2(total cents)) — the power-of-two latency-histogram
    trick applied to money, giving a fixed ~40-bucket profile of a
    heavy-tailed value distribution with exact integer edges (no
    quantile shuffle needed). Per bucket: [lo, hi] cent edges, count,
    floor-exact ppm share.

    Distributed plan: per-batch partial bucket counts cap the exchange
    at ~40 rows per block; one tiny groupby folds them. The bucket is
    computed with exact frexp bit-length, and the DuckDB twin uses
    length(bin(x))-1 — both integer-exact, so the hash matches."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        bucket = _bit_length_exact(cents)
        u, c = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": u, "n": c.astype(np.int64)})

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    total = int(out["n"].sum())
    out["bucket"] = out["bucket"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["lo_cents"] = (1 << out["bucket"].to_numpy()).astype("int64")
    out["hi_cents"] = ((1 << (out["bucket"].to_numpy() + 1)) - 1).astype("int64")
    out["share_ppm"] = (out["n"] * 1_000_000 // total).astype("int64")
    return out[["bucket", "lo_cents", "hi_cents", "n", "share_ppm"]]


def orders_price_log2_histogram_sql() -> str:
    return """
        WITH c AS (
            SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), b AS (
            SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM c GROUP BY 1
        )
        SELECT bucket,
               CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS lo_cents,
               CAST((CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS BIGINT)
                   AS hi_cents,
               n,
               CAST(n * 1000000 // (SELECT SUM(n) FROM b) AS BIGINT)
                   AS share_ppm
        FROM b ORDER BY bucket
    """


def events_gap_log2_histogram(sf_dir: str) -> pd.DataFrame:
    """Inter-event gap census in power-of-two second buckets: for each
    user's consecutive event pairs (ts then event_id order, so ties are
    deterministic), the whole-second gap, bucketed by exact bit length
    (bucket -1 = same-second pair) — the session-timeout calibration
    curve: the knee of this histogram is where sessionize thresholds
    belong. Per bucket: [lo, hi] second edges, pair count, floor-exact
    ppm share.

    Distributed plan: gaps need per-user total order, so the one
    shuffle is groupby(user_id); each group emits only its <=64-row
    bucket census (map_groups output is bounded regardless of user
    size), and a second tiny groupby folds censuses globally."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        eid = df["event_id"].to_numpy()
        order = np.lexsort((eid, us))
        us = us[order]
        if len(us) < 2:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        gap_s = np.diff(us) // 1_000_000
        bucket = np.where(gap_s == 0, -1, _bit_length_exact(np.maximum(gap_s, 1)))
        u, c = np.unique(bucket, return_counts=True)
        return pd.DataFrame({"bucket": u.astype("int64"), "n": c.astype("int64")})

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    total = int(out["n"].sum())
    out["bucket"] = out["bucket"].astype("int64")
    out["n"] = out["n"].astype("int64")
    b = out["bucket"].to_numpy()
    out["gap_lo_s"] = np.where(b < 0, 0, 1 << np.maximum(b, 0)).astype("int64")
    out["gap_hi_s"] = np.where(b < 0, 0, (1 << (np.maximum(b, 0) + 1)) - 1).astype(
        "int64"
    )
    out["share_ppm"] = (out["n"] * 1_000_000 // total).astype("int64")
    return out[["bucket", "gap_lo_s", "gap_hi_s", "n", "share_ppm"]]


def events_gap_log2_histogram_sql() -> str:
    return """
        WITH nxt AS (
            SELECT epoch_us(ts) AS us,
                   LEAD(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nus
            FROM events
        ), g AS (
            SELECT (nus - us) // 1000000 AS gap_s
            FROM nxt WHERE nus IS NOT NULL
        ), b AS (
            SELECT CAST(CASE WHEN gap_s = 0 THEN -1
                             ELSE length(bin(gap_s)) - 1 END AS BIGINT)
                       AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM g GROUP BY 1
        )
        SELECT bucket,
               CAST(CASE WHEN bucket < 0 THEN 0
                         ELSE CAST(1 AS BIGINT) << bucket END AS BIGINT)
                   AS gap_lo_s,
               CAST(CASE WHEN bucket < 0 THEN 0
                         ELSE (CAST(1 AS BIGINT) << (bucket + 1)) - 1
                    END AS BIGINT) AS gap_hi_s,
               n,
               CAST(n * 1000000 // (SELECT SUM(n) FROM b) AS BIGINT)
                   AS share_ppm
        FROM b ORDER BY bucket
    """


def source_lang_simpson(sf_dir: str) -> pd.DataFrame:
    """Per-source Simpson concentration of the language mix, as an
    exact integer rational: lambda = sum_l n_l*(n_l-1) / (N*(N-1)) —
    the probability two random docs from the source share a language.
    High lambda = monolingual source; the corpus-mixing planner reads
    this before setting per-source sampling temperatures. Output per
    source: doc count, distinct langs, exact numerator/denominator,
    floor-ppm concentration.

    Distributed plan: per-batch partial (source, lang) counts bound the
    exchange at |sources x langs| rows per block; one small groupby
    folds them and the per-source rational is computed on the tiny
    folded table."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "lang"])

    def prep(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"source": t["source"], "lang": t["lang"]})
            .group_by(["source", "lang"])
            .aggregate([("lang", "count")])
        )
        return pa.table(
            {
                "source": g["source"],
                "lang": g["lang"],
                "n": pc.cast(g["lang_count"], pa.int64()),
            }
        )

    folded = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for source, grp in folded.groupby("source", sort=True):
        n = grp["n"].to_numpy()
        total = int(n.sum())
        num = int((n * (n - 1)).sum())
        den = total * (total - 1)
        rows.append(
            {
                "source": source,
                "n_docs": total,
                "n_langs": int(len(grp)),
                "simpson_num": num,
                "simpson_den": den,
                "simpson_ppm": num * 1_000_000 // den if den else 0,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("n_docs", "n_langs", "simpson_num", "simpson_den", "simpson_ppm"):
        out[c] = out[c].astype("int64")
    return out


def source_lang_simpson_sql() -> str:
    return """
        WITH c AS (
            SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        )
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_langs,
               CAST(SUM(n * (n - 1)) AS BIGINT) AS simpson_num,
               CAST(SUM(n) * (SUM(n) - 1) AS BIGINT) AS simpson_den,
               CAST(CASE WHEN SUM(n) > 1 THEN
                        SUM(n * (n - 1)) * 1000000 //
                        (SUM(n) * (SUM(n) - 1))
                    ELSE 0 END AS BIGINT) AS simpson_ppm
        FROM c GROUP BY source ORDER BY source
    """


def user_bookend_types(sf_dir: str) -> pd.DataFrame:
    """Bookend transition census: per user the FIRST and LAST event
    type (deterministic (ts, event_id) order), folded into a census
    per (first_type, last_type) pair with user count and floor-ppm
    share — the entry/exit matrix a funnel designer reads to see
    whether journeys end where they begin.

    Distributed plan: the one shuffle is groupby(user_id); each group
    emits exactly one (first, last) row, and a second tiny groupby
    folds pairs globally."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        eid = df["event_id"].to_numpy()
        order = np.lexsort((eid, us))
        et = df["event_type"].to_numpy()
        return pd.DataFrame(
            {"first_type": [et[order[0]]], "last_type": [et[order[-1]]], "n": [1]}
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["first_type", "last_type"])
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
        .sort_values(["first_type", "last_type"])
        .reset_index(drop=True)
    )
    total = int(out["n_users"].sum())
    out["n_users"] = out["n_users"].astype("int64")
    out["share_ppm"] = (out["n_users"] * 1_000_000 // total).astype("int64")
    return out[["first_type", "last_type", "n_users", "share_ppm"]]


def user_bookend_types_sql() -> str:
    return """
        WITH b AS (
            SELECT DISTINCT user_id,
                   FIRST_VALUE(event_type) OVER w AS first_type,
                   LAST_VALUE(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING
                   ) AS last_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), c AS (
            SELECT first_type, last_type,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM b GROUP BY 1, 2
        )
        SELECT first_type, last_type, n_users,
               CAST(n_users * 1000000 // (SELECT SUM(n_users) FROM c)
                    AS BIGINT) AS share_ppm
        FROM c ORDER BY first_type, last_type
    """


def nation_balance_sheet(sf_dir: str) -> pd.DataFrame:
    """Conformed-dimension balance sheet: per nation, the customer-side
    and supplier-side account-balance aggregates joined on the shared
    nation dimension (FULL OUTER semantics — a nation with customers
    but no suppliers still appears, with zeros). Balances are exact
    cents; the ratio column is floor-exact ppm of supplier balance to
    customer balance (0 when the denominator is <= 0).

    Distributed plan: customer and supplier each stream through a
    per-batch partial (nationkey -> count/sum-cents), so both exchanges
    carry at most |nations| rows per block; the two tiny folded tables
    and the 25-row nation dimension are joined driver-side."""
    nat = pq.read_table(sf_dir + "/nation.parquet", columns=["n_nationkey", "n_name"])

    def side(table: str, key: str, bal: str, prefix: str) -> pd.DataFrame:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[key, bal])

        def prep(t: pa.Table) -> pa.Table:
            g = (
                pa.table({"nationkey": t[key], "bal_c": _cents(t[bal])})
                .group_by("nationkey")
                .aggregate([("bal_c", "sum"), ("bal_c", "count")])
            )
            return pa.table(
                {
                    "nationkey": g["nationkey"],
                    f"{prefix}_bal_cents": g["bal_c_sum"],
                    f"n_{prefix}s": pc.cast(g["bal_c_count"], pa.int64()),
                }
            )

        return (
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby("nationkey")
            .aggregate(
                Sum(f"{prefix}_bal_cents", alias_name=f"{prefix}_bal_cents"),
                Sum(f"n_{prefix}s", alias_name=f"n_{prefix}s"),
            )
            .to_pandas()
        )

    cust = side("customer", "c_nationkey", "c_acctbal", "cust")
    supp = side("supplier", "s_nationkey", "s_acctbal", "supp")
    out = nat.to_pandas().rename(columns={"n_nationkey": "nationkey"})
    out = out.merge(cust, on="nationkey", how="left").merge(
        supp, on="nationkey", how="left"
    )
    for c in ("n_custs", "cust_bal_cents", "n_supps", "supp_bal_cents"):
        out[c] = out[c].fillna(0).astype("int64")
    num = out["supp_bal_cents"].to_numpy()
    den = out["cust_bal_cents"].to_numpy()
    out["supp_to_cust_ppm"] = [
        int(n) * 1_000_000 // int(d) if d > 0 and n >= 0 else 0
        for n, d in zip(num, den)
    ]
    out["supp_to_cust_ppm"] = out["supp_to_cust_ppm"].astype("int64")
    out = out.sort_values("nationkey").reset_index(drop=True)
    return out[
        [
            "nationkey",
            "n_name",
            "n_custs",
            "cust_bal_cents",
            "n_supps",
            "supp_bal_cents",
            "supp_to_cust_ppm",
        ]
    ]


def nation_balance_sheet_sql() -> str:
    return """
        WITH c AS (
            SELECT c_nationkey AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_custs,
                   CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS cust_bal_cents
            FROM customer GROUP BY 1
        ), s AS (
            SELECT s_nationkey AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_supps,
                   CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS supp_bal_cents
            FROM supplier GROUP BY 1
        )
        SELECT n.n_nationkey AS nationkey, n.n_name,
               CAST(COALESCE(c.n_custs, 0) AS BIGINT) AS n_custs,
               CAST(COALESCE(c.cust_bal_cents, 0) AS BIGINT)
                   AS cust_bal_cents,
               CAST(COALESCE(s.n_supps, 0) AS BIGINT) AS n_supps,
               CAST(COALESCE(s.supp_bal_cents, 0) AS BIGINT)
                   AS supp_bal_cents,
               CAST(CASE WHEN COALESCE(c.cust_bal_cents, 0) > 0
                              AND COALESCE(s.supp_bal_cents, 0) >= 0
                         THEN COALESCE(s.supp_bal_cents, 0) * 1000000
                              // c.cust_bal_cents
                         ELSE 0 END AS BIGINT) AS supp_to_cust_ppm
        FROM nation n
        LEFT JOIN c ON n.n_nationkey = c.nationkey
        LEFT JOIN s ON n.n_nationkey = s.nationkey
        ORDER BY nationkey
    """


def doc_utf8_inflation(sf_dir: str) -> pd.DataFrame:
    """UTF-8 inflation census: per language, total codepoints vs total
    encoded bytes and the floor-exact bytes-per-1000-chars rate — the
    storage/tokenizer-budget planner's view of how much wider than
    ASCII each language's text really is (zh ~3x, accented Latin ~1.0x,
    en exactly 1000). Also counts docs containing any multibyte char.

    Distributed plan: per-batch partial (lang -> sums) via vectorized
    pyarrow utf8_length/binary_length kernels bound the exchange at
    |langs| rows per block; one tiny groupby folds them."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def prep(t: pa.Table) -> pa.Table:
        chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        bts = pc.cast(pc.binary_length(t["text"]), pa.int64())
        multi = pc.cast(pc.greater(bts, chars), pa.int64())
        g = (
            pa.table({"lang": t["lang"], "chars": chars, "bytes": bts, "multi": multi})
            .group_by("lang")
            .aggregate([("chars", "sum"), ("bytes", "sum"), ("multi", "sum"), ("multi", "count")])
        )
        return pa.table(
            {
                "lang": g["lang"],
                "n_docs": pc.cast(g["multi_count"], pa.int64()),
                "total_chars": g["chars_sum"],
                "total_bytes": g["bytes_sum"],
                "n_multibyte_docs": g["multi_sum"],
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
            Sum("total_bytes", alias_name="total_bytes"),
            Sum("n_multibyte_docs", alias_name="n_multibyte_docs"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "total_chars", "total_bytes", "n_multibyte_docs"):
        out[c] = out[c].astype("int64")
    out["bytes_per_1k_chars"] = (
        out["total_bytes"] * 1000 // out["total_chars"]
    ).astype("int64")
    return out[
        ["lang", "n_docs", "total_chars", "total_bytes", "n_multibyte_docs", "bytes_per_1k_chars"]
    ]


def doc_utf8_inflation_sql() -> str:
    return """
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT)
                   AS total_bytes,
               CAST(SUM(CASE WHEN octet_length(CAST(text AS BLOB))
                                  > length(text)
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_multibyte_docs,
               CAST(SUM(octet_length(CAST(text AS BLOB))) * 1000
                    // SUM(length(text)) AS BIGINT)
                   AS bytes_per_1k_chars
        FROM documents GROUP BY lang ORDER BY lang
    """


def user_activity_log2_bands(sf_dir: str) -> pd.DataFrame:
    """User-activity histogram in power-of-two bands: users bucketed by
    floor(log2(their event count)) — the engagement pyramid (lurkers at
    band 0, power users in the tail) with exact integer edges, no
    quantile shuffle. Per band: [lo, hi] count edges, user count, total
    events, floor-ppm share of all events the band generates.

    Distributed plan: one groupby(user_id) count (partial-aggregating,
    carries one int per user), then the tiny banding fold runs on the
    per-user counts with per-batch <=40-row partials."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    per_user = ds.groupby("user_id").aggregate(Count(alias_name="n_events"))

    def band(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_events"], pa.int64()).to_numpy(zero_copy_only=False)
        b = _bit_length_exact(n)
        tbl = pa.table({"band": b, "one": np.ones(len(b), np.int64), "ev": n})
        g = tbl.group_by("band").aggregate([("one", "sum"), ("ev", "sum")])
        return pa.table(
            {"band": g["band"], "n_users": g["one_sum"], "n_events": g["ev_sum"]}
        )

    out = (
        per_user.map_batches(band, batch_format="pyarrow")
        .groupby("band")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_events", alias_name="n_events"),
        )
        .to_pandas()
        .sort_values("band")
        .reset_index(drop=True)
    )
    total = int(out["n_events"].sum())
    out["band"] = out["band"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["lo_events"] = (1 << out["band"].to_numpy()).astype("int64")
    out["hi_events"] = ((1 << (out["band"].to_numpy() + 1)) - 1).astype("int64")
    out["event_share_ppm"] = (out["n_events"] * 1_000_000 // total).astype("int64")
    return out[
        ["band", "lo_events", "hi_events", "n_users", "n_events", "event_share_ppm"]
    ]


def user_activity_log2_bands_sql() -> str:
    return """
        WITH u AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ), b AS (
            SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(n) AS BIGINT) AS n_events
            FROM u GROUP BY 1
        )
        SELECT band,
               CAST(CAST(1 AS BIGINT) << band AS BIGINT) AS lo_events,
               CAST((CAST(1 AS BIGINT) << (band + 1)) - 1 AS BIGINT)
                   AS hi_events,
               n_users, n_events,
               CAST(n_events * 1000000 // (SELECT SUM(n_events) FROM b)
                    AS BIGINT) AS event_share_ppm
        FROM b ORDER BY band
    """


def user_type_run_histogram(sf_dir: str) -> pd.DataFrame:
    """Run-length census of per-user event streams: maximal runs of
    the SAME event type in (ts, event_id) order, folded into a
    (event_type, run_len) histogram — the retry/stutter profile: long
    runs of one type signal client retry loops or bot traffic that a
    quality filter should collapse before training on behavior logs.

    Distributed plan: the one shuffle is groupby(user_id); run lengths
    are found vectorized (np.diff on type-change boundaries) and each
    group emits only its local (type, len) census; a second tiny
    groupby folds censuses globally."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        eid = df["event_id"].to_numpy()
        order = np.lexsort((eid, us))
        et = df["event_type"].to_numpy()[order]
        # boundaries of maximal equal-type runs
        change = np.flatnonzero(et[1:] != et[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(et)]))
        runs = pd.DataFrame({"event_type": et[starts], "run_len": ends - starts})
        c = runs.groupby(["event_type", "run_len"], sort=False).size()
        out = c.reset_index(name="n_runs")
        out["run_len"] = out["run_len"].astype("int64")
        out["n_runs"] = out["n_runs"].astype("int64")
        return out

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["event_type", "run_len"])
        .aggregate(Sum("n_runs", alias_name="n_runs"))
        .to_pandas()
        .sort_values(["event_type", "run_len"])
        .reset_index(drop=True)
    )
    out["run_len"] = out["run_len"].astype("int64")
    out["n_runs"] = out["n_runs"].astype("int64")
    return out[["event_type", "run_len", "n_runs"]]


def user_type_run_histogram_sql() -> str:
    return """
        WITH s AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                   - ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS grp
            FROM events
        ), r AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS run_len
            FROM s GROUP BY user_id, event_type, grp
        )
        SELECT event_type, run_len, CAST(COUNT(*) AS BIGINT) AS n_runs
        FROM r GROUP BY 1, 2 ORDER BY event_type, run_len
    """


def region_year_order_matrix(sf_dir: str) -> pd.DataFrame:
    """Customer-side region x order-year matrix: per (region, year),
    order count and exact revenue cents, plus the floor-ppm share of
    that year's revenue the region carried — the market-mix trend view
    (the customer-geography complement of the supplier-side
    region_revenue star).

    Distributed plan: the 2-hop dimension chain (customer -> nation ->
    region) is pre-joined ONCE driver-side into a custkey -> region map
    and broadcast; orders stream through a task-pool probe doing an
    Arrow hash join + per-batch (region, year) partials, so the
    exchange carries at most |regions x years| rows per block."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    dim = cust.join(
        nation, keys="c_nationkey", right_keys="n_nationkey", join_type="inner"
    ).join(region, keys="n_regionkey", right_keys="r_regionkey", join_type="inner")
    dim = dim.select(["c_custkey", "r_name"])
    ref = ray.put(dim)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def probe(t: pa.Table, *, ref) -> pa.Table:
        dim = ray.get(ref)
        j = pa.table(
            {
                "o_custkey": t["o_custkey"],
                "year": pc.cast(
                    pc.year(pc.cast(t["o_orderdate"], pa.timestamp("us"))), pa.int64()
                ),
                "price_c": _cents(t["o_totalprice"]),
            }
        ).join(dim, keys="o_custkey", right_keys="c_custkey")
        g = j.group_by(["r_name", "year"]).aggregate(
            [("price_c", "sum"), ("price_c", "count")]
        )
        return pa.table(
            {
                "r_name": g["r_name"],
                "year": g["year"],
                "revenue_cents": g["price_c_sum"],
                "n_orders": pc.cast(g["price_c_count"], pa.int64()),
            }
        )

    out = (
        orders.map_batches(probe, batch_format="pyarrow", fn_kwargs={"ref": ref})
        .groupby(["r_name", "year"])
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
        .sort_values(["r_name", "year"])
        .reset_index(drop=True)
    )
    out["year"] = out["year"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    year_tot = out.groupby("year")["revenue_cents"].transform("sum")
    out["year_share_ppm"] = (out["revenue_cents"] * 1_000_000 // year_tot).astype(
        "int64"
    )
    return out[["r_name", "year", "n_orders", "revenue_cents", "year_share_ppm"]]


def region_year_order_matrix_sql() -> str:
    return """
        WITH cell AS (
            SELECT r.r_name,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS year,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        )
        SELECT r_name, year, n_orders, revenue_cents,
               CAST(revenue_cents * 1000000 //
                    SUM(revenue_cents) OVER (PARTITION BY year)
                    AS BIGINT) AS year_share_ppm
        FROM cell ORDER BY r_name, year
    """


def value_quantization_audit(sf_dir: str) -> pd.DataFrame:
    """Quantization-grid audit: per event type, how many values (in
    exact cents) are NOT divisible by each candidate granularity (5,
    10, 25, 100 cents) plus the largest candidate that divides every
    value (0 = penny-grained) — synthetic generators, price books and
    rounded imports leave a coarse grid that this census exposes.

    Distributed plan: per-batch partial (type -> misfit counts) via
    vectorized modulo kernels bound the exchange at |types| rows per
    block; the winning granularity is picked on the tiny folded
    table."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    grid = (5, 10, 25, 100)

    def prep(t: pa.Table) -> pa.Table:
        import numpy as np

        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        et = t["event_type"]
        cols = {"event_type": et}
        for d in grid:
            cols[f"nd{d}"] = pa.array((cents % d != 0).astype(np.int64))
        cols["one"] = pa.array(np.ones(len(cents), np.int64))
        g = pa.table(cols).group_by("event_type").aggregate(
            [(f"nd{d}", "sum") for d in grid] + [("one", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": g["one_sum"],
                **{f"not_div_{d}": g[f"nd{d}_sum"] for d in grid},
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            *[Sum(f"not_div_{d}", alias_name=f"not_div_{d}") for d in grid],
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in out.columns:
        if c != "event_type":
            out[c] = out[c].astype("int64")
    gran = []
    for _, r in out.iterrows():
        best = 0
        for d in grid:
            if r[f"not_div_{d}"] == 0:
                best = max(best, d)
        gran.append(best)
    out["granularity_cents"] = pd.Series(gran, dtype="int64")
    return out[
        ["event_type", "n"]
        + [f"not_div_{d}" for d in grid]
        + ["granularity_cents"]
    ]


def value_quantization_audit_sql() -> str:
    nd = ",\n               ".join(
        f"CAST(SUM(CASE WHEN CAST(ROUND(value * 100) AS BIGINT) % {d} <> 0 "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS not_div_{d}"
        for d in (5, 10, 25, 100)
    )
    return f"""
        WITH c AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
               {nd}
            FROM events GROUP BY event_type
        )
        SELECT event_type, n, not_div_5, not_div_10, not_div_25,
               not_div_100,
               CAST(CASE WHEN not_div_100 = 0 THEN 100
                         WHEN not_div_25 = 0 THEN 25
                         WHEN not_div_10 = 0 THEN 10
                         WHEN not_div_5 = 0 THEN 5
                         ELSE 0 END AS BIGINT) AS granularity_cents
        FROM c ORDER BY event_type
    """


def doc_first_token_census(sf_dir: str, k: int = 30) -> pd.DataFrame:
    """Template-opening detector: census of each document's FIRST
    whitespace-delimited token (top-k by count, token tie-break) — a
    skewed head here means boilerplate openings ("Subject:",
    "Chapter", a scraped nav bar) that a cleaning pipeline should
    strip before dedup. Both sides use RE2 ('^\\S+'), so the token
    extraction is semantics-identical.

    Distributed plan: vectorized extract_regex + per-batch partial
    counts; only (token, count) partials cross the exchange, and the
    driver keeps just the folded top-k."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def prep(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["text"], pattern=r"^(?P<tok>\S+)")
        tok = pc.struct_field(ex, "tok")
        tok = pc.drop_null(tok)
        g = pa.table({"first_token": tok}).group_by("first_token").aggregate(
            [("first_token", "count")]
        )
        return pa.table(
            {
                "first_token": g["first_token"],
                "n": pc.cast(g["first_token_count"], pa.int64()),
            }
        )

    folded = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("first_token")
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    folded["n_docs"] = folded["n_docs"].astype("int64")
    out = (
        folded.sort_values(["n_docs", "first_token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out[["first_token", "n_docs"]]


def doc_first_token_census_sql(k: int = 30) -> str:
    return f"""
        WITH c AS (
            SELECT regexp_extract(text, '^(\\S+)', 1) AS first_token,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents
            WHERE regexp_matches(text, '^\\S')
            GROUP BY 1
        )
        SELECT first_token, n_docs
        FROM c ORDER BY n_docs DESC, first_token LIMIT {k}
    """


def customer_reactivation_census(sf_dir: str, dormant_days: int = 90) -> pd.DataFrame:
    """Churn-reactivation census: an order is a REACTIVATION when the
    same customer's previous order (by o_orderdate, o_orderkey tie
    order) was more than `dormant_days` earlier. Census per calendar
    year of the reactivating order: reactivation count, distinct
    reactivated customers, and the floor-ppm share of that year's
    orders that are reactivations — the win-back curve a lifecycle
    team tracks.

    Distributed plan: the one shuffle is groupby(o_custkey); per-group
    gaps are vectorized (lexsort + diff) and each group emits only its
    per-year partial counts; year totals come from a second bounded
    fold joined driver-side (|years| rows)."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        us = df["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
        ok = df["o_orderkey"].to_numpy()
        order = np.lexsort((ok, us))
        us = us[order]
        if len(us) < 2:
            return pd.DataFrame(
                {"year": pd.Series([], dtype="int64"),
                 "n_reactivations": pd.Series([], dtype="int64"),
                 "n_customers": pd.Series([], dtype="int64")}
            )
        gap_days = np.diff(us) // (86_400 * 1_000_000)
        react = gap_days > dormant_days
        if not react.any():
            return pd.DataFrame(
                {"year": pd.Series([], dtype="int64"),
                 "n_reactivations": pd.Series([], dtype="int64"),
                 "n_customers": pd.Series([], dtype="int64")}
            )
        yrs = (
            df["o_orderdate"]
            .astype("datetime64[us]")
            .dt.year.to_numpy()[order][1:][react]
        )
        u, c = np.unique(yrs, return_counts=True)
        return pd.DataFrame(
            {
                "year": u.astype("int64"),
                "n_reactivations": c.astype("int64"),
                # one customer counted once per year it reactivates in
                "n_customers": np.ones(len(u), dtype="int64"),
            }
        )

    react = (
        ds.groupby("o_custkey")
        .map_groups(per_cust, batch_format="pandas")
        .groupby("year")
        .aggregate(
            Sum("n_reactivations", alias_name="n_reactivations"),
            Sum("n_customers", alias_name="n_customers"),
        )
        .to_pandas()
    )

    def year_totals(t: pa.Table) -> pa.Table:
        y = pc.cast(
            pc.year(pc.cast(t["o_orderdate"], pa.timestamp("us"))), pa.int64()
        )
        g = pa.table({"year": y}).group_by("year").aggregate([("year", "count")])
        return pa.table(
            {"year": g["year"], "n_orders": pc.cast(g["year_count"], pa.int64())}
        )

    totals = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])
        .map_batches(year_totals, batch_format="pyarrow")
        .groupby("year")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out = react.merge(totals, on="year", how="inner")
    for c in ("year", "n_reactivations", "n_customers", "n_orders"):
        out[c] = out[c].astype("int64")
    out["react_share_ppm"] = (
        out["n_reactivations"] * 1_000_000 // out["n_orders"]
    ).astype("int64")
    out = out.sort_values("year").reset_index(drop=True)
    return out[["year", "n_reactivations", "n_customers", "n_orders", "react_share_ppm"]]


def customer_reactivation_census_sql(dormant_days: int = 90) -> str:
    return f"""
        WITH lagged AS (
            SELECT o_custkey, o_orderdate,
                   LAG(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS prev_date
            FROM orders
        ), r AS (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
                   o_custkey
            FROM lagged
            WHERE prev_date IS NOT NULL
              AND (epoch_us(o_orderdate) - epoch_us(prev_date))
                  // (CAST(86400 AS BIGINT) * 1000000) > {dormant_days}
        ), c AS (
            SELECT year,
                   CAST(COUNT(*) AS BIGINT) AS n_reactivations,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
            FROM r GROUP BY 1
        ), t AS (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT c.year, c.n_reactivations, c.n_customers, t.n_orders,
               CAST(c.n_reactivations * 1000000 // t.n_orders AS BIGINT)
                   AS react_share_ppm
        FROM c JOIN t ON c.year = t.year
        ORDER BY c.year
    """


def _v_optimal_partition(y, buckets: int):
    """Exact V-optimal contiguous partition of series y into <=buckets
    segments minimizing total SSE, with EXACT rational cost arithmetic
    (segment SSE = sum(y^2) - (sum y)^2 / len kept as a Fraction, so
    ties and comparisons never suffer float drift). O(n^2 * B) DP on
    prefix sums — run on a FOLDED bounded series (days), never raw
    rows. Returns list of (start, end_exclusive) and the optimal cost
    Fraction."""
    from fractions import Fraction

    n = len(y)
    buckets = min(buckets, n)
    ps = [0] * (n + 1)
    ps2 = [0] * (n + 1)
    for i, v in enumerate(y):
        ps[i + 1] = ps[i] + int(v)
        ps2[i + 1] = ps2[i] + int(v) * int(v)

    def sse(i, j):  # [i, j)
        s, s2, ln = ps[j] - ps[i], ps2[j] - ps2[i], j - i
        return Fraction(ln * s2 - s * s, ln)

    INF = None
    dp = [[INF] * (n + 1) for _ in range(buckets + 1)]
    back = [[0] * (n + 1) for _ in range(buckets + 1)]
    dp[0][0] = Fraction(0)
    for b in range(1, buckets + 1):
        for j in range(b, n + 1):
            best, arg = INF, 0
            for i in range(b - 1, j):
                if dp[b - 1][i] is None:
                    continue
                c = dp[b - 1][i] + sse(i, j)
                if best is None or c < best:
                    best, arg = c, i
            dp[b][j] = best
            back[b][j] = arg
    # exactly `buckets` segments (n >= buckets guaranteed by min above)
    cuts = []
    j = n
    for b in range(buckets, 0, -1):
        i = back[b][j]
        cuts.append((i, j))
        j = i
    cuts.reverse()
    return cuts, dp[buckets][n]


def v_optimal_daily_histogram(sf_dir: str, buckets: int = 8) -> pd.DataFrame:
    """V-optimal histogram of the daily event-count series: the exact
    minimum-SSE partition of the days into `buckets` contiguous
    segments — the optimizer-statistics histogram (Jagadish et al.,
    VLDB'98 construction) that a cost-based planner stores instead of
    equi-width buckets. Exact rational DP; certificate pinned by a
    brute-force-all-partitions pytest.

    Distributed plan: the only shuffle folds events to one count per
    day (per-batch partials bound the exchange at |days| rows per
    block); the O(days^2 * B) DP then runs on the bounded folded
    series driver-side — never on raw rows.

    No SQL oracle: V-optimal segmentation needs the DP (rows-only
    CORRECTNESS; dedicated pytests pin optimality)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")), unit="day"),
            pa.date32(),
        )
        g = pa.table({"day": day}).group_by("day").aggregate([("day", "count")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["day_count"], pa.int64())}
        )

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    y = daily["n"].astype("int64").to_numpy()
    cuts, _ = _v_optimal_partition(y, buckets)
    rows = []
    for bi, (i, j) in enumerate(cuts):
        seg = y[i:j]
        s = int(seg.sum())
        s2 = int((seg.astype(object) ** 2).sum())
        ln = int(j - i)
        rows.append(
            {
                "bucket": bi,
                "start_day": daily["day"].iloc[i],
                "end_day": daily["day"].iloc[j - 1],
                "n_days": ln,
                "total_events": s,
                # exact scaled SSE: len*sum(y^2) - (sum y)^2 over len
                "sse_num": ln * s2 - s * s,
                "sse_den": ln,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("bucket", "n_days", "total_events", "sse_num", "sse_den"):
        out[c] = out[c].astype("int64")
    return out


def source_prefix_discrepancy(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Stream-balance (discrepancy) audit: reading documents in doc_id
    order, how far does each source's running share drift from its
    global share? For source s at prefix length p the scaled deviation
    is |cum_s(p) * N - C_s * p| (all integers; dividing by N*p would
    give the share gap) — a high max means the stream front-loads or
    starves a source, which breaks interleaved training mixes. Output
    per source: global count, max scaled deviation, and the SMALLEST
    prefix attaining it.

    Distributed plan: two-pass block-stitched prefix scan — pass 1
    folds per-(bucket, source) counts (tiny) so the driver can build
    each bucket's exclusive prefix seed; pass 2 evaluates every prefix
    inside its bucket with vectorized cumsums and emits only the
    per-bucket per-source argmax; the O(buckets x sources) partials
    fold driver-side. No global sort materializes."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    stats = ds.aggregate(Min("doc_id"), Max("doc_id"), Count())
    lo, hi, n_total = stats["min(doc_id)"], stats["max(doc_id)"], stats["count()"]
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.divide(pc.subtract(t["doc_id"], lo), width), pa.int64()
                ),
                "doc_id": t["doc_id"],
                "source": t["source"],
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    spine = (
        tagged.groupby(["bucket", "source"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["bucket", "source"])
    )
    sources = sorted(spine["source"].unique())
    totals = spine.groupby("source")["n"].sum().to_dict()
    # exclusive prefix seeds per bucket: rows before the bucket, and
    # per-source counts before the bucket
    piv = (
        spine.pivot_table(index="bucket", columns="source", values="n", fill_value=0)
        .reindex(columns=sources, fill_value=0)
        .sort_index()
    )
    bucket_rows = piv.sum(axis=1).to_numpy()
    row_seed = np.concatenate(([0], np.cumsum(bucket_rows)[:-1]))
    src_seed = np.vstack(
        [np.concatenate(([0], np.cumsum(piv[s].to_numpy())[:-1])) for s in sources]
    )  # [S, buckets]
    seeds = {
        int(b): (int(row_seed[i]), {s: int(src_seed[k, i]) for k, s in enumerate(sources)})
        for i, b in enumerate(piv.index)
    }
    seed_ref = ray.put((seeds, dict(totals), int(n_total)))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        seeds, totals, N = ray.get(seed_ref)
        g = g.sort_values("doc_id", kind="stable")
        row0, src0 = seeds[int(g["bucket"].iloc[0])]
        p = row0 + np.arange(1, len(g) + 1, dtype="int64")
        rows = []
        src_arr = g["source"].to_numpy()
        for s, C in totals.items():
            cum = src0.get(s, 0) + np.cumsum((src_arr == s).astype("int64"))
            dev = np.abs(cum * N - C * p)
            i = int(np.argmax(dev))  # first occurrence of the max
            rows.append({"source": s, "max_dev": int(dev[i]), "at_prefix": int(p[i])})
        return pd.DataFrame(rows)

    partials = (
        tagged.groupby("bucket")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
    )
    # driver fold over O(buckets x sources): max dev, tie -> min prefix
    partials = partials.sort_values(["source", "max_dev", "at_prefix"],
                                    ascending=[True, False, True])
    out = partials.groupby("source", sort=True).first().reset_index()
    out["n_docs"] = out["source"].map(totals).astype("int64")
    out["max_dev"] = out["max_dev"].astype("int64")
    out["at_prefix"] = out["at_prefix"].astype("int64")
    return out[["source", "n_docs", "max_dev", "at_prefix"]]


def source_prefix_discrepancy_sql() -> str:
    return """
        WITH d AS (
            SELECT source,
                   ROW_NUMBER() OVER (ORDER BY doc_id) AS p
            FROM documents
        ), tot AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1
        ), grid AS (
            SELECT t.source, t.n_docs, d.p,
                   SUM(CASE WHEN d.source = t.source THEN 1 ELSE 0 END)
                       OVER (PARTITION BY t.source ORDER BY d.p) AS cum
            FROM tot t CROSS JOIN d
        ), dev AS (
            SELECT source, n_docs, p,
                   ABS(cum * (SELECT COUNT(*) FROM documents)
                       - n_docs * p) AS dv
            FROM grid
        )
        SELECT source, n_docs,
               CAST(MAX(dv) AS BIGINT) AS max_dev,
               CAST(MIN(p) FILTER (WHERE dv = (
                   SELECT MAX(dv) FROM dev d2 WHERE d2.source = dev.source
               )) AS BIGINT) AS at_prefix
        FROM dev GROUP BY source, n_docs ORDER BY source
    """


def type_alias_sampling_table(sf_dir: str) -> pd.DataFrame:
    """Walker/Vose alias table for sampling event types proportional to
    their observed frequency in O(1) per draw — the structure negative
    samplers and mixture-of-sources data loaders precompute. Built with
    EXACT integer arithmetic: with K types and N total events, slot i
    carries primary type t_i up to cut_num/cut_den (cut_den = N) and
    alias a_i above it; the construction preserves mass exactly, which
    the certificate test reconstructs integerly (no float epsilon).

    Distributed plan: the only distributed work is the bounded
    (type -> count) fold; the O(K) worklist construction is inherently
    sequential and runs on the folded table driver-side — the correct
    split at any scale since K never grows with data volume.

    No SQL oracle: the worklist construction isn't SQL-expressible;
    correctness is pinned by the exact mass-reconstruction pytest."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])

    def prep(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("event_type", "count")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pc.cast(g["event_type_count"], pa.int64()),
            }
        )

    folded = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    types = folded["event_type"].tolist()
    counts = [int(v) for v in folded["n"]]
    K, N = len(types), sum(counts)
    # scaled weights w_i = c_i * K against capacity N per slot
    w = {i: counts[i] * K for i in range(K)}
    small = [i for i in range(K) if w[i] < N]
    large = [i for i in range(K) if w[i] >= N]
    cut = [0] * K
    alias = [0] * K
    # deterministic: lists consumed LIFO from sorted construction above
    while small and large:
        s = small.pop()
        l = large.pop()
        cut[s] = w[s]
        alias[s] = l
        w[l] = w[l] - (N - w[s])
        (small if w[l] < N else large).append(l)
    for i in large + small:  # exactly-full slots
        cut[i] = N
        alias[i] = i
    out = pd.DataFrame(
        {
            "slot": range(K),
            "event_type": types,
            "n": counts,
            "cut_num": cut,
            "alias_type": [types[a] for a in alias],
            "cut_den": [N] * K,
        }
    )
    for c in ("slot", "n", "cut_num", "cut_den"):
        out[c] = out[c].astype("int64")
    return out[["slot", "event_type", "n", "cut_num", "alias_type", "cut_den"]]


def percentile_stitch_bias_audit(
    sf_dir: str, n_buckets: int = 64
) -> pd.DataFrame:
    """The 'never average shard percentiles' audit, made exact: per
    event type, (a) the true global lower median of value-cents (the
    ceil(n/2)-th smallest), (b) the naive estimate a broken pipeline
    computes — average the per-shard lower medians (floor integer
    division across the type's populated shards) — and (c) the signed
    bias. Shards are deterministic event_id ranges, so both sides
    reproduce the identical shard layout and every number is an exact
    integer.

    Distributed plan: shard medians come from a (type, bucket) groupby
    whose groups are block-local slices (vectorized partition-based
    order stat per group, O(cells) exchange); the true median is one
    per-type groupby with an in-group selection — the unavoidable
    per-key sort an exact order statistic needs."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    stats = ds.aggregate(Min("event_id"), Max("event_id"))
    lo, hi = stats["min(event_id)"], stats["max(event_id)"]
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "bucket": pc.cast(
                    pc.divide(pc.subtract(t["event_id"], lo), width), pa.int64()
                ),
                "cents": _cents(t["value"]),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def lower_median(df: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(df["cents"].to_numpy())
        k = (len(c) + 1) // 2  # 1-indexed lower median
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "med": [int(c[k - 1])],
            }
        )

    shard_meds = (
        tagged.groupby(["event_type", "bucket"])
        .map_groups(
            lambda df: lower_median(df).assign(bucket=df["bucket"].iloc[0]),
            batch_format="pandas",
        )
        .to_pandas()
    )
    naive = (
        shard_meds.groupby("event_type")["med"]
        .apply(lambda s: int(s.sum()) // len(s))
        .rename("naive_median_cents")
        .reset_index()
    )
    true_med = (
        tagged.groupby("event_type")
        .map_groups(lower_median, batch_format="pandas")
        .to_pandas()
        .rename(columns={"med": "true_median_cents"})
    )
    out = true_med.merge(naive, on="event_type").sort_values("event_type")
    out["true_median_cents"] = out["true_median_cents"].astype("int64")
    out["naive_median_cents"] = out["naive_median_cents"].astype("int64")
    out["bias_cents"] = (
        out["naive_median_cents"] - out["true_median_cents"]
    ).astype("int64")
    return out.reset_index(drop=True)[
        ["event_type", "true_median_cents", "naive_median_cents", "bias_cents"]
    ]


def percentile_stitch_bias_audit_sql(n_buckets: int = 64) -> str:
    return f"""
        WITH bounds AS (
            SELECT MIN(event_id) AS lo, MAX(event_id) AS hi FROM events
        ), e AS (
            SELECT event_type,
                   (event_id - b.lo) //
                       GREATEST(1, (b.hi - b.lo + {n_buckets}) // {n_buckets})
                       AS bucket,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events, bounds b
        ), cell AS (
            SELECT event_type, bucket, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type, bucket ORDER BY cents) AS rn,
                   COUNT(*) OVER (
                       PARTITION BY event_type, bucket) AS cnt
            FROM e
        ), shard_med AS (
            SELECT event_type, bucket, cents AS med
            FROM cell WHERE rn = (cnt + 1) // 2
        ), naive AS (
            SELECT event_type,
                   CAST(SUM(med) // COUNT(*) AS BIGINT)
                       AS naive_median_cents
            FROM shard_med GROUP BY 1
        ), gstat AS (
            SELECT event_type, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY cents) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS cnt
            FROM e
        ), true_med AS (
            SELECT event_type, CAST(cents AS BIGINT) AS true_median_cents
            FROM gstat WHERE rn = (cnt + 1) // 2
        )
        SELECT t.event_type, t.true_median_cents, n.naive_median_cents,
               CAST(n.naive_median_cents - t.true_median_cents AS BIGINT)
                   AS bias_cents
        FROM true_med t JOIN naive n USING (event_type)
        ORDER BY t.event_type
    """


def events_type_peak_hour(sf_dir: str) -> pd.DataFrame:
    """Peak-hour reduction: per event type, the hour-of-day with the
    most events (ties -> smallest hour), its count, and the floor-ppm
    share of the type's events that land in that hour — the argmax
    view capacity planners read off the full hourly grid.

    Distributed plan: per-batch (type, hour) partials bound the
    exchange at 24 x |types| rows per block; the argmax runs on the
    tiny folded grid."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        hour = pc.cast(pc.hour(pc.cast(t["ts"], pa.timestamp("us"))), pa.int64())
        g = (
            pa.table({"event_type": t["event_type"], "hour": hour})
            .group_by(["event_type", "hour"])
            .aggregate([("hour", "count")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "hour": g["hour"],
                "n": pc.cast(g["hour_count"], pa.int64()),
            }
        )

    grid = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tot = grid.groupby("event_type")["n"].transform("sum")
    grid["type_total"] = tot
    grid = grid.sort_values(["event_type", "n", "hour"], ascending=[True, False, True])
    out = grid.groupby("event_type", sort=True).first().reset_index()
    out = out.rename(columns={"hour": "peak_hour", "n": "n_peak"})
    for c in ("peak_hour", "n_peak", "type_total"):
        out[c] = out[c].astype("int64")
    out["peak_share_ppm"] = (out["n_peak"] * 1_000_000 // out["type_total"]).astype(
        "int64"
    )
    return out[["event_type", "peak_hour", "n_peak", "type_total", "peak_share_ppm"]]


def events_type_peak_hour_sql() -> str:
    return """
        WITH g AS (
            SELECT event_type,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), r AS (
            SELECT event_type, hour, n,
                   SUM(n) OVER (PARTITION BY event_type) AS type_total,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY n DESC, hour) AS rk
            FROM g
        )
        SELECT event_type, hour AS peak_hour, n AS n_peak,
               CAST(type_total AS BIGINT) AS type_total,
               CAST(n * 1000000 // type_total AS BIGINT) AS peak_share_ppm
        FROM r WHERE rk = 1 ORDER BY event_type
    """


def daily_dominance_counts(sf_dir: str) -> pd.DataFrame:
    """2-D dominance census over the daily (event count, revenue
    cents) series: for each day, how many other days it strictly
    dominates on BOTH axes (more events AND more revenue) — the
    Pareto-rank view behind skyline maintenance and anomaly triage.
    Engine computes it in O(D log D) with a coordinate-compressed
    Fenwick (BIT) sweep; the SQL twin is the O(D^2) self-join —
    feasible because D is bounded (days), which is exactly why the
    sweep runs on the FOLDED series, never raw events.

    Distributed plan: per-batch (day -> count, cents) partials bound
    the exchange at |days| rows per block; the sweep is driver-side on
    the bounded fold."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")), unit="day"),
            pa.date32(),
        )
        g = (
            pa.table({"day": day, "cents": _cents(t["value"])})
            .group_by("day")
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        return pa.table(
            {
                "day": g["day"],
                "revenue_cents": g["cents_sum"],
                "n_events": pc.cast(g["cents_count"], pa.int64()),
            }
        )

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    n = daily["n_events"].to_numpy().astype("int64")
    r = daily["revenue_cents"].to_numpy().astype("int64")
    D = len(daily)
    # sweep days by ascending n (ties ascending r); a BIT over the
    # compressed r-ranks counts how many already-seen days have
    # strictly smaller r. Ties on n must NOT count as dominated, so
    # process equal-n groups together: query first, then insert.
    order = np.lexsort((r, n))
    # strictness on r needs value ranks with ties sharing a rank
    uniq = np.unique(r)
    rank_of = {v: i for i, v in enumerate(uniq)}
    rv = np.array([rank_of[v] for v in r], dtype=np.int64)
    tree = np.zeros(len(uniq) + 1, dtype=np.int64)

    def bit_add(i):
        i += 1
        while i < len(tree):
            tree[i] += 1
            i += i & (-i)

    def bit_sum(i):  # count of inserted with rank < i
        s = 0
        while i > 0:
            s += tree[i]
            i -= i & (-i)
        return s

    dom = np.zeros(D, dtype=np.int64)
    i = 0
    while i < D:
        j = i
        while j < D and n[order[j]] == n[order[i]]:
            j += 1
        for k in range(i, j):  # query phase: strictly smaller n already in
            dom[order[k]] = bit_sum(rv[order[k]])
        for k in range(i, j):  # insert phase
            bit_add(rv[order[k]])
        i = j
    out = daily.copy()
    out["day"] = pd.to_datetime(out["day"])
    out["n_events"] = out["n_events"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["n_dominated"] = dom
    return out[["day", "n_events", "revenue_cents", "n_dominated"]]


def daily_dominance_counts_sql() -> str:
    return """
        WITH d AS (
            SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM events GROUP BY 1
        )
        SELECT a.day, a.n_events, a.revenue_cents,
               CAST((SELECT COUNT(*) FROM d b
                     WHERE b.n_events < a.n_events
                       AND b.revenue_cents < a.revenue_cents) AS BIGINT)
                   AS n_dominated
        FROM d a ORDER BY a.day
    """


def event_value_did(sf_dir: str) -> pd.DataFrame:
    """Difference-in-differences audit with exact integer arithmetic:
    per event type, the weekend-vs-weekday mean value gap in the
    SECOND half of the date span minus the same gap in the first half
    — did the weekend premium move? Cell means are floor micro-cents
    (sum * 1_000_000 // n), and the DiD is defined as arithmetic on
    those floored means so both sides agree bit-for-bit.

    Distributed plan: per-batch partials over the 2x2x|types| cell
    grid (sum + count per cell) bound the exchange; the DiD arithmetic
    runs on the folded 4-row-per-type table."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    stats = ds.aggregate(Min("ts"), Max("ts"))
    lo, hi = stats["min(ts)"], stats["max(ts)"]
    import pandas as _pd

    lo_us = int(_pd.Timestamp(lo).value // 1000)
    hi_us = int(_pd.Timestamp(hi).value // 1000)
    mid_us = lo_us + (hi_us - lo_us) // 2

    def prep(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.timestamp("us"))
        us = pc.cast(ts, pa.int64())
        period = pc.cast(pc.greater_equal(us, mid_us), pa.int64())
        dow = pc.day_of_week(ts)  # Monday=0 .. Sunday=6
        weekend = pc.cast(pc.greater_equal(dow, 5), pa.int64())
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "period": period,
                    "weekend": weekend,
                    "cents": _cents(t["value"]),
                }
            )
            .group_by(["event_type", "period", "weekend"])
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "period": g["period"],
                "weekend": g["weekend"],
                "cents": g["cents_sum"],
                "n": pc.cast(g["cents_count"], pa.int64()),
            }
        )

    cells = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "period", "weekend"])
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    cells["mean_ucents"] = (cells["cents"] * 1_000_000 // cells["n"]).astype("int64")
    piv = cells.pivot_table(
        index="event_type", columns=["period", "weekend"], values="mean_ucents"
    )
    rows = []
    for et in sorted(piv.index):
        m = {
            (p, w): int(piv.loc[et, (p, w)])
            for p in (0, 1)
            for w in (0, 1)
            if (p, w) in piv.columns and not pd.isna(piv.loc[et, (p, w)])
        }
        if len(m) < 4:
            continue  # a type missing a cell can't be differenced
        gap0 = m[(0, 1)] - m[(0, 0)]
        gap1 = m[(1, 1)] - m[(1, 0)]
        rows.append(
            {
                "event_type": et,
                "wkday_p0_ucents": m[(0, 0)],
                "wkend_p0_ucents": m[(0, 1)],
                "wkday_p1_ucents": m[(1, 0)],
                "wkend_p1_ucents": m[(1, 1)],
                "did_ucents": gap1 - gap0,
            }
        )
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c != "event_type":
            out[c] = out[c].astype("int64")
    return out


def event_value_did_sql() -> str:
    return """
        WITH bounds AS (
            SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi
            FROM events
        ), cell AS (
            SELECT event_type,
                   CASE WHEN epoch_us(ts) >=
                            b.lo + (b.hi - b.lo) // 2
                        THEN 1 ELSE 0 END AS period,
                   CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                       AS weekend,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) * 1000000
                        // COUNT(*) AS BIGINT) AS mean_ucents
            FROM events, bounds b
            GROUP BY 1, 2, 3
        ), piv AS (
            SELECT event_type,
                   MAX(CASE WHEN period = 0 AND weekend = 0
                            THEN mean_ucents END) AS wkday_p0_ucents,
                   MAX(CASE WHEN period = 0 AND weekend = 1
                            THEN mean_ucents END) AS wkend_p0_ucents,
                   MAX(CASE WHEN period = 1 AND weekend = 0
                            THEN mean_ucents END) AS wkday_p1_ucents,
                   MAX(CASE WHEN period = 1 AND weekend = 1
                            THEN mean_ucents END) AS wkend_p1_ucents,
                   COUNT(*) AS n_cells
            FROM cell GROUP BY 1
        )
        SELECT event_type, wkday_p0_ucents, wkend_p0_ucents,
               wkday_p1_ucents, wkend_p1_ucents,
               CAST((wkend_p1_ucents - wkday_p1_ucents)
                    - (wkend_p0_ucents - wkday_p0_ucents) AS BIGINT)
                   AS did_ucents
        FROM piv WHERE n_cells = 4 ORDER BY event_type
    """


def cohort_persistence(sf_dir: str) -> pd.DataFrame:
    """Cohort persistence: group users by FIRST-SEEN day; for each
    cohort, the latest day-offset at which the cohort still produced
    at least half of its day-0 event count (cnt*2 >= c0) — a
    gap-robust half-life (missing days can't fake a crossing because
    the metric is a max over observed offsets, not a min over absent
    ones). Output per cohort: users, day-0 events, persistence_days,
    and the last observed offset.

    Distributed plan: first-seen days come from one groupby(user) min;
    the (cohort, offset) grid is bounded by the calendar squared, so
    per-batch partials fold tiny; the threshold reduction runs on the
    folded grid."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")), unit="day"),
            pa.date32(),
        )
        return pa.table({"user_id": t["user_id"], "day": pc.cast(day, pa.int32())})

    days = ds.map_batches(to_day, batch_format="pyarrow")
    first = (
        days.groupby("user_id")
        .aggregate(Min("day", alias_name="cohort"))
        .to_arrow_refs()
    )
    tbls = [t for t in ray.get(first) if t.num_rows > 0]
    first_tbl = pa.concat_tables(tbls).combine_chunks()
    fref = ray.put(first_tbl)

    def probe(t: pa.Table, *, fref) -> pa.Table:
        first = ray.get(fref)
        j = t.join(first, keys="user_id")
        off = pc.subtract(pc.cast(j["day"], pa.int64()), pc.cast(j["cohort"], pa.int64()))
        g = (
            pa.table({"cohort": j["cohort"], "offset": off})
            .group_by(["cohort", "offset"])
            .aggregate([("offset", "count")])
        )
        return pa.table(
            {
                "cohort": pc.cast(g["cohort"], pa.int64()),
                "offset": g["offset"],
                "n": pc.cast(g["offset_count"], pa.int64()),
            }
        )

    grid = (
        days.map_batches(probe, batch_format="pyarrow", fn_kwargs={"fref": fref})
        .groupby(["cohort", "offset"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    users = (
        first_tbl.group_by("cohort").aggregate([("cohort", "count")]).to_pandas()
    )
    users = users.rename(columns={"cohort_count": "n_users"})
    users["cohort"] = users["cohort"].astype("int64")
    rows = []
    for cohort, g in grid.groupby("cohort", sort=True):
        g = g.sort_values("offset")
        c0 = int(g.loc[g["offset"] == 0, "n"].iloc[0])
        half = g[g["n"] * 2 >= c0]
        full = g[g["n"] >= c0]
        rows.append(
            {
                "cohort_day": pd.Timestamp("1970-01-01")
                + pd.Timedelta(days=int(cohort)),
                "cohort_i": int(cohort),
                "c0_events": c0,
                "persistence_days": int(half["offset"].max()),
                "full_strength_days": int(full["offset"].max()),
                "max_offset": int(g["offset"].max()),
            }
        )
    out = pd.DataFrame(rows).merge(
        users.rename(columns={"cohort": "cohort_i"}), on="cohort_i"
    )
    for c in ("c0_events", "persistence_days", "full_strength_days",
              "max_offset", "n_users"):
        out[c] = out[c].astype("int64")
    out = out.sort_values("cohort_day").reset_index(drop=True)
    return out[["cohort_day", "n_users", "c0_events", "persistence_days",
                "full_strength_days", "max_offset"]]


def cohort_persistence_sql() -> str:
    return """
        WITH f AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
            FROM events GROUP BY 1
        ), g AS (
            SELECT f.cohort,
                   CAST(ts AS DATE) - f.cohort AS off,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events e JOIN f USING (user_id)
            GROUP BY 1, 2
        ), c0 AS (
            SELECT cohort, n AS c0_events FROM g WHERE off = 0
        ), u AS (
            SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM f GROUP BY 1
        )
        SELECT CAST(g.cohort AS TIMESTAMP) AS cohort_day,
               u.n_users,
               CAST(c0.c0_events AS BIGINT) AS c0_events,
               CAST(MAX(g.off) FILTER (
                   WHERE g.n * 2 >= c0.c0_events) AS BIGINT)
                   AS persistence_days,
               CAST(MAX(g.off) FILTER (
                   WHERE g.n >= c0.c0_events) AS BIGINT)
                   AS full_strength_days,
               CAST(MAX(g.off) AS BIGINT) AS max_offset
        FROM g
        JOIN c0 USING (cohort)
        JOIN u USING (cohort)
        GROUP BY g.cohort, u.n_users, c0.c0_events
        ORDER BY cohort_day
    """


def order_value_sign_test(sf_dir: str) -> pd.DataFrame:
    """Sign-test sufficient statistics for within-customer order-value
    trend: over every consecutive same-customer order pair (by
    o_orderdate, o_orderkey tie order), counts of value increases,
    decreases and exact ties in cents — under the no-trend null,
    ups ~ Binomial(ups+downs, 1/2); the exact integer counts are the
    whole test, no float ever. Also the up-count in ppm of decided
    pairs.

    Distributed plan: one groupby(o_custkey) shuffle; per-group signs
    are a vectorized diff; only three integers per group cross the
    second (tiny) fold."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        us = df["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
        ok = df["o_orderkey"].to_numpy()
        order = np.lexsort((ok, us))
        cents = (
            np.round(df["o_totalprice"].to_numpy() * 100).astype("int64")[order]
        )
        d = np.diff(cents)
        return pd.DataFrame(
            {
                "n_up": [int((d > 0).sum())],
                "n_down": [int((d < 0).sum())],
                "n_tie": [int((d == 0).sum())],
            }
        )

    folded = (
        ds.groupby("o_custkey")
        .map_groups(per_cust, batch_format="pandas")
        .aggregate(
            Sum("n_up", alias_name="n_up"),
            Sum("n_down", alias_name="n_down"),
            Sum("n_tie", alias_name="n_tie"),
        )
    )
    up, down, tie = int(folded["n_up"]), int(folded["n_down"]), int(folded["n_tie"])
    out = pd.DataFrame(
        {
            "n_pairs": [up + down + tie],
            "n_up": [up],
            "n_down": [down],
            "n_tie": [tie],
            "up_share_ppm": [up * 1_000_000 // (up + down) if up + down else 0],
        }
    )
    return out.astype("int64")


def order_value_sign_test_sql() -> str:
    return """
        WITH s AS (
            SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   - LAG(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS d
            FROM orders
        ), c AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_up,
                   CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_down,
                   CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_tie
            FROM s WHERE d IS NOT NULL
        )
        SELECT n_pairs, n_up, n_down, n_tie,
               CAST(CASE WHEN n_up + n_down > 0
                         THEN n_up * 1000000 // (n_up + n_down)
                         ELSE 0 END AS BIGINT) AS up_share_ppm
        FROM c
    """


def aa_split_invariance(sf_dir: str, n_salts: int = 8) -> pd.DataFrame:
    """A/A harness for the experiment-assignment hash: split events
    into two arms by the parity of md5(event_id || '|' || salt) under
    `n_salts` different salts and compare arm mean values (floor
    micro-cents). A biased splitter shows a systematic arm gap; a good
    one shows small, sign-balanced gaps. All numbers exact integers —
    per salt: arm sizes, arm means, and the signed mean gap.

    Distributed plan: one pass; per-batch partials carry 2 x n_salts
    (sum, count) cells, so the exchange is O(n_salts) per block and
    the gap arithmetic runs on the folded grid."""
    from pdfrust_ray.functions.md5vec import md5_prefix_u32

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t["event_id"].to_pylist()
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        salts, arms, sums, counts = [], [], [], []
        for s in range(n_salts):
            keys = [f"{i}|{s}".encode() for i in ids]
            arm = (md5_prefix_u32(keys) & 1).astype(np.int64)
            for a in (0, 1):
                m = arm == a
                salts.append(s)
                arms.append(a)
                sums.append(int(cents[m].sum()))
                counts.append(int(m.sum()))
        return pa.table(
            {
                "salt": pa.array(salts, pa.int64()),
                "arm": pa.array(arms, pa.int64()),
                "cents": pa.array(sums, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    grid = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["salt", "arm"])
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    grid["mean_ucents"] = (grid["cents"] * 1_000_000 // grid["n"]).astype("int64")
    piv = grid.pivot_table(index="salt", columns="arm", values=["n", "mean_ucents"])
    rows = []
    for s in sorted(piv.index):
        rows.append(
            {
                "salt": int(s),
                "n_arm0": int(piv.loc[s, ("n", 0)]),
                "n_arm1": int(piv.loc[s, ("n", 1)]),
                "mean0_ucents": int(piv.loc[s, ("mean_ucents", 0)]),
                "mean1_ucents": int(piv.loc[s, ("mean_ucents", 1)]),
            }
        )
    out = pd.DataFrame(rows)
    out["gap_ucents"] = out["mean1_ucents"] - out["mean0_ucents"]
    return out.astype("int64")[
        ["salt", "n_arm0", "n_arm1", "mean0_ucents", "mean1_ucents", "gap_ucents"]
    ]


def aa_split_invariance_sql(n_salts: int = 8) -> str:
    arms = []
    for s in range(n_salts):
        arms.append(f"""
            SELECT {s} AS salt,
                   CAST(CAST(('0x' || substr(md5(
                       CAST(event_id AS VARCHAR) || '|{s}'), 1, 8))
                       AS UBIGINT) % 2 AS BIGINT) AS arm,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events""")
    union = " UNION ALL ".join(arms)
    return f"""
        WITH tagged AS ({union}),
        cell AS (
            SELECT salt, arm,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) * 1000000 // COUNT(*) AS BIGINT)
                       AS mean_ucents
            FROM tagged GROUP BY 1, 2
        )
        SELECT salt,
               MAX(CASE WHEN arm = 0 THEN n END) AS n_arm0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n_arm1,
               MAX(CASE WHEN arm = 0 THEN mean_ucents END) AS mean0_ucents,
               MAX(CASE WHEN arm = 1 THEN mean_ucents END) AS mean1_ucents,
               CAST(MAX(CASE WHEN arm = 1 THEN mean_ucents END)
                    - MAX(CASE WHEN arm = 0 THEN mean_ucents END) AS BIGINT)
                   AS gap_ucents
        FROM cell GROUP BY salt ORDER BY salt
    """


def daily_type_mix_drift(sf_dir: str) -> pd.DataFrame:
    """Day-over-day event-type mix drift as EXACT weighted Jaccard:
    for each adjacent day pair, sum over types of min(count_a, count_b)
    over sum of max(count_a, count_b) — 1.0 means identical mixes,
    falling toward 0 as the mix rotates. Output per day: the exact
    integer numerator/denominator vs the previous day plus the floor
    ppm similarity (first day omitted).

    Distributed plan: per-batch (day, type) partials bound the
    exchange; the adjacent-day comparison is vectorized on the bounded
    folded grid."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")), unit="day"),
            pa.date32(),
        )
        g = (
            pa.table({"day": day, "event_type": t["event_type"]})
            .group_by(["day", "event_type"])
            .aggregate([("event_type", "count")])
        )
        return pa.table(
            {
                "day": g["day"],
                "event_type": g["event_type"],
                "n": pc.cast(g["event_type_count"], pa.int64()),
            }
        )

    grid = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = (
        grid.pivot_table(index="day", columns="event_type", values="n", fill_value=0)
        .sort_index()
    )
    m = piv.to_numpy().astype("int64")
    days = list(piv.index)
    mins = np.minimum(m[1:], m[:-1]).sum(axis=1)
    maxs = np.maximum(m[1:], m[:-1]).sum(axis=1)
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(days[1:]),
            "jaccard_num": mins.astype("int64"),
            "jaccard_den": maxs.astype("int64"),
        }
    )
    out["similarity_ppm"] = (
        out["jaccard_num"] * 1_000_000 // out["jaccard_den"]
    ).astype("int64")
    return out.reset_index(drop=True)


def daily_type_mix_drift_sql() -> str:
    return """
        WITH g AS (
            SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), days AS (
            SELECT DISTINCT day FROM g
        ), types AS (
            SELECT DISTINCT event_type FROM g
        ), dense AS (
            SELECT d.day, t.event_type, COALESCE(g.n, 0) AS n
            FROM days d CROSS JOIN types t
            LEFT JOIN g ON g.day = d.day AND g.event_type = t.event_type
        ), lagged AS (
            SELECT day, event_type, n,
                   LAG(n) OVER (PARTITION BY event_type ORDER BY day)
                       AS pn
            FROM dense
        )
        SELECT day,
               CAST(SUM(LEAST(n, pn)) AS BIGINT) AS jaccard_num,
               CAST(SUM(GREATEST(n, pn)) AS BIGINT) AS jaccard_den,
               CAST(SUM(LEAST(n, pn)) * 1000000 // SUM(GREATEST(n, pn))
                    AS BIGINT) AS similarity_ppm
        FROM lagged WHERE pn IS NOT NULL
        GROUP BY day ORDER BY day
    """

def hdr_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """HDR log-linear quantile sketch, fully deterministic: value
    cents bucketed by bit-length with 3 sub-bucket bits (bucket =
    (bl-3)*8 + (v >> (bl-4)) for v >= 8, = v below) — relative error
    <= 12.5% by construction, and buckets merge by addition (the
    mergeable-sketch property that makes it distributed-safe). The
    query surface answers q50/q90/q99: per quantile, the selected
    bucket's [lo, hi] cent bounds and cumulative position — every
    number an exact integer, so the SQL twin reproduces the sketch
    bit-for-bit (unlike t-digest/DDSketch floats).

    Distributed plan: per-batch partial bucket counts (<= 8 per octave,
    ~500 buckets total) bound the exchange; quantile selection runs on
    the folded census. Certificate test pins the <= 12.5% relative
    error against the exact sorted quantile."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def prep(t: pa.Table) -> pa.Table:
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        v = np.maximum(v, 1)
        bl = _bit_length_exact(v) + 1  # bit length
        bucket = np.where(v < 8, v, (bl - 3) * 8 + (v >> np.maximum(bl - 4, 0)))
        u, c = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": u.astype(np.int64), "n": c.astype(np.int64)})

    census = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    n_total = int(census["n"].sum())
    cum = census["n"].cumsum().to_numpy()
    buckets = census["bucket"].to_numpy()

    def bounds(b: int):
        # inverse of the bucketing: b = (bl-3)*8 + m, m = (v >> (bl-4))
        # in [8, 15], so b // 8 == bl - 2 and m == b % 8 + 8
        if b < 8:
            return b, b
        bl = b // 8 + 2
        m = b % 8 + 8
        return m << (bl - 4), ((m + 1) << (bl - 4)) - 1

    rows = []
    for q_num, q_den, label in ((1, 2, 50), (9, 10, 90), (99, 100, 99)):
        pos = (n_total * q_num + q_den - 1) // q_den
        i = int(np.searchsorted(cum, pos))
        b = int(buckets[i])
        lo, hi = bounds(b)
        rows.append(
            {
                "quantile_pct": label,
                "bucket": b,
                "lo_cents": lo,
                "hi_cents": hi,
                "cum_n": int(cum[i]),
                "n_total": n_total,
            }
        )
    return pd.DataFrame(rows).astype("int64")


def hdr_quantile_sketch_sql() -> str:
    return """
        WITH v AS (
            SELECT GREATEST(CAST(ROUND(value * 100) AS BIGINT), 1) AS c
            FROM events
        ), b AS (
            SELECT CASE WHEN c < 8 THEN c
                        ELSE (length(bin(c)) - 3) * 8
                             + (c >> (length(bin(c)) - 4)) END AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM v GROUP BY 1
        ), cum AS (
            SELECT bucket, n,
                   SUM(n) OVER (ORDER BY bucket) AS cum_n,
                   (SELECT SUM(n) FROM b) AS n_total
            FROM b
        ), qs AS (
            SELECT * FROM (VALUES (50, 1, 2), (90, 9, 10), (99, 99, 100))
                AS t(quantile_pct, q_num, q_den)
        ), sel AS (
            SELECT q.quantile_pct, c.bucket, c.cum_n, c.n_total,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.quantile_pct ORDER BY c.bucket) AS rk
            FROM qs q JOIN cum c
              ON c.cum_n >= (c.n_total * q.q_num + q.q_den - 1) // q.q_den
        )
        SELECT CAST(quantile_pct AS BIGINT) AS quantile_pct,
               CAST(bucket AS BIGINT) AS bucket,
               CAST(CASE WHEN bucket < 8 THEN bucket
                         ELSE (bucket % 8 + 8) << (bucket // 8 - 2)
                    END AS BIGINT) AS lo_cents,
               CAST(CASE WHEN bucket < 8 THEN bucket
                         ELSE ((bucket % 8 + 9) << (bucket // 8 - 2)) - 1
                    END AS BIGINT) AS hi_cents,
               CAST(cum_n AS BIGINT) AS cum_n,
               CAST(n_total AS BIGINT) AS n_total
        FROM sel WHERE rk = 1 ORDER BY quantile_pct
    """


def discount_return_contingency(sf_dir: str, cut_bp: int = 5) -> pd.DataFrame:
    """Does discounting drive returns? 2x2 contingency of (discount >
    cut_bp basis points) x (l_returnflag = 'R') with the exact integer
    odds cross-products n11*n00 and n10*n01 — n11*n00 > n10*n01 means
    discounted lines return MORE often (odds ratio > 1) without ever
    leaving integers. Also each cell's return rate in floor ppm.

    Distributed plan: one pass of per-batch 2x2 partial counts (4 rows
    per block); all derived numbers computed on the folded 2x2."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_returnflag"]
    )

    def prep(t: pa.Table) -> pa.Table:
        disc_bp = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        hi = pc.cast(pc.greater(disc_bp, cut_bp), pa.int64())
        ret = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        g = (
            pa.table({"discounted": hi, "returned": ret})
            .group_by(["discounted", "returned"])
            .aggregate([("returned", "count")])
        )
        return pa.table(
            {
                "discounted": g["discounted"],
                "returned": g["returned"],
                "n": pc.cast(g["returned_count"], pa.int64()),
            }
        )

    cells = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["discounted", "returned"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    m = {
        (int(r["discounted"]), int(r["returned"])): int(r["n"])
        for _, r in cells.iterrows()
    }
    n11, n10 = m.get((1, 1), 0), m.get((1, 0), 0)
    n01, n00 = m.get((0, 1), 0), m.get((0, 0), 0)
    out = pd.DataFrame(
        {
            "n_disc_ret": [n11],
            "n_disc_kept": [n10],
            "n_plain_ret": [n01],
            "n_plain_kept": [n00],
            "odds_num": [n11 * n00],
            "odds_den": [n10 * n01],
            "disc_ret_ppm": [n11 * 1_000_000 // (n11 + n10) if n11 + n10 else 0],
            "plain_ret_ppm": [n01 * 1_000_000 // (n01 + n00) if n01 + n00 else 0],
        }
    )
    return out.astype("int64")


def discount_return_contingency_sql(cut_bp: int = 5) -> str:
    return f"""
        WITH c AS (
            SELECT CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT)
                             > {cut_bp} THEN 1 ELSE 0 END AS d,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
            FROM lineitem
        ), m AS (
            SELECT
                CAST(SUM(CASE WHEN d=1 AND r=1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                CAST(SUM(CASE WHEN d=1 AND r=0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                CAST(SUM(CASE WHEN d=0 AND r=1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                CAST(SUM(CASE WHEN d=0 AND r=0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
            FROM c
        )
        SELECT n11 AS n_disc_ret, n10 AS n_disc_kept,
               n01 AS n_plain_ret, n00 AS n_plain_kept,
               CAST(n11 * n00 AS BIGINT) AS odds_num,
               CAST(n10 * n01 AS BIGINT) AS odds_den,
               CAST(CASE WHEN n11 + n10 > 0
                         THEN n11 * 1000000 // (n11 + n10) ELSE 0 END
                    AS BIGINT) AS disc_ret_ppm,
               CAST(CASE WHEN n01 + n00 > 0
                         THEN n01 * 1000000 // (n01 + n00) ELSE 0 END
                    AS BIGINT) AS plain_ret_ppm
        FROM m
    """


def linenumber_contiguity_audit(sf_dir: str) -> pd.DataFrame:
    """Line-number integrity audit: within each order, l_linenumber
    should be a contiguous 1..n sequence (no gaps, no duplicates, no
    zero). Census of violation kinds — the upstream-writer bug signal
    (partial retries duplicate lines; lost messages leave gaps). Uses
    the sum/min/max/count fingerprint: a group is contiguous 1..n IFF
    min=1, max=n and sum=n(n+1)/2 — all computable from per-batch
    partials without shipping rows.

    Distributed plan: per-batch partial (orderkey -> count, min, max,
    sum); the verdict per order folds from integers only; the final
    census is a 4-row table."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )

    def prep(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "o": t["l_orderkey"],
                    "ln": pc.cast(t["l_linenumber"], pa.int64()),
                }
            )
            .group_by("o")
            .aggregate([("ln", "count"),
                        ("ln", "min"), ("ln", "max"), ("ln", "sum")])
        )
        return pa.table(
            {
                "o": g["o"],
                "n": pc.cast(g["ln_count"], pa.int64()),
                "mn": g["ln_min"],
                "mx": g["ln_max"],
                "s": g["ln_sum"],
            }
        )

    per_order = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
            Sum("s", alias_name="s"),
        )
        .to_pandas()
    )
    n = per_order["n"].astype("int64")
    mn = per_order["mn"].astype("int64")
    mx = per_order["mx"].astype("int64")
    s = per_order["s"].astype("int64")
    # contiguous 1..n fingerprint: min=1, max=n, sum=n(n+1)/2. A
    # duplicate+gap pair that preserves the sum also breaks min or max
    # only sometimes — the sum identity with min/max bounds is exact
    # for linenumber domains (1..7 in TPC-H): any multiset with min=1,
    # max=n, |..|=n, sum=n(n+1)/2 over integers in [1, n] IS {1..n}
    # iff no duplicates; a duplicate d and missing m shift sum by d-m
    # != 0 unless d=m (impossible). So the fingerprint is exact here.
    ok = (mn == 1) & (mx == n) & (s == n * (n + 1) // 2)
    bad_start = mn != 1
    bad_span = (mn == 1) & (mx != n)
    bad_sum = (mn == 1) & (mx == n) & (s != n * (n + 1) // 2)
    out = pd.DataFrame(
        {
            "verdict": ["contiguous", "bad_start", "bad_span", "bad_sum"],
            "n_orders": [
                int(ok.sum()),
                int(bad_start.sum()),
                int(bad_span.sum()),
                int(bad_sum.sum()),
            ],
        }
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def linenumber_contiguity_audit_sql() -> str:
    return """
        WITH per AS (
            SELECT l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(l_linenumber) AS BIGINT) AS mn,
                   CAST(MAX(l_linenumber) AS BIGINT) AS mx,
                   CAST(SUM(l_linenumber) AS BIGINT) AS s
            FROM lineitem GROUP BY 1
        ), v AS (
            SELECT CASE
                WHEN mn = 1 AND mx = n AND s = n * (n + 1) // 2
                    THEN 'contiguous'
                WHEN mn <> 1 THEN 'bad_start'
                WHEN mx <> n THEN 'bad_span'
                ELSE 'bad_sum' END AS verdict
            FROM per
        ), kinds AS (
            SELECT UNNEST(['contiguous', 'bad_start', 'bad_span',
                           'bad_sum']) AS verdict
        )
        SELECT k.verdict,
               CAST(COALESCE(COUNT(v.verdict), 0) AS BIGINT) AS n_orders
        FROM kinds k LEFT JOIN v ON v.verdict = k.verdict
        GROUP BY k.verdict
        ORDER BY CASE k.verdict WHEN 'contiguous' THEN 0
                                WHEN 'bad_start' THEN 1
                                WHEN 'bad_span' THEN 2 ELSE 3 END
    """


def session_timeout_sensitivity(sf_dir: str) -> pd.DataFrame:
    """Sessionization threshold sensitivity curve: for each candidate
    timeout (the power-of-two second thresholds 1s..2^19s), the exact
    number of sessions the corpus would split into — n_sessions(t) =
    n_users + #{same-user consecutive gaps > t}. The knee of this
    curve is the defensible timeout; picking 30 minutes by folklore is
    what this table replaces. One pass over the SAME per-user gap
    computation as the gap histogram; the curve falls out of a
    bounded threshold fold.

    Distributed plan: one groupby(user_id) shuffle; each group emits
    its gaps' exceedance counts against the 20 thresholds (20-int
    partial); the curve folds from those."""
    import numpy as np

    thresholds = [1 << i for i in range(20)]  # 1s .. ~6 days
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        eid = df["event_id"].to_numpy()
        order = np.lexsort((eid, us))
        gap_s = np.diff(us[order]) // 1_000_000
        exceed = [int((gap_s > t).sum()) for t in thresholds]
        return pd.DataFrame(
            {
                "threshold_s": np.array(thresholds, dtype="int64"),
                "n_exceed": np.array(exceed, dtype="int64"),
                "n_users": np.array([1] * len(thresholds), dtype="int64"),
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("threshold_s")
        .aggregate(
            Sum("n_exceed", alias_name="n_breaks"),
            Sum("n_users", alias_name="n_users"),
        )
        .to_pandas()
        .sort_values("threshold_s")
        .reset_index(drop=True)
    )
    out["threshold_s"] = out["threshold_s"].astype("int64")
    out["n_breaks"] = out["n_breaks"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    out["n_sessions"] = out["n_users"] + out["n_breaks"]
    return out[["threshold_s", "n_breaks", "n_users", "n_sessions"]]


def session_timeout_sensitivity_sql() -> str:
    return """
        WITH nxt AS (
            SELECT user_id, epoch_us(ts) AS us,
                   LEAD(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS nus
            FROM events
        ), g AS (
            SELECT (nus - us) // 1000000 AS gap_s
            FROM nxt WHERE nus IS NOT NULL
        ), th AS (
            SELECT CAST(POWER(2, i) AS BIGINT) AS threshold_s
            FROM UNNEST(generate_series(0, 19)) AS t(i)
        ), u AS (
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events
        )
        SELECT th.threshold_s,
               CAST(COALESCE(SUM(CASE WHEN g.gap_s > th.threshold_s
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_breaks,
               u.n_users,
               CAST(u.n_users
                    + COALESCE(SUM(CASE WHEN g.gap_s > th.threshold_s
                                        THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_sessions
        FROM th CROSS JOIN u LEFT JOIN g ON TRUE
        GROUP BY th.threshold_s, u.n_users
        ORDER BY th.threshold_s
    """


def lang_char_bigram_fingerprint(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Language fingerprint: the classic character-bigram profile —
    per language, the top-k most frequent 2-char substrings (counting
    every position, including spaces) with counts and floor-ppm share
    of the language's bigrams; ties break on the bigram. This is the
    sufficient statistic n-gram language-ID models train on.

    Distributed plan: per-batch (lang, bigram, count) Counter partials
    collapse repeats before the exchange (vocabulary-sized, not
    corpus-sized); one groupby folds, top-k on the folded census."""
    from collections import Counter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def prep(t: pa.Table) -> pa.Table:
        c = Counter()
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for i in range(len(txt) - 1):
                c[(lang, txt[i : i + 2])] += 1
        if not c:
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "bigram": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        langs, bigrams, ns = zip(*[(kk[0], kk[1], v) for kk, v in c.items()])
        return pa.table(
            {"lang": pa.array(langs), "bigram": pa.array(bigrams),
             "n": pa.array(ns, pa.int64())}
        )

    folded = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["lang", "bigram"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    folded["n"] = folded["n"].astype("int64")
    tot = folded.groupby("lang")["n"].transform("sum")
    folded["share_ppm"] = (folded["n"] * 1_000_000 // tot).astype("int64")
    folded = folded.sort_values(["lang", "n", "bigram"], ascending=[True, False, True])
    out = folded.groupby("lang", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("lang").cumcount().astype("int64")
    return out[["lang", "rank", "bigram", "n", "share_ppm"]]


def lang_char_bigram_fingerprint_sql(k: int = 10) -> str:
    return f"""
        WITH pos AS (
            SELECT lang, substr(text, i, 2) AS bigram
            FROM documents,
                 UNNEST(generate_series(1, length(text) - 1)) AS t(i)
        ), c AS (
            SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS n
            FROM pos GROUP BY 1, 2
        ), r AS (
            SELECT lang, bigram, n,
                   CAST(n * 1000000 //
                        SUM(n) OVER (PARTITION BY lang) AS BIGINT)
                       AS share_ppm,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY n DESC, bigram) - 1
                       AS rank
            FROM c
        )
        SELECT lang, CAST(rank AS BIGINT) AS rank, bigram, n, share_ppm
        FROM r WHERE rank < {k} ORDER BY lang, rank
    """


def type_lifecycle(sf_dir: str) -> pd.DataFrame:
    """Event-type lifecycle catalog: per type, first- and last-seen
    day, the number of DISTINCT active days, the calendar span, and
    the floor-ppm occupancy (active days per span day) — the
    deprecation detector: a type whose last_seen lags the corpus
    high-water mark or whose occupancy collapses is on its way out.

    Distributed plan: per-batch (type, day) pre-distinct partials
    bound the exchange at |types x days| rows per block; min/max/
    count-distinct fold on the tiny grid."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")), unit="day"),
            pa.date32(),
        )
        g = (
            pa.table({"event_type": t["event_type"], "day": pc.cast(day, pa.int32())})
            .group_by(["event_type", "day"])
            .aggregate([("day", "count")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "day": pc.cast(g["day"], pa.int64()),
                "n": pc.cast(g["day_count"], pa.int64()),
            }
        )

    grid = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for et, g in grid.groupby("event_type", sort=True):
        lo, hi = int(g["day"].min()), int(g["day"].max())
        active = int(len(g))
        span = hi - lo + 1
        rows.append(
            {
                "event_type": et,
                "first_seen": pd.Timestamp("1970-01-01") + pd.Timedelta(days=lo),
                "last_seen": pd.Timestamp("1970-01-01") + pd.Timedelta(days=hi),
                "active_days": active,
                "span_days": span,
                "n_events": int(g["n"].sum()),
                "occupancy_ppm": active * 1_000_000 // span,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("active_days", "span_days", "n_events", "occupancy_ppm"):
        out[c] = out[c].astype("int64")
    return out


def type_lifecycle_sql() -> str:
    return """
        SELECT event_type,
               CAST(MIN(CAST(ts AS DATE)) AS TIMESTAMP) AS first_seen,
               CAST(MAX(CAST(ts AS DATE)) AS TIMESTAMP) AS last_seen,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS active_days,
               CAST(MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) + 1
                    AS BIGINT) AS span_days,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) * 1000000 //
                    (MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) + 1)
                    AS BIGINT) AS occupancy_ppm
        FROM events GROUP BY event_type ORDER BY event_type
    """


def bracket_balance_audit(sf_dir: str) -> pd.DataFrame:
    """Delimiter-balance audit over documents: per source, how many
    docs have unbalanced parentheses (count '(' != ')'), unbalanced
    square brackets, or an odd number of double quotes — the broken-
    extraction signal (truncated text, mangled markup) a cleaning
    pipeline gates on. Occurrence counting only (not nesting order):
    exactly reproducible in SQL via length-difference arithmetic.

    Distributed plan: vectorized pyarrow count_substring kernels per
    batch; |sources|-row partials fold once."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def prep(t: pa.Table) -> pa.Table:
        txt = t["text"]

        def cnt(pat):
            return pc.cast(pc.count_substring(txt, pat), pa.int64())

        paren_bad = pc.cast(pc.not_equal(cnt("("), cnt(")")), pa.int64())
        brack_bad = pc.cast(pc.not_equal(cnt("["), cnt("]")), pa.int64())
        import numpy as np

        quotes = cnt('"').to_numpy(zero_copy_only=False)
        quote_bad = pa.array((quotes % 2 == 1).astype(np.int64))
        one = pa.array(np.ones(len(txt), np.int64))
        g = (
            pa.table(
                {
                    "source": t["source"],
                    "paren_bad": paren_bad,
                    "brack_bad": brack_bad,
                    "quote_bad": quote_bad,
                    "one": one,
                }
            )
            .group_by("source")
            .aggregate(
                [("paren_bad", "sum"), ("brack_bad", "sum"),
                 ("quote_bad", "sum"), ("one", "sum")]
            )
        )
        return pa.table(
            {
                "source": g["source"],
                "n_docs": g["one_sum"],
                "n_paren_bad": g["paren_bad_sum"],
                "n_bracket_bad": g["brack_bad_sum"],
                "n_quote_odd": g["quote_bad_sum"],
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_paren_bad", alias_name="n_paren_bad"),
            Sum("n_bracket_bad", alias_name="n_bracket_bad"),
            Sum("n_quote_odd", alias_name="n_quote_odd"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for c in out.columns:
        if c != "source":
            out[c] = out[c].astype("int64")
    return out


def bracket_balance_audit_sql() -> str:
    def n(ch):
        return f"(length(text) - length(replace(text, '{ch}', '')))"

    return f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN {n('(')} <> {n(')')} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_paren_bad,
               CAST(SUM(CASE WHEN {n('[')} <> {n(']')} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bracket_bad,
               CAST(SUM(CASE WHEN {n('"')} % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_quote_odd
        FROM documents GROUP BY source ORDER BY source
    """


def weekday_extremes(sf_dir: str) -> pd.DataFrame:
    """Seasonal-peer extremes: each day judged against ITS OWN
    WEEKDAY's peers (Mondays vs Mondays) — per ISO weekday, the
    slowest and busiest day (ties -> earliest date) with counts and
    peer-cohort size. The calendar-aware anomaly shortlist a global
    min/max gets wrong (weekends would dominate both ends).

    Distributed plan: the daily fold is bounded by the calendar; the
    per-weekday argmin/argmax runs on that tiny series driver-side."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")), unit="day"),
            pa.date32(),
        )
        g = pa.table({"day": day}).group_by("day").aggregate([("day", "count")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["day_count"], pa.int64())}
        )

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    daily["day"] = pd.to_datetime(daily["day"])
    daily["dow"] = daily["day"].dt.dayofweek.astype("int64") + 1  # isodow
    rows = []
    for dow, g in daily.groupby("dow", sort=True):
        g = g.sort_values(["n", "day"])
        lo = g.iloc[0]
        g2 = g.sort_values(["n", "day"], ascending=[False, True])
        hi = g2.iloc[0]
        rows.append(
            {
                "dow": int(dow),
                "n_peers": int(len(g)),
                "min_day": lo["day"],
                "min_n": int(lo["n"]),
                "max_day": hi["day"],
                "max_n": int(hi["n"]),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("dow", "n_peers", "min_n", "max_n"):
        out[c] = out[c].astype("int64")
    return out[["dow", "n_peers", "min_day", "min_n", "max_day", "max_n"]]


def weekday_extremes_sql() -> str:
    return """
        WITH d AS (
            SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ), w AS (
            SELECT day, n, CAST(isodow(day) AS BIGINT) AS dow,
                   ROW_NUMBER() OVER (PARTITION BY isodow(day)
                                      ORDER BY n, day) AS rlo,
                   ROW_NUMBER() OVER (PARTITION BY isodow(day)
                                      ORDER BY n DESC, day) AS rhi,
                   COUNT(*) OVER (PARTITION BY isodow(day)) AS cnt
            FROM d
        )
        SELECT dow,
               CAST(MAX(cnt) AS BIGINT) AS n_peers,
               MAX(CASE WHEN rlo = 1 THEN day END) AS min_day,
               CAST(MAX(CASE WHEN rlo = 1 THEN n END) AS BIGINT) AS min_n,
               MAX(CASE WHEN rhi = 1 THEN day END) AS max_day,
               CAST(MAX(CASE WHEN rhi = 1 THEN n END) AS BIGINT) AS max_n
        FROM w GROUP BY dow ORDER BY dow
    """


def customer_growth_bands(sf_dir: str) -> pd.DataFrame:
    """First-vs-last order growth bands: per repeat customer, the
    ratio of their LAST order value to their FIRST (by o_orderdate,
    o_orderkey order), folded into exact power-of-two ratio bands
    (band = floor(log2(last*256 // first)) - 8, so band 0 = roughly
    flat, +1 = 2-4x growth, -1 = halved) — the expansion/contraction
    pyramid a revenue team reads. Census per band with floor-ppm share
    of repeat customers.

    Distributed plan: one groupby(custkey) shuffle emitting a single
    (band) row per repeat customer; tiny census fold."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"band": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        us = df["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
        ok = df["o_orderkey"].to_numpy()
        order = np.lexsort((ok, us))
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype("int64")
        first, last = int(cents[order[0]]), int(cents[order[-1]])
        # fixed-point ratio, 8 frac bits; clamp to >= 1 so collapses
        # below 1/256x floor at band -8 (bin(0) would diverge between
        # Python bit_length and DuckDB bin())
        ratio_q = max(last * 256 // first, 1)
        band = int(ratio_q).bit_length() - 1 - 8
        return pd.DataFrame({"band": [band], "n": [1]})

    out = (
        ds.groupby("o_custkey")
        .map_groups(per_cust, batch_format="pandas")
        .groupby("band")
        .aggregate(Sum("n", alias_name="n_customers"))
        .to_pandas()
        .sort_values("band")
        .reset_index(drop=True)
    )
    total = int(out["n_customers"].sum())
    out["band"] = out["band"].astype("int64")
    out["n_customers"] = out["n_customers"].astype("int64")
    out["share_ppm"] = (out["n_customers"] * 1_000_000 // total).astype("int64")
    return out[["band", "n_customers", "share_ppm"]]


def customer_growth_bands_sql() -> str:
    return """
        WITH o AS (
            SELECT o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER w AS rn,
                   COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
        ), fl AS (
            SELECT o_custkey,
                   MAX(CASE WHEN rn = 1 THEN cents END) AS first_c,
                   MAX(CASE WHEN rn = cnt THEN cents END) AS last_c
            FROM o WHERE cnt >= 2 GROUP BY o_custkey
        ), b AS (
            SELECT CAST(length(bin(GREATEST(last_c * 256 // first_c, 1)))
                        - 1 - 8 AS BIGINT) AS band
            FROM fl
        ), c AS (
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM b GROUP BY band
        )
        SELECT band, n_customers,
               CAST(n_customers * 1000000 //
                    (SELECT SUM(n_customers) FROM c) AS BIGINT)
                   AS share_ppm
        FROM c ORDER BY band
    """


_JOINKEY_COLS = (
    ("customer", "c_custkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def key_joinability_census(sf_dir: str) -> pd.DataFrame:
    """Automated join-key discovery (the Aurum/Valentine primitive):
    for every pair of candidate key columns across tables, the exact
    distinct-domain sizes, intersection size, Jaccard (floor ppm) and
    containment of A in B (floor ppm) — high containment with low
    Jaccard is the FK signature, near-1 Jaccard the same-entity
    signature. Candidates here: customer.c_custkey, orders.o_custkey,
    events.user_id.

    Distributed plan: each column folds to its distinct-key set with
    per-batch unique partials (at 100-TB scale the KMV sibling
    kmv_joinability_estimate replaces the exact fold — same output
    schema, bounded error); the pairwise set algebra runs on the
    folded key sets."""
    import numpy as np

    sets = {}
    for table, col in _JOINKEY_COLS:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def prep(t: pa.Table, *, col=col) -> pa.Table:
            u = pc.unique(t[col])
            return pa.table({"k": pc.cast(u, pa.int64())})

        folded = (
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Count(alias_name="c"))
            .to_pandas()
        )
        sets[f"{table}.{col}"] = np.sort(folded["k"].to_numpy().astype("int64"))

    names = sorted(sets)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            A, B = sets[a], sets[b]
            inter = int(len(np.intersect1d(A, B, assume_unique=True)))
            union = len(A) + len(B) - inter
            rows.append(
                {
                    "col_a": a,
                    "col_b": b,
                    "n_a": len(A),
                    "n_b": len(B),
                    "n_inter": inter,
                    "jaccard_ppm": inter * 1_000_000 // union if union else 0,
                    "containment_a_ppm": inter * 1_000_000 // len(A) if len(A) else 0,
                }
            )
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c not in ("col_a", "col_b"):
            out[c] = out[c].astype("int64")
    return out


def key_joinability_census_sql() -> str:
    cols = [f"{t}.{c}" for t, c in _JOINKEY_COLS]
    selects = {
        "customer.c_custkey": "SELECT DISTINCT c_custkey AS k FROM customer",
        "orders.o_custkey": "SELECT DISTINCT o_custkey AS k FROM orders",
        "events.user_id": "SELECT DISTINCT user_id AS k FROM events",
    }
    pair_sql = []
    names = sorted(cols)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            pair_sql.append(f"""
        SELECT '{a}' AS col_a, '{b}' AS col_b,
               CAST((SELECT COUNT(*) FROM ({selects[a]})) AS BIGINT) AS n_a,
               CAST((SELECT COUNT(*) FROM ({selects[b]})) AS BIGINT) AS n_b,
               CAST((SELECT COUNT(*) FROM ({selects[a]})
                     WHERE k IN (SELECT k FROM ({selects[b]}))) AS BIGINT)
                   AS n_inter""")
    union = " UNION ALL ".join(pair_sql)
    return f"""
        WITH pairs AS ({union})
        SELECT col_a, col_b, n_a, n_b, n_inter,
               CAST(CASE WHEN n_a + n_b - n_inter > 0
                         THEN n_inter * 1000000 // (n_a + n_b - n_inter)
                         ELSE 0 END AS BIGINT) AS jaccard_ppm,
               CAST(CASE WHEN n_a > 0
                         THEN n_inter * 1000000 // n_a
                         ELSE 0 END AS BIGINT) AS containment_a_ppm
        FROM pairs ORDER BY col_a, col_b
    """


def kmv_joinability_estimate(sf_dir: str, k: int = 256) -> pd.DataFrame:
    """The 100-TB scale path for key_joinability_census: each column
    folds to a mergeable KMV (bottom-k) sketch instead of its full
    distinct set, and the pairwise Jaccard is estimated from the
    sketches' shared bottom-k region (|A∩B on the union's bottom-k| /
    k) — constant memory per column regardless of key cardinality.
    Output mirrors the exact census plus the estimate error vs exact
    at fixture scale (pinned <= tolerance in tests).

    No SQL oracle: the sketch is sampling-based; the recall/error test
    against the exact census is the evidence."""
    import numpy as np

    from pdfrust_ray.stages.sketches import _kmv_merge, _kmv_partial, _splitmix64

    sketches = {}
    for table, col in _JOINKEY_COLS:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def prep(t: pa.Table, *, col=col) -> pa.Table:
            ids = pc.cast(t[col], pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({"blob": pa.array([_kmv_partial(ids, k)], pa.binary())})

        blobs = ds.map_batches(prep, batch_format="pyarrow").to_pandas()["blob"]
        sketches[f"{table}.{col}"] = _kmv_merge(list(blobs), k)

    exact = key_joinability_census(sf_dir).set_index(["col_a", "col_b"])
    names = sorted(sketches)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            A, B = sketches[a], sketches[b]
            u = np.unique(np.concatenate([A, B]))[:k]
            # estimate: fraction of the union's bottom-k present in both
            both = np.intersect1d(A, B, assume_unique=True)
            inter_in_u = int(np.isin(both, u, assume_unique=True).sum())
            est_ppm = inter_in_u * 1_000_000 // max(len(u), 1)
            ex = exact.loc[(a, b)]
            rows.append(
                {
                    "col_a": a,
                    "col_b": b,
                    "est_jaccard_ppm": est_ppm,
                    "exact_jaccard_ppm": int(ex["jaccard_ppm"]),
                    "abs_err_ppm": abs(est_ppm - int(ex["jaccard_ppm"])),
                }
            )
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c not in ("col_a", "col_b"):
            out[c] = out[c].astype("int64")
    return out


def brand_price_size_regression(sf_dir: str) -> pd.DataFrame:
    """Per-brand price-vs-size least squares as EXACT integer
    sufficient statistics: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    kept as numerator/denominator (cents x size units), plus the
    floor milli-cents-per-size-unit slope — does a bigger part cost
    more, per brand, with no float in the pipeline.

    Distributed plan: per-batch partial (brand -> n, Sx, Sy, Sxy,
    Sxx) bound the exchange at |brands| rows per block; the slope
    arithmetic runs on the folded table."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_size", "p_retailprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        x = pc.cast(t["p_size"], pa.int64())
        y = _cents(t["p_retailprice"])
        xy = pc.multiply(x, y)
        xx = pc.multiply(x, x)
        one = pa.array(np.ones(len(x), np.int64))
        g = (
            pa.table(
                {"p_brand": t["p_brand"], "n": one, "sx": x, "sy": y,
                 "sxy": xy, "sxx": xx}
            )
            .group_by("p_brand")
            .aggregate([("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                        ("sxy", "sum"), ("sxx", "sum")])
        )
        return pa.table(
            {
                "p_brand": g["p_brand"],
                "n": g["n_sum"], "sx": g["sx_sum"], "sy": g["sy_sum"],
                "sxy": g["sxy_sum"], "sxx": g["sxx_sum"],
            }
        )

    f = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
        .sort_values("p_brand")
        .reset_index(drop=True)
    )
    for c in ("n", "sx", "sy", "sxy", "sxx"):
        f[c] = f[c].astype("int64")
    f["slope_num"] = f["n"] * f["sxy"] - f["sx"] * f["sy"]
    f["slope_den"] = f["n"] * f["sxx"] - f["sx"] * f["sx"]
    f["slope_mcents_per_unit"] = (
        f["slope_num"] * 1000 // f["slope_den"]
    ).astype("int64")
    return f[["p_brand", "n", "slope_num", "slope_den", "slope_mcents_per_unit"]]


def brand_price_size_regression_sql() -> str:
    return """
        WITH s AS (
            SELECT p_brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(p_size) AS BIGINT) AS sx,
                   CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT))
                        AS BIGINT) AS sy,
                   CAST(SUM(p_size * CAST(ROUND(p_retailprice * 100)
                                          AS BIGINT)) AS BIGINT) AS sxy,
                   CAST(SUM(CAST(p_size AS BIGINT) * p_size) AS BIGINT)
                       AS sxx
            FROM part GROUP BY 1
        )
        SELECT p_brand, n,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
               -- explicit FLOOR division (DuckDB // truncates toward
               -- zero on negatives; Python // floors): (a - mod) / b
               CAST(((n * sxy - sx * sy) * 1000
                     - ((((n * sxy - sx * sy) * 1000)
                         % (n * sxx - sx * sx)
                         + (n * sxx - sx * sx))
                        % (n * sxx - sx * sx)))
                    // (n * sxx - sx * sx) AS BIGINT)
                   AS slope_mcents_per_unit
        FROM s ORDER BY p_brand
    """


def user_dow_concentration_bands(sf_dir: str) -> pd.DataFrame:
    """Schedule-regularity pyramid: per user, the floor-ppm share of
    their events falling on their SINGLE busiest weekday (ties ->
    smallest ISO dow), folded into ppm-decile bands — humans spread
    across the week (~140-300k ppm), cron jobs and bots pin one
    weekday (toward 1M ppm). Census per band of 100k ppm.

    Distributed plan: per-batch (user, dow) partials, one
    groupby(user, dow) fold, per-user argmax on a 7-row group, then a
    10-row band census."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        dow = pc.cast(
            pc.add(pc.day_of_week(pc.cast(t["ts"], pa.timestamp("us"))), 1),
            pa.int64(),
        )
        g = (
            pa.table({"user_id": t["user_id"], "dow": dow})
            .group_by(["user_id", "dow"])
            .aggregate([("dow", "count")])
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "dow": g["dow"],
                "n": pc.cast(g["dow_count"], pa.int64()),
            }
        )

    grid = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "dow"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tot = grid.groupby("user_id")["n"].transform("sum")
    grid["total"] = tot
    grid = grid.sort_values(["user_id", "n", "dow"], ascending=[True, False, True])
    top = grid.groupby("user_id", sort=True).first().reset_index()
    top["conc_ppm"] = (top["n"] * 1_000_000 // top["total"]).astype("int64")
    top["band"] = (top["conc_ppm"] // 100_000).clip(upper=9).astype("int64")
    out = (
        top.groupby("band").size().rename("n_users").reset_index()
    )
    out["band"] = out["band"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    out["band_lo_ppm"] = (out["band"] * 100_000).astype("int64")
    return out[["band", "band_lo_ppm", "n_users"]]


def user_dow_concentration_bands_sql() -> str:
    return """
        WITH g AS (
            SELECT user_id, CAST(isodow(ts) AS BIGINT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), r AS (
            SELECT user_id, n,
                   SUM(n) OVER (PARTITION BY user_id) AS total,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY n DESC, dow) AS rk
            FROM g
        ), conc AS (
            SELECT LEAST(n * 1000000 // total // 100000, 9) AS band
            FROM r WHERE rk = 1
        )
        SELECT CAST(band AS BIGINT) AS band,
               CAST(band * 100000 AS BIGINT) AS band_lo_ppm,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM conc GROUP BY band ORDER BY band
    """


def order_status_return_mix(sf_dir: str) -> pd.DataFrame:
    """Cross-table state-consistency audit: per order status, how many
    orders had ALL / SOME / NONE of their lineitems returned
    (l_returnflag = 'R') — if statuses encode fulfilment state, the
    mix exposes whether the two tables actually agree (an 'F' order
    with every line returned is a contradiction worth a ticket).

    Distributed plan: lineitem folds to per-order (n_lines, n_returned)
    with per-batch partials; the orders-side status projection
    broadcasts once (ray.put) and the verdict census folds to
    |statuses| x 3 rows."""
    status = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )
    sref = ray.put(status)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )

    def prep(t: pa.Table) -> pa.Table:
        import numpy as np

        ret = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        g = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "ret": ret,
                    "one": pa.array(np.ones(len(ret), np.int64)),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("ret", "sum"), ("one", "sum")])
        )
        return pa.table(
            {
                "l_orderkey": g["l_orderkey"],
                "n_ret": g["ret_sum"],
                "n_lines": g["one_sum"],
            }
        )

    per_order = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("n_ret", alias_name="n_ret"), Sum("n_lines", alias_name="n_lines"))
    )

    def verdict(t: pa.Table, *, sref) -> pa.Table:
        status = ray.get(sref)
        j = t.join(status, keys="l_orderkey", right_keys="o_orderkey")
        import numpy as np

        n_ret = j["n_ret"].to_numpy(zero_copy_only=False)
        n_lines = j["n_lines"].to_numpy(zero_copy_only=False)
        mix = np.where(n_ret == 0, "none", np.where(n_ret == n_lines, "all", "some"))
        g = (
            pa.table({"o_orderstatus": j["o_orderstatus"], "return_mix": pa.array(mix.tolist())})
            .group_by(["o_orderstatus", "return_mix"])
            .aggregate([("return_mix", "count")])
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "return_mix": g["return_mix"],
                "n": pc.cast(g["return_mix_count"], pa.int64()),
            }
        )

    out = (
        per_order.map_batches(verdict, batch_format="pyarrow", fn_kwargs={"sref": sref})
        .groupby(["o_orderstatus", "return_mix"])
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
        .sort_values(["o_orderstatus", "return_mix"])
        .reset_index(drop=True)
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    tot = out.groupby("o_orderstatus")["n_orders"].transform("sum")
    out["status_share_ppm"] = (out["n_orders"] * 1_000_000 // tot).astype("int64")
    return out[["o_orderstatus", "return_mix", "n_orders", "status_share_ppm"]]


def order_status_return_mix_sql() -> str:
    return """
        WITH per AS (
            SELECT l_orderkey,
                   CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ret,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem GROUP BY 1
        ), v AS (
            SELECT o.o_orderstatus,
                   CASE WHEN p.n_ret = 0 THEN 'none'
                        WHEN p.n_ret = p.n_lines THEN 'all'
                        ELSE 'some' END AS return_mix
            FROM per p JOIN orders o ON p.l_orderkey = o.o_orderkey
        ), c AS (
            SELECT o_orderstatus, return_mix,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM v GROUP BY 1, 2
        )
        SELECT o_orderstatus, return_mix, n_orders,
               CAST(n_orders * 1000000 //
                    SUM(n_orders) OVER (PARTITION BY o_orderstatus)
                    AS BIGINT) AS status_share_ppm
        FROM c ORDER BY o_orderstatus, return_mix
    """


def value_tail_hill(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """Heavy-tail detector: the Hill tail-index estimator over each
    event type's top-k values — alpha_hat = k / sum(ln(x_i / x_k)),
    where x_1..x_k are the k largest cents and x_k the threshold.
    Small alpha (<2) means the tail is so heavy that means are
    unstable and clipping/winsorization is mandatory before training
    on the value column. Per-term ln is quantized to nano-nats BEFORE
    summation (the bm25/bigram-LM precedent: one libm call per term,
    identical in DuckDB), so the sum and the floor-milli alpha are
    bit-stable integers.

    Distributed plan: per-batch local top-k per type caps the exchange
    at k x |types| rows per block; the Hill arithmetic runs on the
    folded top-k."""
    import math

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def local_topk(t: pa.Table) -> pa.Table:
        import pandas as _pd

        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_pylist()
        df = _pd.DataFrame({"event_type": et, "cents": cents})
        out = (
            df.sort_values(["event_type", "cents"], ascending=[True, False])
            .groupby("event_type")
            .head(k)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    folded = (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(
            lambda df: df.sort_values("cents", ascending=False).head(k),
            batch_format="pandas",
        )
        .to_pandas()
    )
    rows = []
    for et, g in folded.groupby("event_type", sort=True):
        v = np.sort(g["cents"].to_numpy())[::-1][:k]
        xk = int(v[-1])
        # per-term nano-nat quantized log ratios (order-free int sum)
        q = [int(math.floor(math.log(int(x) / xk) * 1e9 + 0.5)) for x in v[:-1]]
        s = sum(q)
        alpha_milli = (len(v) - 1) * 1_000_000_000 * 1000 // s if s > 0 else 0
        rows.append(
            {
                "event_type": et,
                "k": len(v),
                "x_k_cents": xk,
                "sum_lnratio_nano": s,
                "alpha_milli": alpha_milli,
            }
        )
    out = pd.DataFrame(rows)
    for c in out.columns:
        if c != "event_type":
            out[c] = out[c].astype("int64")
    return out


def value_tail_hill_sql(k: int = 64) -> str:
    return f"""
        WITH v AS (
            SELECT event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC,
                                event_id) AS rk
            FROM events
        ), top AS (
            SELECT event_type, cents, rk FROM v WHERE rk <= {k}
        ), thr AS (
            SELECT event_type, MIN(cents) AS xk,
                   CAST(COUNT(*) AS BIGINT) AS kk
            FROM top GROUP BY 1
        ), terms AS (
            SELECT t.event_type,
                   CAST(FLOOR(ln(CAST(t.cents AS DOUBLE) / th.xk) * 1e9
                              + 0.5) AS BIGINT) AS q
            FROM top t JOIN thr th USING (event_type)
            WHERE t.rk < th.kk
        )
        SELECT th.event_type,
               th.kk AS k,
               CAST(th.xk AS BIGINT) AS x_k_cents,
               CAST(SUM(te.q) AS BIGINT) AS sum_lnratio_nano,
               CAST(CASE WHEN SUM(te.q) > 0 THEN
                   (th.kk - 1) * 1000000000 * 1000 // SUM(te.q)
                   ELSE 0 END AS BIGINT) AS alpha_milli
        FROM thr th JOIN terms te USING (event_type)
        GROUP BY th.event_type, th.kk, th.xk
        ORDER BY th.event_type
    """


def rice_param_audit(sf_dir: str, max_k: int = 16) -> pd.DataFrame:
    """Golomb-Rice parameter selection audit: per user, the OPTIMAL
    Rice parameter k for encoding the sorted event_id posting-list
    deltas (first id absolute, like varint_delta_size_audit) and the
    exact bit cost at that k — cost(k) = sum(d >> k) + n*(k+1)
    (unary quotient + stop bit + k remainder bits per delta).  This is
    the per-partition tuning decision every posting-list / timestamp
    compressor makes; ties break to the smallest k.  Pure int64, so
    the LAG + k-grid SQL twin is bit-exact.

    Distributed plan: user-keyed groupby; per group one diff + a
    (max_k+1)-point vectorized cost scan — the exchange is the event
    table keyed by user, the k-grid never leaves the worker."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_id"])

    ks = np.arange(max_k + 1, dtype=np.int64)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["event_id"].to_numpy(np.int64))
        deltas = np.r_[ids[0], np.diff(ids)]
        # [K+1, n] quotient matrix -> per-k total bits
        costs = (deltas[None, :] >> ks[:, None]).sum(axis=1) + len(ids) * (ks + 1)
        best = int(np.argmin(costs))  # argmin takes the FIRST min -> smallest k
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(ids)],
                "best_k": [best],
                "rice_bits": [int(costs[best])],
                "plain_bits": [64 * len(ids)],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def rice_param_audit_sql(max_k: int = 16) -> str:
    return f"""
        WITH d AS (
            SELECT user_id,
                   COALESCE(event_id - LAG(event_id) OVER (
                       PARTITION BY user_id ORDER BY event_id), event_id) AS delta
            FROM events
        ), grid AS (
            SELECT CAST(range AS BIGINT) AS k FROM range(0, {max_k + 1})
        ), cost AS (
            SELECT d.user_id, g.k,
                   CAST(SUM(d.delta >> g.k) + COUNT(*) * (g.k + 1) AS BIGINT) AS bits,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM d CROSS JOIN grid g
            GROUP BY 1, 2
        ), pick AS (
            SELECT user_id, k, bits, n,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY bits, k) AS rn
            FROM cost
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               n AS n_events,
               k AS best_k,
               bits AS rice_bits,
               CAST(64 * n AS BIGINT) AS plain_bits
        FROM pick WHERE rn = 1 ORDER BY user_id
    """


def position_attribution(sf_dir: str, lookback_hours: int = 24) -> pd.DataFrame:
    """U-shaped (position-based) attribution in EXACT basis points:
    every purchase distributes 10000 bp across its prior click/view
    touches within the lookback window — 1 touch: 10000; 2 touches:
    5000/5000; m>=3: first 4000, last 4000, the m-2 middles share
    2000 bp by largest-remainder (base 2000//(m-2), the first
    2000%(m-2) middles in (ts, event_id) order get +1 bp).  Purchases
    with no touch credit 'direct' 10000.  Credits are integers that
    sum to exactly 10000 per purchase, so the self-join + window SQL
    twin is bit-exact.  Touch order is (ts, event_id), strictly before
    the purchase row, matching last_touch_attribution.

    Distributed plan: one user-keyed coarse-bucket shuffle; per bucket
    a per-user two-pointer finds each purchase's touch window and
    numpy folds credits into a channels-sized partial — the exchange
    after the shuffle is O(channels), never O(events)."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def shard(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        return t.append_column(
            "_shard", pa.array((u % 64).astype(np.int32), pa.int32())
        )

    win_us = lookback_hours * 3_600_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out: dict[str, list[int]] = {}

        def credit(ch: str, n: int, bp: int) -> None:
            cur = out.setdefault(ch, [0, 0])
            cur[0] += n
            cur[1] += bp

        for _, u in g.groupby("user_id", sort=False):
            u = u.sort_values(["ts", "event_id"], kind="mergesort")
            ts = u["ts"].astype("int64").to_numpy()
            et = u["event_type"].to_numpy()
            tmask = (et == "click") | (et == "view")
            tpos = np.flatnonzero(tmask)
            tts = ts[tpos]
            tch = et[tpos]
            ntouch_before = np.cumsum(tmask)  # touches at rows <= i
            for i in np.flatnonzero(et == "purchase"):
                hi = int(ntouch_before[i - 1]) if i > 0 else 0
                lo = int(np.searchsorted(tts[:hi], ts[i] - win_us, side="left"))
                m = hi - lo
                if m == 0:
                    credit("direct", 1, 10_000)
                    continue
                ch = tch[lo:hi]
                if m == 1:
                    bps = np.array([10_000], dtype=np.int64)
                elif m == 2:
                    bps = np.array([5_000, 5_000], dtype=np.int64)
                else:
                    base, rem = divmod(2_000, m - 2)
                    bps = np.full(m, base, dtype=np.int64)
                    bps[0] = bps[-1] = 4_000
                    bps[1 : 1 + rem] += 1
                for c in ("click", "view"):
                    sel = ch == c
                    k = int(sel.sum())
                    if k:
                        credit(c, k, int(bps[sel].sum()))
        rows = sorted(out.items())
        return pd.DataFrame(
            {
                "channel": [r[0] for r in rows],
                "n": np.array([r[1][0] for r in rows], dtype=np.int64),
                "bp": np.array([r[1][1] for r in rows], dtype=np.int64),
            }
        )

    parts = (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("channel", as_index=False)
        .agg(n_credits=("n", "sum"), credit_bp=("bp", "sum"))
        .sort_values("channel")
        .reset_index(drop=True)
    )
    for c in ("n_credits", "credit_bp"):
        out[c] = out[c].astype("int64")
    return out


def position_attribution_sql(lookback_hours: int = 24) -> str:
    return f"""
        WITH p AS (
            SELECT event_id AS pid, user_id, ts AS pts
            FROM events WHERE event_type = 'purchase'
        ), t AS (
            SELECT event_id AS tid, user_id, ts AS tts, event_type AS ch
            FROM events WHERE event_type IN ('click', 'view')
        ), j AS (
            SELECT p.pid, t.ch,
                   ROW_NUMBER() OVER (PARTITION BY p.pid
                                      ORDER BY t.tts, t.tid) AS rn,
                   COUNT(*) OVER (PARTITION BY p.pid) AS m
            FROM p JOIN t
              ON t.user_id = p.user_id
             AND (t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid))
             AND t.tts >= p.pts - INTERVAL {lookback_hours} HOURS
        ), credited AS (
            SELECT ch,
                   CASE WHEN m = 1 THEN 10000
                        WHEN m = 2 THEN 5000
                        WHEN rn = 1 OR rn = m THEN 4000
                        ELSE 2000 // (m - 2)
                             + CASE WHEN rn - 1 <= 2000 % (m - 2)
                                    THEN 1 ELSE 0 END
                   END AS bp
            FROM j
            UNION ALL
            SELECT 'direct' AS ch, 10000 AS bp
            FROM p WHERE NOT EXISTS (
                SELECT 1 FROM t
                WHERE t.user_id = p.user_id
                  AND (t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid))
                  AND t.tts >= p.pts - INTERVAL {lookback_hours} HOURS)
        )
        SELECT ch AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_credits,
               CAST(SUM(bp) AS BIGINT) AS credit_bp
        FROM credited GROUP BY 1 ORDER BY 1
    """


def daily_revenue_max_surge(sf_dir: str) -> pd.DataFrame:
    """Maximum-surge window over daily revenue: the contiguous run of
    days whose revenue exceeds the overall daily average by the
    largest total — Kadane's maximum subarray over the EXACTLY
    demeaned series b_d = cents_d * n_days - total_cents (scaling by
    n_days keeps everything int64; no float mean).  Solved with the
    prefix-minimum identity best_j = P_j - min(0, min_{{i<j}} P_i), so
    the window-function SQL twin is bit-exact; ties break to the
    earliest end day, then the earliest start (argmax/argmin take the
    FIRST extremum).

    Distributed plan: one (day) Sum exchange; the O(days) scan runs on
    the driver over the folded daily series."""
    import numpy as np
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def keys(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
            86_400_000_000,
        )
        return pa.table({"day": day, "r": _cents(t["value"])})

    d = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("r", alias_name="rev"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    days = d["day"].to_numpy(np.int64)
    cents = d["rev"].to_numpy(np.int64)
    n = len(days)
    tot = int(cents.sum())
    b = cents * n - tot
    pref0 = np.r_[np.int64(0), np.cumsum(b)]  # pref0[i] = P_i, P_0 = 0
    m = np.minimum.accumulate(pref0)[:-1]  # M_j = min_{i<=j-1} P_i (incl. 0)
    best = pref0[1:] - m
    j = int(np.argmax(best))  # first max -> earliest end day
    mj = int(m[j])
    i = int(np.argmax(pref0[: j + 1] == mj))  # first min -> earliest start
    return pd.DataFrame(
        {
            "start_day": np.array([days[i]], dtype=np.int64),
            "end_day": np.array([days[j]], dtype=np.int64),
            "len_days": np.array([j - i + 1], dtype=np.int64),
            "surge_scaled": np.array([int(best[j])], dtype=np.int64),
            "n_days": np.array([n], dtype=np.int64),
        }
    )


def daily_revenue_max_surge_sql() -> str:
    return """
        WITH d AS (
            SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                        AS BIGINT) AS day,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
            FROM events GROUP BY 1
        ), mm AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS tot
            FROM d
        ), p AS (
            SELECT day,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn,
                   SUM(c * mm.n - mm.tot) OVER (ORDER BY day) AS pf
            FROM d CROSS JOIN mm
        ), s AS (
            SELECT day, rn, pf,
                   LEAST(COALESCE(MIN(pf) OVER (
                       ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
                       0) AS mj
            FROM p
        ), pick AS (
            SELECT * FROM s ORDER BY pf - mj DESC, day LIMIT 1
        ), istart AS (
            SELECT MIN(p.rn) AS irn FROM p, pick
            WHERE p.pf = pick.mj AND p.rn < pick.rn
        )
        SELECT CASE WHEN pick.mj = 0 THEN (SELECT MIN(day) FROM d)
                    ELSE (SELECT day FROM p WHERE rn = istart.irn + 1)
               END AS start_day,
               pick.day AS end_day,
               CASE WHEN pick.mj = 0 THEN pick.rn
                    ELSE pick.rn - istart.irn
               END AS len_days,
               CAST(pick.pf - pick.mj AS BIGINT) AS surge_scaled,
               (SELECT n FROM mm) AS n_days
        FROM pick CROSS JOIN istart
    """


def hourly_emd_matrix(sf_dir: str) -> pd.DataFrame:
    """Pairwise earth-mover (W1) distance between event types'
    hour-of-day profiles — the workload-similarity measure a scheduler
    uses to decide which event families can share a capacity plan.
    With both profiles on the 24-hour grid, W1 reduces to the sum of
    absolute CDF gaps; cross-multiplying by the other type's total
    (|cumA_h * nB - cumB_h * nA|) keeps everything exact int64 — no
    normalization floats.  The hour grid is DENSE (missing hours count
    zero), matching the grid CTE in the SQL twin.

    Distributed plan: one (type, hour) count exchange (24 x |types|
    rows); the pairwise fold runs on the driver over that tiny
    matrix."""
    import numpy as np
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        h = pc.divide(us, 3_600_000_000)
        hour = pc.subtract(h, pc.multiply(pc.divide(h, 24), 24))
        return pa.table({"event_type": t["event_type"], "hour": hour})

    g = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    types = sorted(g["event_type"].unique())
    prof = {}
    for et in types:
        v = np.zeros(24, dtype=np.int64)
        sub = g[g["event_type"] == et]
        v[sub["hour"].to_numpy(np.int64)] = sub["n"].to_numpy(np.int64)
        prof[et] = v
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            ca, cb = np.cumsum(prof[a]), np.cumsum(prof[b])
            na, nb = int(ca[-1]), int(cb[-1])
            emd = int(np.abs(ca[:-1] * nb - cb[:-1] * na).sum())
            rows.append(
                {"type_a": a, "type_b": b, "n_a": na, "n_b": nb,
                 "emd_scaled": emd}
            )
    out = pd.DataFrame(rows)
    for c in ("n_a", "n_b", "emd_scaled"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def hourly_emd_matrix_sql() -> str:
    return """
        WITH c AS (
            SELECT event_type,
                   CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24
                        AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), grid AS (
            SELECT t.event_type, CAST(h.range AS BIGINT) AS hour
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN range(0, 24) h
        ), dense AS (
            SELECT g.event_type, g.hour, COALESCE(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (event_type, hour)
        ), cum AS (
            SELECT event_type, hour,
                   SUM(n) OVER (PARTITION BY event_type ORDER BY hour) AS cn,
                   SUM(n) OVER (PARTITION BY event_type) AS tot
            FROM dense
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(MAX(a.tot) AS BIGINT) AS n_a,
               CAST(MAX(b.tot) AS BIGINT) AS n_b,
               CAST(SUM(ABS(a.cn * b.tot - b.cn * a.tot)) AS BIGINT)
                   AS emd_scaled
        FROM cum a JOIN cum b
          ON a.hour = b.hour AND a.event_type < b.event_type
        WHERE a.hour < 23
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def value_sortedness_audit(sf_dir: str) -> pd.DataFrame:
    """Presortedness census for sort planning: per user, the number of
    maximal ascending runs in the (ts, event_id)-ordered value stream
    and the longest run — the statistic a TimSort-style merge planner
    (or a clustered-index advisor) reads to predict how cheap an
    ordered merge will be.  A run breaks where cents STRICTLY drops.
    Pure integers; LAG + gaps-and-islands SQL twin.

    Distributed plan: user-keyed groupby; per group one diff +
    run-length encode, all numpy."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(cents)
        breaks = np.flatnonzero(cents[1:] < cents[:-1]) + 1
        bounds = np.r_[0, breaks, n]
        run_lens = np.diff(bounds)
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [n],
                "n_runs": [len(run_lens)],
                "max_run_len": [int(run_lens.max())],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def value_sortedness_audit_sql() -> str:
    return """
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), runs AS (
            SELECT user_id,
                   SUM(brk) OVER (PARTITION BY user_id
                                  ORDER BY rn_) AS run_id
            FROM (SELECT user_id, brk,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS rn_
                  FROM (SELECT user_id, ts, event_id,
                               CASE WHEN cents < LAG(cents) OVER (
                                   PARTITION BY user_id ORDER BY ts, event_id)
                                    THEN 1 ELSE 0 END AS brk
                        FROM e))
        ), per_run AS (
            SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS len
            FROM runs GROUP BY 1, 2
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(SUM(len) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_runs,
               CAST(MAX(len) AS BIGINT) AS max_run_len
        FROM per_run GROUP BY 1 ORDER BY 1
    """


def duplicate_payment_pairs(sf_dir: str) -> pd.DataFrame:
    """Duplicate-payment screen: pairs of orders by the SAME customer
    placed within one day of each other, with the amount gap published
    in basis points of the larger charge (10000*|ca-cb| // max) — the
    double-charge / replayed-submission candidate list every billing
    pipeline audits, ready for a downstream gap_bp threshold.  Exact
    integer pair set (earlier (day, orderkey) first), bit-exact vs the
    self-join SQL twin.

    Distributed plan: shuffle key is custkey (customer order counts
    are small and bounded), then a sorted two-pointer per customer —
    candidate generation is per-key, never all-pairs."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": pc.cast(t["o_custkey"], pa.int64()),
                "cents": _cents(t["o_totalprice"]),
                "orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "day": pc.cast(
                    pc.cast(t["o_orderdate"], pa.date32()), pa.int32()
                ),
            }
        )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["day", "orderkey"], kind="mergesort")
        day = g["day"].to_numpy(np.int64)
        okey = g["orderkey"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        rows = []
        n = len(g)
        for i in range(n):
            j = i + 1
            while j < n and day[j] - day[i] <= 1:
                ca, cb = int(cents[i]), int(cents[j])
                hi = max(ca, cb)
                rows.append(
                    (okey[i], okey[j], day[j] - day[i], ca, cb,
                     10_000 * abs(ca - cb) // hi)
                )
                j += 1
        cols = ("orderkey_a", "orderkey_b", "day_gap", "cents_a",
                "cents_b", "gap_bp")
        if not rows:
            out = pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                                ("custkey",) + cols})
            return out
        out = pd.DataFrame(
            {c: np.array([r[k] for r in rows], np.int64)
             for k, c in enumerate(cols)}
        )
        out.insert(0, "custkey", np.full(len(rows), int(g["custkey"].iloc[0]),
                                         np.int64))
        return out

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("custkey")
        .map_groups(per_group, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.sort_values(["custkey", "orderkey_a", "orderkey_b"])
        .reset_index(drop=True)
        .astype("int64")
    )


def duplicate_payment_pairs_sql() -> str:
    return """
        WITH o AS (
            SELECT CAST(o_custkey AS BIGINT) AS custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                   CAST(o_orderkey AS BIGINT) AS orderkey,
                   CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS day
            FROM orders
        )
        SELECT a.custkey,
               a.orderkey AS orderkey_a,
               b.orderkey AS orderkey_b,
               CAST(b.day - a.day AS BIGINT) AS day_gap,
               a.cents AS cents_a,
               b.cents AS cents_b,
               CAST(10000 * ABS(a.cents - b.cents)
                    // GREATEST(a.cents, b.cents) AS BIGINT) AS gap_bp
        FROM o a JOIN o b
          ON a.custkey = b.custkey
         AND b.day - a.day BETWEEN 0 AND 1
         AND (a.day < b.day OR (a.day = b.day AND a.orderkey < b.orderkey))
        ORDER BY a.custkey, orderkey_a, orderkey_b
    """


def user_daily_periodicity(sf_dir: str) -> pd.DataFrame:
    """Daily-rhythm detector: per user, the raw autocovariance dot
    products of the hourly activity count vector at lag 24 (same hour
    tomorrow) versus lag 1 (next hour) — dot24 >> dot1 means the user
    has a daily routine; the signal batch schedulers and bot detectors
    read.  Missing hours contribute zero products, so only observed
    (user, hour) counts are exchanged.  Pure integers; self-join SQL
    twin.

    Distributed plan: one (user, hour) count exchange, then a
    user-keyed fold of the two shifted dot products."""
    import numpy as np
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def keys(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "hour": pc.divide(us, 3_600_000_000),
            }
        )

    counts = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="n"))
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        h = g["hour"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        lut = dict(zip(h.tolist(), n.tolist()))
        dot24 = sum(v * lut.get(k + 24, 0) for k, v in lut.items())
        dot1 = sum(v * lut.get(k + 1, 0) for k, v in lut.items())
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [int(n.sum())],
                "n_hours_active": [len(h)],
                "dot_lag24": [int(dot24)],
                "dot_lag1": [int(dot1)],
            }
        )

    out = (
        counts.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def user_daily_periodicity_sql() -> str:
    return """
        WITH c AS (
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                        AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT a.user_id,
               CAST(SUM(a.n) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_hours_active,
               CAST(COALESCE(SUM((SELECT b.n FROM c b
                    WHERE b.user_id = a.user_id AND b.hour = a.hour + 24)
                    * a.n), 0) AS BIGINT) AS dot_lag24,
               CAST(COALESCE(SUM((SELECT b.n FROM c b
                    WHERE b.user_id = a.user_id AND b.hour = a.hour + 1)
                    * a.n), 0) AS BIGINT) AS dot_lag1
        FROM c a GROUP BY a.user_id ORDER BY a.user_id
    """


def priority_inversion_census(sf_dir: str) -> pd.DataFrame:
    """Fulfilment priority-inversion audit: within each customer's
    order book, pairs where an EARLIER, MORE URGENT order started
    shipping AFTER a later, less urgent one — the SLA breach pattern
    ops teams chase.  Urgency is the leading digit of o_orderpriority
    (1-URGENT .. 5-LOW); an order's ship start is MIN(l_shipdate).
    Exact integer pair counts; self-join SQL twin.

    Distributed plan: a broadcast-style orderkey->first-ship fold via
    one (orderkey) groupby on lineitem, joined to orders, then a
    custkey-keyed groupby with an O(k^2) scan over each customer's
    handful of orders — never a global all-pairs."""
    import numpy as np
    from ray.data.aggregate import Min

    li = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                    "ship": pc.cast(pc.cast(t["l_shipdate"], pa.date32()),
                                    pa.int32()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("orderkey")
        .aggregate(Min("ship", alias_name="first_ship"))
        .to_pandas()
    )
    ship_of = dict(
        zip(li["orderkey"].astype(int), li["first_ship"].astype(int))
    )
    import ray as _ray

    ship_ref = _ray.put(ship_of)

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def keys(t: pa.Table) -> pd.DataFrame:
        lut = _ray.get(ship_ref)
        okey = [int(v) for v in t["o_orderkey"].to_pylist()]
        return pd.DataFrame(
            {
                "custkey": [int(v) for v in t["o_custkey"].to_pylist()],
                "orderkey": okey,
                "day": [
                    int(v)
                    for v in pc.cast(
                        pc.cast(t["o_orderdate"], pa.date32()), pa.int32()
                    ).to_pylist()
                ],
                "prio": [int(s[0]) for s in t["o_orderpriority"].to_pylist()],
                "first_ship": [ship_of_get(lut, k) for k in okey],
            }
        )

    def ship_of_get(lut, k):
        return int(lut.get(k, -1))

    def per_customer(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["first_ship"] >= 0]
        day = g["day"].to_numpy(np.int64)
        prio = g["prio"].to_numpy(np.int64)
        ship = g["first_ship"].to_numpy(np.int64)
        n = len(g)
        pairs = 0
        inv = 0
        for i in range(n):
            for j in range(n):
                if day[i] < day[j] and prio[i] < prio[j]:
                    pairs += 1
                    if ship[i] > ship[j]:
                        inv += 1
        return pd.DataFrame(
            {
                "custkey": [int(g["custkey"].iloc[0])] if n else [],
                "n_orders": [n] if n else [],
                "n_comparable_pairs": [pairs] if n else [],
                "n_inversions": [inv] if n else [],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("custkey")
        .map_groups(per_customer, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("custkey").reset_index(drop=True).astype("int64")


def priority_inversion_census_sql() -> str:
    return """
        WITH fs AS (
            SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
                   MIN(CAST(l_shipdate AS DATE)) AS first_ship
            FROM lineitem GROUP BY 1
        ), o AS (
            SELECT CAST(o_custkey AS BIGINT) AS custkey,
                   CAST(o_orderkey AS BIGINT) AS orderkey,
                   CAST(o_orderdate AS DATE) AS day,
                   CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio,
                   fs.first_ship
            FROM orders JOIN fs ON fs.orderkey = o_orderkey
        ), pairs AS (
            SELECT a.custkey,
                   CASE WHEN a.first_ship > b.first_ship THEN 1 ELSE 0 END
                       AS is_inv
            FROM o a JOIN o b
              ON a.custkey = b.custkey
             AND a.day < b.day AND a.prio < b.prio
        ), cnt AS (
            SELECT custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_comparable_pairs,
                   CAST(SUM(is_inv) AS BIGINT) AS n_inversions
            FROM pairs GROUP BY 1
        ), base AS (
            SELECT custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM o GROUP BY 1
        )
        SELECT b.custkey, b.n_orders,
               COALESCE(c.n_comparable_pairs, 0) AS n_comparable_pairs,
               COALESCE(c.n_inversions, 0) AS n_inversions
        FROM base b LEFT JOIN cnt c USING (custkey)
        ORDER BY b.custkey
    """


def returns_pchart_audit(sf_dir: str) -> pd.DataFrame:
    """Shewhart p-chart over the daily return rate, with the 3-sigma
    control test evaluated in EXACT integers: day d with n_d items and
    x_d returns is out of control iff
    (x_d*N - R*n_d)^2 > 9 * R * (N-R) * n_d, the cross-multiplied form
    of |x/n - R/N| > 3*sqrt((R/N)(1-R/N)/n) — no square roots, no
    floats, bit-exact vs the HUGEINT SQL twin.  This is the QC chart a
    returns-abuse monitor runs per day.

    Distributed plan: one (day) count exchange; the control test runs
    on the driver over the tiny daily series with Python big ints."""
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_returnflag"]
    )

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.cast(pc.cast(t["l_shipdate"], pa.date32()),
                               pa.int32()),
                "ret": pc.if_else(
                    pc.equal(t["l_returnflag"], "R"),
                    pa.scalar(1, pa.int64()),
                    pa.scalar(0, pa.int64()),
                ),
            }
        )

    d = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n"), Sum("ret", alias_name="x"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    n_tot = int(d["n"].sum())
    r_tot = int(d["x"].sum())
    lhs = []
    rhs = []
    flag = []
    for n_d, x_d in zip(d["n"].astype(int), d["x"].astype(int)):
        left = (x_d * n_tot - r_tot * n_d) ** 2
        right = 9 * r_tot * (n_tot - r_tot) * n_d
        lhs.append(left)
        rhs.append(right)
        flag.append(1 if left > right else 0)
    out = pd.DataFrame(
        {
            "day": d["day"].astype("int64"),
            "n_items": d["n"].astype("int64"),
            "n_returned": d["x"].astype("int64"),
            "dev_sq_scaled": pd.Series(lhs, dtype="int64"),
            "bound_scaled": pd.Series(rhs, dtype="int64"),
            "out_of_control": pd.Series(flag, dtype="int64"),
        }
    )
    return out


def returns_pchart_audit_sql() -> str:
    return """
        WITH d AS (
            SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                        AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x
            FROM lineitem GROUP BY 1
        ), t AS (
            SELECT CAST(SUM(n) AS HUGEINT) AS nn,
                   CAST(SUM(x) AS HUGEINT) AS rr
            FROM d
        )
        SELECT d.day,
               d.n AS n_items,
               d.x AS n_returned,
               CAST((d.x * t.nn - t.rr * d.n) * (d.x * t.nn - t.rr * d.n)
                    AS BIGINT) AS dev_sq_scaled,
               CAST(9 * t.rr * (t.nn - t.rr) * d.n AS BIGINT) AS bound_scaled,
               CAST(CASE WHEN (d.x * t.nn - t.rr * d.n)
                              * (d.x * t.nn - t.rr * d.n)
                              > 9 * t.rr * (t.nn - t.rr) * d.n
                         THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
        FROM d CROSS JOIN t ORDER BY d.day
    """


def selectivity_estimate_audit(sf_dir: str, n_buckets: int = 16) -> pd.DataFrame:
    """Optimizer-calibration audit: build a 16-bucket EQUI-WIDTH
    histogram over event value cents, then for a deterministic ladder
    of range predicates compare the histogram's uniform-interpolation
    estimate against the exact row count.  The estimate is published
    as an EXACT rational (est_num / est_den, den = bucket span), so
    the SQL twin is bit-exact — no float interpolation.  This is the
    selectivity-error table every cost-based optimizer is judged by.

    Distributed plan: one min/max aggregate, one bucket-count
    exchange (histogram-sized), one predicate-count exchange
    (ladder-sized); the rational arithmetic folds on the driver."""
    import numpy as np
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    cents_ds = ds.map_batches(
        lambda t: pa.table({"cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    mm = cents_ds.aggregate(
        Min("cents", alias_name="lo"), Max("cents", alias_name="hi"),
        Count(alias_name="n"),
    )
    lo, hi, n_rows = int(mm["lo"]), int(mm["hi"]), int(mm["n"])
    span = hi - lo + 1
    # bucket b covers [lo + b*span//B, lo + (b+1)*span//B) by integer
    # boundaries — reproducible in SQL with the same floor divisions
    bounds = [lo + b * span // n_buckets for b in range(n_buckets + 1)]

    def bucket_of(t: pa.Table) -> pd.DataFrame:
        c = t["cents"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(np.array(bounds[1:-1], dtype=np.int64), c,
                            side="right")
        df = pd.DataFrame({"bucket": b.astype(np.int64)})
        g = df.groupby("bucket", as_index=False).agg(n=("bucket", "size"))
        g["n"] = g["n"].astype("int64")
        return g

    hist = (
        cents_ds.map_batches(bucket_of, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = np.zeros(n_buckets, dtype=np.int64)
    counts[hist["bucket"].to_numpy(np.int64)] = hist["n"].to_numpy(np.int64)

    # predicate ladder: 8 ranges at deterministic fractions of the span
    preds = []
    for i in range(8):
        plo = lo + (i * span) // 10
        phi = lo + ((i + 3) * span) // 10
        preds.append((plo, min(phi, hi + 1)))

    def exact_counts(t: pa.Table) -> pd.DataFrame:
        c = t["cents"].to_numpy(zero_copy_only=False)
        rows = []
        for pid, (plo, phi) in enumerate(preds):
            rows.append((pid, int(((c >= plo) & (c < phi)).sum())))
        return pd.DataFrame(
            {"pid": [r[0] for r in rows],
             "n": pd.Series([r[1] for r in rows], dtype="int64")}
        )

    ex = (
        cents_ds.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("pid")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    exact = dict(zip(ex["pid"].astype(int), ex["n"].astype(int)))

    rows = []
    for pid, (plo, phi) in enumerate(preds):
        # estimate: sum over buckets of count * overlap / width
        num = 0
        den = 1
        # common denominator: product avoided — use per-bucket exact
        # overlap*count summed over a shared denominator of bucket
        # widths via fractions with lcm = span (widths differ by <=1);
        # publish per-bucket-width-normalized sum as num/den with den =
        # product-free accumulation in fractions
        from fractions import Fraction

        est = Fraction(0)
        for b in range(n_buckets):
            blo, bhi = bounds[b], bounds[b + 1]
            w = bhi - blo
            if w == 0:
                continue
            ov = max(0, min(phi, bhi) - max(plo, blo))
            if ov:
                est += Fraction(int(counts[b]) * ov, w)
        rows.append(
            {
                "pid": pid,
                "pred_lo": plo,
                "pred_hi": phi,
                "est_num": int(est.numerator),
                "est_den": int(est.denominator),
                "exact_count": exact.get(pid, 0),
            }
        )
    out = pd.DataFrame(rows)
    return out.astype("int64")


def selectivity_estimate_audit_sql(n_buckets: int = 16) -> str:
    return f"""
        WITH c AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
        ), mm AS (
            SELECT MIN(cents) AS lo, MAX(cents) AS hi,
                   MAX(cents) - MIN(cents) + 1 AS span
            FROM c
        ), bkts AS (
            SELECT CAST(range AS BIGINT) AS b,
                   mm.lo + range * mm.span // {n_buckets} AS blo,
                   mm.lo + (range + 1) * mm.span // {n_buckets} AS bhi
            FROM range(0, {n_buckets}) CROSS JOIN mm
        ), hist AS (
            SELECT bk.b, bk.blo, bk.bhi,
                   CAST(COUNT(c.cents) AS BIGINT) AS n
            FROM bkts bk LEFT JOIN c
              ON c.cents >= bk.blo AND c.cents < bk.bhi
            GROUP BY 1, 2, 3
        ), preds AS (
            SELECT CAST(range AS BIGINT) AS pid,
                   mm.lo + (range * mm.span) // 10 AS plo,
                   LEAST(mm.lo + ((range + 3) * mm.span) // 10,
                         mm.hi + 1) AS phi
            FROM range(0, 8) CROSS JOIN mm
        ), terms AS (
            SELECT p.pid, p.plo, p.phi,
                   h.n * GREATEST(0, LEAST(p.phi, h.bhi)
                                     - GREATEST(p.plo, h.blo)) AS ov_num,
                   h.bhi - h.blo AS w
            FROM preds p CROSS JOIN hist h
            WHERE h.bhi > h.blo
        ), est AS (
            -- exact rational sum over per-bucket fractions: widths are
            -- span//B or span//B+1, so a common denominator is their
            -- product over DISTINCT widths; DuckDB lacks rationals, so
            -- scale by the LCM of observed widths (product of the at
            -- most two distinct values), then reduce by GCD
            SELECT pid, plo, phi,
                   CAST(SUM(ov_num * (sel.lcm_w // w)) AS BIGINT) AS raw_num,
                   CAST(MAX(sel.lcm_w) AS BIGINT) AS raw_den
            FROM terms CROSS JOIN (
                SELECT CASE WHEN MIN(w) = MAX(w) THEN MIN(w)
                            ELSE MIN(w) * MAX(w)
                                 // gcd(MIN(w), MAX(w)) END AS lcm_w
                FROM terms) sel
            GROUP BY pid, plo, phi, sel.lcm_w
        ), ex AS (
            SELECT p.pid, CAST(COUNT(c.cents) AS BIGINT) AS exact_count
            FROM preds p LEFT JOIN c
              ON c.cents >= p.plo AND c.cents < p.phi
            GROUP BY 1
        )
        SELECT e.pid, e.plo AS pred_lo, e.phi AS pred_hi,
               CAST(e.raw_num // gcd(e.raw_num, e.raw_den) AS BIGINT)
                   AS est_num,
               CAST(e.raw_den // gcd(e.raw_num, e.raw_den) AS BIGINT)
                   AS est_den,
               ex.exact_count
        FROM est e JOIN ex USING (pid)
        ORDER BY e.pid
    """


def type_gini_mean_diff(sf_dir: str) -> pd.DataFrame:
    """Exact Gini mean difference per event type: the sum of absolute
    pairwise cent differences Σ_{{i<j}} |x_i - x_j|, computed with the
    sorted prefix identity Σ_i (2i - n - 1)·x_(i) (1-based ranks) —
    O(n log n), no pair enumeration, tie-order-invariant.  Published
    with the pair count so GMD = num / pairs stays exact.  The robust
    dispersion twin of variance for heavy-tailed value columns.

    Distributed plan: type-keyed groupby; one sort + dot product per
    group."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t["event_type"], "cents": _cents(t["value"])}
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(g["cents"].to_numpy(np.int64))
        n = len(x)
        coef = 2 * np.arange(1, n + 1, dtype=np.int64) - n - 1
        num = int(np.dot(coef, x))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [n],
                "gmd_num_cents": [num],
                "n_pairs": [n * (n - 1) // 2],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    for c in ("n", "gmd_num_cents", "n_pairs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def type_gini_mean_diff_sql() -> str:
    return """
        WITH r AS (
            SELECT event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY CAST(ROUND(value * 100)
                                                    AS BIGINT)) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM((2 * rn - n - 1) * cents) AS BIGINT)
                   AS gmd_num_cents,
               CAST(MAX(n) * (MAX(n) - 1) // 2 AS BIGINT) AS n_pairs
        FROM r GROUP BY event_type ORDER BY event_type
    """


def capacity_waterfill_allocation(sf_dir: str) -> pd.DataFrame:
    """Max-min fair (water-filling) allocation of a constrained daily
    capacity across event types, entirely in integers: with demands
    d_t = per-type event counts and capacity C = total // 2, every
    type below the waterline keeps its demand; the rest share the
    remaining capacity at level L = (C - sum_satisfied) // n_rest with
    the first `rem` unsaturated types (demand asc, then name asc)
    getting +1 — the multi-tenant throttling decision every shared
    ingest pipeline makes.  Closed-form waterline (no iteration), so
    the window-function SQL twin is bit-exact; allocations conserve
    min(C, total) exactly.

    Distributed plan: one type-count exchange; the O(types log types)
    waterline fold runs on the driver."""
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    d = (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="demand"))
        .to_pandas()
        .sort_values(["demand", "event_type"])
        .reset_index(drop=True)
    )
    demands = d["demand"].astype(int).tolist()
    names = d["event_type"].tolist()
    n = len(demands)
    total = sum(demands)
    cap = total // 2
    alloc = {}
    if total <= cap:
        for t, dem in zip(names, demands):
            alloc[t] = dem
    else:
        pref = 0
        chosen = None
        for k in range(n):  # satisfy first k types fully (k=0..n-1)
            lmax = (cap - pref) // (n - k)
            if lmax < demands[k]:
                chosen = (k, pref, lmax)
                break
            pref += demands[k]
        assert chosen is not None
        k, pref, level = chosen
        rem = cap - pref - level * (n - k)
        for i, (t, dem) in enumerate(zip(names, demands)):
            if i < k:
                alloc[t] = dem
            else:
                alloc[t] = level + (1 if (i - k) < rem else 0)
    out = pd.DataFrame(
        {
            "event_type": names,
            "demand": demands,
            "allocated": [alloc[t] for t in names],
            "capacity": [cap] * n,
        }
    )
    for c in ("demand", "allocated", "capacity"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def capacity_waterfill_allocation_sql() -> str:
    return """
        WITH d AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS demand
            FROM events GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(demand) AS BIGINT) AS total,
                   CAST(SUM(demand) // 2 AS BIGINT) AS cap,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM d
        ), s AS (
            SELECT event_type, demand,
                   ROW_NUMBER() OVER (ORDER BY demand, event_type) AS rk,
                   COALESCE(SUM(demand) OVER (
                       ORDER BY demand, event_type
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS pref
            FROM d
        ), cut AS (
            -- the first rank whose demand exceeds its waterline
            SELECT s.rk AS kk, s.pref AS pref_k,
                   (tot.cap - s.pref) // (tot.n - s.rk + 1) AS level
            FROM s CROSS JOIN tot
            WHERE (tot.cap - s.pref) // (tot.n - s.rk + 1) < s.demand
            ORDER BY s.rk LIMIT 1
        )
        SELECT s.event_type, s.demand,
               CAST(CASE
                   WHEN tot.total <= tot.cap THEN s.demand
                   WHEN s.rk < cut.kk THEN s.demand
                   ELSE cut.level
                        + CASE WHEN s.rk - cut.kk <
                                    tot.cap - cut.pref_k
                                    - cut.level * (tot.n - cut.kk + 1)
                               THEN 1 ELSE 0 END
               END AS BIGINT) AS allocated,
               tot.cap AS capacity
        FROM s CROSS JOIN tot LEFT JOIN cut ON TRUE
        ORDER BY s.event_type
    """


def type_halfmass_time(sf_dir: str) -> pd.DataFrame:
    """Traffic half-mass clock: per (day, event_type), the exact
    timestamp (and its microsecond-of-day) of the ceil(n/2)-th event —
    when half the day's traffic for that type has already landed.
    The number capacity planners read to place a mid-day scale-down.
    Exact order statistic with (ts, event_id) tie order; ROW_NUMBER
    SQL twin.

    Distributed plan: (day, type)-keyed groupby; one partition +
    select per group."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )

    def keys(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "day": pc.divide(us, 86_400_000_000),
                "event_type": t["event_type"],
                "ts_us": us,
                "event_id": pc.cast(t["event_id"], pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        n = len(g)
        half = (n + 1) // 2
        row = g.iloc[half - 1]
        return pd.DataFrame(
            {
                "day": [int(g["day"].iloc[0])],
                "event_type": [g["event_type"].iloc[0]],
                "n": [n],
                "half_ts_us": [int(row["ts_us"])],
                "half_us_of_day": [int(row["ts_us"]) % 86_400_000_000],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    for c in ("day", "n", "half_ts_us", "half_us_of_day"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["day", "event_type"]).reset_index(drop=True)


def type_halfmass_time_sql() -> str:
    return """
        WITH e AS (
            SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
                   event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                   event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY epoch_us(CAST(ts AS TIMESTAMP))
                                    // 86400000000, event_type
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                       AS rn,
                   COUNT(*) OVER (
                       PARTITION BY epoch_us(CAST(ts AS TIMESTAMP))
                                    // 86400000000, event_type) AS n
            FROM events
        )
        SELECT CAST(day AS BIGINT) AS day, event_type,
               CAST(n AS BIGINT) AS n,
               CAST(ts_us AS BIGINT) AS half_ts_us,
               CAST(ts_us % 86400000000 AS BIGINT) AS half_us_of_day
        FROM e WHERE rn = (n + 1) // 2
        ORDER BY day, event_type
    """


def embedding_split_half_drift(sf_dir: str) -> pd.DataFrame:
    """Split-half centroid stability per label: vectors split by
    vec_id parity, per-dimension micro-quantized sums folded per half,
    and the cross-multiplied L1 centroid gap published as the exact
    integer Σ_d |Se_d·n_o − So_d·n_e| (the mean-difference scaled by
    n_e·n_o — no division).  Large drift means the label's centroid is
    an unstable summary (too few vectors or multimodal) — the
    reliability check before trusting label centroids for routing.

    Distributed plan: one (label, parity) per-dimension sum exchange
    (labels × 2 × dims rows); the gap folds on the driver."""
    import numpy as np
    from ray.data.aggregate import Count

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(
            [np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()]
        )
        q = np.round(emb * 1_000_000).astype(np.int64)
        par = vid % 2
        rows = []
        for l in np.unique(lab):
            for p in (0, 1):
                m = (lab == l) & (par == p)
                if m.any():
                    s = q[m].sum(axis=0)
                    rows.append(
                        {
                            "label": int(l),
                            "parity": int(p),
                            "n": int(m.sum()),
                            **{f"s{d}": int(v) for d, v in enumerate(s)},
                        }
                    )
        return pd.DataFrame(rows)

    from ray.data.aggregate import Sum

    dims = 64
    aggs = [Sum("n", alias_name="n")] + [
        Sum(f"s{d}", alias_name=f"s{d}") for d in range(dims)
    ]
    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "parity"])
        .aggregate(*aggs)
        .to_pandas()
    )
    rows = []
    for l, sub in g.groupby("label", sort=True):
        even = sub[sub["parity"] == 0]
        odd = sub[sub["parity"] == 1]
        n_e = int(even["n"].iloc[0]) if len(even) else 0
        n_o = int(odd["n"].iloc[0]) if len(odd) else 0
        if n_e == 0 or n_o == 0:
            drift = -1
        else:
            se = even[[f"s{d}" for d in range(dims)]].to_numpy(np.int64)[0]
            so = odd[[f"s{d}" for d in range(dims)]].to_numpy(np.int64)[0]
            drift = int(np.abs(se * n_o - so * n_e).sum())
        rows.append(
            {"label": int(l), "n_even": n_e, "n_odd": n_o,
             "drift_l1_scaled": drift}
        )
    return pd.DataFrame(rows).astype("int64")


def embedding_split_half_drift_sql() -> str:
    return """
        WITH f AS (
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(vec_id % 2 AS BIGINT) AS parity,
                   vec_id,
                   CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                       AS dim,
                   CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                        AS BIGINT) AS q
            FROM embeddings
        ), sums AS (
            SELECT label, parity, dim,
                   CAST(SUM(q) AS BIGINT) AS s,
                   CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
            FROM f GROUP BY 1, 2, 3
        ), halves AS (
            SELECT e.label, e.dim,
                   e.s AS se, o.s AS so, e.n AS ne, o.n AS nno
            FROM sums e JOIN sums o
              ON e.label = o.label AND e.dim = o.dim
             AND e.parity = 0 AND o.parity = 1
        ), per_label AS (
            SELECT label,
                   CAST(MAX(ne) AS BIGINT) AS n_even,
                   CAST(MAX(nno) AS BIGINT) AS n_odd,
                   CAST(SUM(ABS(se * nno - so * ne)) AS BIGINT)
                       AS drift_l1_scaled
            FROM halves GROUP BY 1
        ), all_labels AS (
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_even,
                   CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_odd
            FROM embeddings GROUP BY 1
        )
        SELECT a.label, a.n_even, a.n_odd,
               CAST(COALESCE(p.drift_l1_scaled, -1) AS BIGINT)
                   AS drift_l1_scaled
        FROM all_labels a LEFT JOIN per_label p USING (label)
        ORDER BY a.label
    """


def order_brand_simpson(sf_dir: str) -> pd.DataFrame:
    """Basket concentration per order: distinct part brands, item
    count, and the Simpson-index numerator Σ_b c_b² over brand line
    counts — exact integers (the diversity-vs-concentration signal for
    cross-sell analysis), via one lineitem→part broadcast join.

    Distributed plan: part (small side) broadcast via ray.put-backed
    Arrow join inside map_batches; one orderkey groupby."""
    import numpy as np

    part = (
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
        .to_pandas()
    )
    import ray as _ray

    brand_ref = _ray.put(
        dict(zip(part["p_partkey"].astype(int), part["p_brand"]))
    )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def keys(t: pa.Table) -> pd.DataFrame:
        lut = _ray.get(brand_ref)
        ok = [int(v) for v in t["l_orderkey"].to_pylist()]
        pk = [int(v) for v in t["l_partkey"].to_pylist()]
        return pd.DataFrame(
            {"orderkey": ok, "brand": [lut[k] for k in pk]}
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby("brand").size()
        return pd.DataFrame(
            {
                "orderkey": [int(g["orderkey"].iloc[0])],
                "n_items": [len(g)],
                "n_brands": [len(counts)],
                "simpson_num": [int((counts.to_numpy(np.int64) ** 2).sum())],
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("orderkey")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("orderkey").reset_index(drop=True).astype("int64")


def order_brand_simpson_sql() -> str:
    return """
        WITH j AS (
            SELECT CAST(l_orderkey AS BIGINT) AS orderkey, p_brand AS brand
            FROM lineitem JOIN part ON p_partkey = l_partkey
        ), c AS (
            SELECT orderkey, brand, CAST(COUNT(*) AS BIGINT) AS c
            FROM j GROUP BY 1, 2
        )
        SELECT orderkey,
               CAST(SUM(c) AS BIGINT) AS n_items,
               CAST(COUNT(*) AS BIGINT) AS n_brands,
               CAST(SUM(c * c) AS BIGINT) AS simpson_num
        FROM c GROUP BY orderkey ORDER BY orderkey
    """


def nation_revenue_theil(sf_dir: str) -> pd.DataFrame:
    """Theil-T inequality terms of revenue across nations: per nation
    the exact revenue cents x_i, the quantized log-ratio
    q_i = round_half_up(ln(x_i·n / X)·1e9) and the contribution
    x_i·q_i (cent-nano-nats; T = Σ x_i·q_i / (X·1e9)) — the
    concentration decomposition trade economists run, with every
    published number an exact int64 (one libm call per nation from
    exact integer inputs, the value_tail_hill precedent).

    Distributed plan: customer→nation broadcast join inside
    map_batches, one nation-sum exchange, O(nations) driver fold."""
    import math

    import numpy as np
    from ray.data.aggregate import Sum

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    import ray as _ray

    nat_ref = _ray.put(
        dict(zip(cust["c_custkey"].astype(int), cust["c_nationkey"].astype(int)))
    )

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def keys(t: pa.Table) -> pd.DataFrame:
        lut = _ray.get(nat_ref)
        ck = [int(v) for v in t["o_custkey"].to_pylist()]
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {"nationkey": [lut[k] for k in ck],
             "cents": cents.astype(np.int64)}
        )

    g = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("cents", alias_name="rev"))
        .to_pandas()
        .sort_values("nationkey")
        .reset_index(drop=True)
    )
    n = len(g)
    total = int(g["rev"].sum())
    qs, contribs = [], []
    for x in g["rev"].astype(int):
        q = int(math.floor(math.log(x * n / total) * 1e9 + 0.5))
        qs.append(q)
        contribs.append(x * q)
    out = pd.DataFrame(
        {
            "nationkey": g["nationkey"].astype("int64"),
            "rev_cents": g["rev"].astype("int64"),
            "lnratio_nano": pd.Series(qs, dtype="int64"),
            "contrib": pd.Series(contribs, dtype="int64"),
        }
    )
    return out


def nation_revenue_theil_sql() -> str:
    return """
        WITH r AS (
            SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1
        ), t AS (
            SELECT CAST(SUM(rev) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM r
        )
        SELECT r.nationkey,
               r.rev AS rev_cents,
               CAST(FLOOR(ln(CAST(r.rev AS DOUBLE) * t.n / t.total) * 1e9
                          + 0.5) AS BIGINT) AS lnratio_nano,
               CAST(r.rev * CAST(FLOOR(ln(CAST(r.rev AS DOUBLE) * t.n
                                          / t.total) * 1e9 + 0.5) AS BIGINT)
                    AS BIGINT) AS contrib
        FROM r CROSS JOIN t ORDER BY r.nationkey
    """


def user_activity_lorenz(sf_dir: str) -> pd.DataFrame:
    """Lorenz decile table of user activity: users ranked by event
    count ascending (ties by user_id), folded into ten NTILE deciles
    with exact per-decile and cumulative event mass — the coordinates
    behind the Gini number, published as integers so share-of-activity
    cutoffs ('bottom 50% of users produce X events') read directly.

    Distributed plan: one user-count exchange; the decile fold runs on
    the driver over the user-count table (users, not events)."""
    import numpy as np
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    g = (
        ds.groupby("user_id")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["n", "user_id"])
        .reset_index(drop=True)
    )
    u = len(g)
    # NTILE semantics: first (u % 10) deciles get the extra user
    base, rem = divmod(u, 10)
    sizes = [base + (1 if i < rem else 0) for i in range(10)]
    rows = []
    start = 0
    cum = 0
    for i, sz in enumerate(sizes, start=1):
        chunk = g.iloc[start : start + sz]
        ev = int(chunk["n"].sum())
        cum += ev
        rows.append(
            {"decile": i, "n_users": sz, "events_in_decile": ev,
             "cum_events": cum}
        )
        start += sz
    return pd.DataFrame(rows).astype("int64")


def user_activity_lorenz_sql() -> str:
    return """
        WITH c AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ), d AS (
            SELECT n, NTILE(10) OVER (ORDER BY n, user_id) AS decile
            FROM c
        ), agg AS (
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(n) AS BIGINT) AS events_in_decile
            FROM d GROUP BY 1
        )
        SELECT decile, n_users, events_in_decile,
               CAST(SUM(events_in_decile) OVER (ORDER BY decile)
                    AS BIGINT) AS cum_events
        FROM agg ORDER BY decile
    """


def user_value_msd_median(sf_dir: str) -> pd.DataFrame:
    """Robust per-user value volatility: the exact LOWER MEDIAN of the
    absolute successive cent differences |x_i − x_{i−1}| over the
    (ts, event_id)-ordered stream — the outlier-proof alternative to
    std-of-diffs for spotting erratic spenders.  Exact order statistic
    (element (n+1)//2 of the sorted diffs); LAG + ROW_NUMBER SQL twin.
    Users with a single event emit no row.

    Distributed plan: user-keyed groupby; per group one sort + diff +
    partition."""
    import numpy as np

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        if len(cents) < 2:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_diffs": pd.Series([], dtype="int64"),
                    "median_abs_diff": pd.Series([], dtype="int64"),
                }
            )
        d = np.sort(np.abs(np.diff(cents)))
        half = (len(d) + 1) // 2
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_diffs": [len(d)],
                "median_abs_diff": [int(d[half - 1])],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def user_value_msd_median_sql() -> str:
    return """
        WITH e AS (
            SELECT user_id,
                   ABS(CAST(ROUND(value * 100) AS BIGINT)
                       - LAG(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id))
                       AS ad
            FROM events
        ), d AS (
            SELECT user_id, ad,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ad) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM e WHERE ad IS NOT NULL
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(n AS BIGINT) AS n_diffs,
               CAST(ad AS BIGINT) AS median_abs_diff
        FROM d WHERE rn = (n + 1) // 2
        ORDER BY user_id
    """


def custbal_revenue_kendall(sf_dir: str) -> pd.DataFrame:
    """Kendall tau-b sufficient statistics between customer account
    balance and realized order revenue (both in exact cents): the
    concordant / discordant / tie pair counts over all customer pairs
    — does the static balance field actually rank customers the way
    their spend does?  Engine sweeps a Fenwick tree over
    balance-sorted customers (O(n log n), the Pareto-dominance
    precedent); the SQL twin is the O(n²) self-join, exact at gate
    scale.  Customers with no orders count as zero revenue.

    Distributed plan: one custkey revenue fold joined to the customer
    projection; the pair sweep runs on the driver over the
    customer-count table (customers, not orders)."""
    import numpy as np
    from ray.data.aggregate import Sum

    rev = (
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: pa.table(
                {
                    "custkey": pc.cast(t["o_custkey"], pa.int64()),
                    "cents": _cents(t["o_totalprice"]),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("custkey")
        .aggregate(Sum("cents", alias_name="rev"))
        .to_pandas()
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    cust["bal"] = np.round(cust["c_acctbal"].to_numpy() * 100).astype(np.int64)
    m = cust.merge(
        rev, left_on="c_custkey", right_on="custkey", how="left"
    )
    m["rev"] = m["rev"].fillna(0).astype(np.int64)
    x = m["bal"].to_numpy(np.int64)
    y = m["rev"].to_numpy(np.int64)
    n = len(m)
    # sort by (x, y); sweep y through a Fenwick tree of y-ranks
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    yr = np.searchsorted(np.sort(np.unique(ys)), ys) + 1
    size = int(yr.max()) + 1
    tree = np.zeros(size + 1, dtype=np.int64)

    def update(i):
        while i <= size:
            tree[i] += 1
            i += i & (-i)

    def query(i):  # count of inserted y-ranks <= i
        s = 0
        while i > 0:
            s += tree[i]
            i -= i & (-i)
        return s

    concordant = discordant = ties_xy = ties_x_only = ties_y_only = 0
    i = 0
    inserted = 0
    while i < n:
        j = i
        while j < n and xs[j] == xs[i]:
            j += 1
        # pairs within the tie-block of x
        block = ys[i:j]
        vals, cnts = np.unique(block, return_counts=True)
        same_xy = int((cnts * (cnts - 1) // 2).sum())
        ties_xy += same_xy
        ties_x_only += len(block) * (len(block) - 1) // 2 - same_xy
        for k in range(i, j):
            r = int(yr[k])
            less = query(r - 1)
            eq = query(r) - less
            concordant += less
            ties_y_only += eq
            discordant += inserted - less - eq
        for k in range(i, j):
            update(int(yr[k]))
        inserted += j - i
        i = j
    return pd.DataFrame(
        {
            "n_customers": [n],
            "concordant": [concordant],
            "discordant": [discordant],
            "ties_x_only": [ties_x_only],
            "ties_y_only": [ties_y_only],
            "ties_xy": [ties_xy],
        }
    ).astype("int64")


def custbal_revenue_kendall_sql() -> str:
    return """
        WITH r AS (
            SELECT CAST(o_custkey AS BIGINT) AS custkey,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ), m AS (
            SELECT CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS x,
                   COALESCE(r.rev, 0) AS y
            FROM customer c LEFT JOIN r ON r.custkey = c.c_custkey
        ), pairs AS (
            SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
            FROM (SELECT x, y, ROW_NUMBER() OVER (ORDER BY x, y) AS i
                  FROM m) a
            JOIN (SELECT x, y, ROW_NUMBER() OVER (ORDER BY x, y) AS i
                  FROM m) b
              ON a.i < b.i
        )
        SELECT CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_customers,
               CAST(SUM(CASE WHEN (xa < xb AND ya < yb)
                               OR (xa > xb AND ya > yb)
                             THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
               CAST(SUM(CASE WHEN (xa < xb AND ya > yb)
                               OR (xa > xb AND ya < yb)
                             THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
               CAST(SUM(CASE WHEN xa = xb AND ya <> yb
                             THEN 1 ELSE 0 END) AS BIGINT) AS ties_x_only,
               CAST(SUM(CASE WHEN xa <> xb AND ya = yb
                             THEN 1 ELSE 0 END) AS BIGINT) AS ties_y_only,
               CAST(SUM(CASE WHEN xa = xb AND ya = yb
                             THEN 1 ELSE 0 END) AS BIGINT) AS ties_xy
        FROM pairs
    """


def boundary_timestamp_audit(sf_dir: str) -> pd.DataFrame:
    """Batch-artifact detector: per event type, how many timestamps
    fall in the FIRST and LAST second of their hour — synthetic or
    batch-stamped feeds pile up at boundaries, organic traffic
    doesn't.  Published with the exact cross-multiplied excess flag
    (n_first_sec * 3600 > 2 * n means >2x the uniform expectation).
    Pure integers; modulo-arithmetic SQL twin.

    Distributed plan: one type-keyed count exchange of three ints."""
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def keys(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        h = pc.divide(us, 3_600_000_000)
        of = pc.subtract(us, pc.multiply(h, 3_600_000_000))
        one = pa.scalar(1, pa.int64())
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "event_type": t["event_type"],
                "first_sec": pc.if_else(pc.less(of, 1_000_000), one, zero),
                "last_sec": pc.if_else(
                    pc.greater_equal(of, 3_599_000_000), one, zero
                ),
            }
        )

    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("first_sec", alias_name="n_first_sec"),
            Sum("last_sec", alias_name="n_last_sec"),
        )
        .to_pandas()
    )
    out["excess_first"] = (
        out["n_first_sec"] * 3600 > 2 * out["n"]
    ).astype("int64")
    for c in ("n", "n_first_sec", "n_last_sec"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def boundary_timestamp_audit_sql() -> str:
    return """
        WITH e AS (
            SELECT event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) % 3600000000 AS of
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN of < 1000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_first_sec,
               CAST(SUM(CASE WHEN of >= 3599000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_last_sec,
               CAST(CASE WHEN SUM(CASE WHEN of < 1000000 THEN 1 ELSE 0 END)
                              * 3600 > 2 * COUNT(*)
                         THEN 1 ELSE 0 END AS BIGINT) AS excess_first
        FROM e GROUP BY event_type ORDER BY event_type
    """
