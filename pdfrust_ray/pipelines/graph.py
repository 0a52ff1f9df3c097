"""Distributed graph analytics over relational-derived edge lists.

PageRank joins the iterative-algorithm family (k-means, BPE, Lloyd
rounds) with the graph shape the inventory was missing: per round, the
edge list streams once, each edge forwards its source's rank share to
its destination, and a node-keyed groupby sums contributions. All
arithmetic is INTEGER (pico-rank units, floor division, damping as
*85 // 100), so a SQL twin with unrolled CTE rounds matches
bit-for-bit — no float order-of-summation hazard.

Scale notes: the rank/degree tables are node-cardinality-sized and are
broadcast per round (ray.put once per round); at web-graph scale
(nodes >> driver RAM) each round becomes edges.join(ranks, on=src) +
groupby(dst) — the same exchange dedup_clusters documents for its
distributed-label path. The edge build reuses the hash-partitioned
Dataset.join of order_priority_revenue.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

# suppliers are offset into their own node-id range so a custkey and a
# suppkey with the same integer never merge into one graph node
SUPP_OFFSET = 1_000_000
_R0 = 1_000_000_000_000  # initial rank: 1.0 in pico-units
_TELEPORT = 150_000_000_000  # (1 - 0.85) * R0


def _edges(sf_dir: str) -> pd.DataFrame:
    """Distinct (custkey -> suppkey+OFFSET) edges from the order/line
    fact tables: hash-partitioned join on orderkey (both sides fact-
    sized), then a pair-keyed groupby collapses duplicates so the edge
    list carries each relationship once."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    joined = li.join(
        od,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["o_custkey"],
                "dst": pa.compute.add(t["l_suppkey"], SUPP_OFFSET),
            }
        )

    out = (
        joined.map_batches(pairs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()[["src", "dst"]]
    )
    return out.astype({"src": "int64", "dst": "int64"})


def bipartite_pagerank(sf_dir: str, n_rounds: int = 2, k: int = 20) -> pd.DataFrame:
    """Integer PageRank over the customer->supplier purchase graph:
    rank_{t+1}(v) = TELEPORT + sum over in-edges of
    (rank_t(u) // outdeg(u)) * 85 // 100. Returns the top-k nodes by
    (rank DESC, node ASC) after n_rounds."""
    edges_df = _edges(sf_dir)
    edges = rd.from_pandas(edges_df)

    deg = edges_df.groupby("src").size()
    nodes = np.union1d(edges_df["src"].unique(), edges_df["dst"].unique())
    ranks = {int(n): _R0 for n in nodes}

    for _ in range(n_rounds):
        state = ray.put((dict(deg), ranks))

        def contrib(t: pa.Table) -> pa.Table:
            d, r = ray.get(state)
            src = t["src"].to_numpy()
            share = np.array(
                [(r[int(s)] // d[int(s)]) * 85 // 100 for s in src], dtype=np.int64
            )
            return pa.table({"node": t["dst"], "contrib": pa.array(share, pa.int64())})

        c = (
            edges.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("contrib", alias_name="contrib"))
            .to_pandas()
        )
        lut = dict(zip(c["node"].astype(int), c["contrib"].astype(int)))
        ranks = {int(n): _TELEPORT + lut.get(int(n), 0) for n in nodes}

    out = pd.DataFrame(
        {"node": list(ranks), "r": pd.Series(list(ranks.values()), dtype="int64")}
    )
    out["node"] = out["node"].astype("int64")
    out = out.sort_values(["r", "node"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def bipartite_pagerank_sql(n_rounds: int = 2, k: int = 20) -> str:
    assert n_rounds == 2, "SQL twin is unrolled for 2 rounds"
    return f"""
        WITH edges AS (SELECT DISTINCT o.o_custkey AS src,
                              l.l_suppkey + {SUPP_OFFSET} AS dst
                       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
        r0 AS (SELECT node, CAST({_R0} AS BIGINT) AS r FROM nodes),
        c1 AS (SELECT e.dst AS node,
                      CAST(SUM((r0.r // deg.d) * 85 // 100) AS BIGINT) AS contrib
               FROM edges e JOIN r0 ON r0.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY e.dst),
        r1 AS (SELECT n.node, CAST({_TELEPORT} + COALESCE(c1.contrib, 0) AS BIGINT) AS r
               FROM nodes n LEFT JOIN c1 USING (node)),
        c2 AS (SELECT e.dst AS node,
                      CAST(SUM((r1.r // deg.d) * 85 // 100) AS BIGINT) AS contrib
               FROM edges e JOIN r1 ON r1.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY e.dst),
        r2 AS (SELECT n.node, CAST({_TELEPORT} + COALESCE(c2.contrib, 0) AS BIGINT) AS r
               FROM nodes n LEFT JOIN c2 USING (node))
        SELECT node, r FROM r2 ORDER BY r DESC, node LIMIT {k}
    """
