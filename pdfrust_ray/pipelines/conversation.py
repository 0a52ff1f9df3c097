"""Conversation-level analytics over the transcript input table.

The graft input (conv_id, turn_idx, role, text, tool, ts) is more than
an extraction source: a real transcript pipeline also needs per-
conversation rollups, turn-gap latency windows, tool-usage accounting,
role-sequence statistics and conversation-level dedup. Each operator
here is SQL-oracled (DuckDB reads the same raw shards) and shaped for
10^12 turns:

  - conv_stats / tool_usage: vectorized per-row derivation in
    map_batches(pyarrow), then ONE hash groupby whose per-block partial
    combine (Ray's built-in aggregate path) keeps the shuffle at
    O(unique keys), not O(turns).
  - turn_latency / role_transitions: the LAG-window family — a single
    groupby(conv_id) shuffle co-locates each conversation, then a
    numpy diff / shift inside map_groups; no driver loops.
  - conv_fingerprints: conversation-level exact dedup — md5 of the
    turn-ordered text concatenation per conv (one key-partitioned
    shuffle; the fingerprint, 32 bytes, is what a second dedup groupby
    would move at scale, never the text).

Timestamps travel as epoch microseconds (int64) so the value-hash
comparison against DuckDB's epoch_us() is exact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

_SEP = "\x1f"  # unit separator: cannot appear in fixture texts


def _epoch_us(ts: "pa.ChunkedArray") -> "pa.ChunkedArray":
    return pc.cast(ts, pa.int64())


def conv_stats(corpus_dir: str) -> pd.DataFrame:
    """Per-conversation rollup: turn counts by role, total text chars,
    tool-call count, first/last timestamp and duration.

    One groupby(conv_id) over per-row derived int columns; Ray's
    aggregate combines per block before the shuffle, so at corpus scale
    the exchange carries one partial row per (block, conv)."""
    ds = rd.read_parquet(f"{corpus_dir}/shards")

    def derive(t: pa.Table) -> pa.Table:
        role = t["role"]
        one = pa.scalar(1, pa.int64())
        zero = pa.scalar(0, pa.int64())

        def flag(mask):
            return pc.if_else(mask, one, zero)

        return pa.table(
            {
                "conv_id": t["conv_id"],
                "is_user": flag(pc.equal(role, "user")),
                "is_assistant": flag(pc.equal(role, "assistant")),
                "is_tool_role": flag(pc.equal(role, "tool")),
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
                "has_tool": flag(pc.not_equal(t["tool"], "")),
                "ts_us": _epoch_us(t["ts"]),
            }
        )

    out = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Count(alias_name="n_turns"),
            Sum("is_user", alias_name="n_user_turns"),
            Sum("is_assistant", alias_name="n_assistant_turns"),
            Sum("is_tool_role", alias_name="n_tool_turns"),
            Sum("n_chars", alias_name="total_chars"),
            Sum("has_tool", alias_name="n_tool_calls"),
            Min("ts_us", alias_name="first_ts_us"),
            Max("ts_us", alias_name="last_ts_us"),
        )
        .to_pandas()
    )
    out["duration_us"] = out["last_ts_us"] - out["first_ts_us"]
    for c in out.columns:
        if c != "conv_id":
            out[c] = out[c].astype("int64")
    return out.sort_values("conv_id").reset_index(drop=True)


def conv_stats_sql(shards_glob: str) -> str:
    return f"""
        SELECT conv_id,
               COUNT(*) AS n_turns,
               CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_user_turns,
               CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_assistant_turns,
               CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tool_turns,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tool_calls,
               MIN(epoch_us(ts)) AS first_ts_us,
               MAX(epoch_us(ts)) AS last_ts_us,
               MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us
        FROM read_parquet('{shards_glob}')
        GROUP BY conv_id ORDER BY conv_id
    """


def turn_latency(corpus_dir: str) -> pd.DataFrame:
    """LAG window: per turn, microseconds since the previous turn of the
    same conversation (-1 for the opening turn).

    groupby(conv_id) co-locates a conversation, map_groups sorts by
    turn_idx and takes a vectorized diff — the standard Ray expression
    of PARTITION BY ... ORDER BY ... LAG."""
    ds = rd.read_parquet(
        f"{corpus_dir}/shards", columns=["conv_id", "turn_idx", "role", "ts"]
    )

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable").reset_index(drop=True)
        us = g["ts"].astype("int64").to_numpy()
        gap = np.empty(len(us), dtype=np.int64)
        gap[0] = -1
        gap[1:] = us[1:] - us[:-1]
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"].astype("int64"),
                "role": g["role"],
                "gap_us": gap,
            }
        )

    out = ds.groupby("conv_id").map_groups(per_conv, batch_format="pandas").to_pandas()
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def turn_latency_sql(shards_glob: str) -> str:
    return f"""
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
               COALESCE(epoch_us(ts) - LAG(epoch_us(ts))
                            OVER (PARTITION BY conv_id ORDER BY turn_idx),
                        -1) AS gap_us
        FROM read_parquet('{shards_glob}')
        ORDER BY conv_id, turn_idx
    """


def tool_usage(corpus_dir: str) -> pd.DataFrame:
    """Per-tool accounting over tool-call turns (tool <> ''): call
    count, distinct conversations, total payload chars."""
    ds = rd.read_parquet(f"{corpus_dir}/shards", columns=["conv_id", "tool", "text"])

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["tool"], ""))
        return pa.table(
            {
                "tool": t["tool"],
                "conv_id": t["conv_id"],
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    # distinct conv count needs a two-level agg: first (tool, conv)
    # partials, then per-tool merge — both hash groupbys over keys only.
    per_conv = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["tool", "conv_id"])
        .aggregate(Count(alias_name="n_calls"), Sum("n_chars", alias_name="n_chars"))
    )
    out = (
        per_conv.groupby("tool")
        .aggregate(
            Sum("n_calls", alias_name="n_calls"),
            Count(alias_name="n_convs"),
            Sum("n_chars", alias_name="total_chars"),
        )
        .to_pandas()
    )
    for c in ("n_calls", "n_convs", "total_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("tool").reset_index(drop=True)


def tool_usage_sql(shards_glob: str) -> str:
    return f"""
        SELECT tool,
               COUNT(*) AS n_calls,
               CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars
        FROM read_parquet('{shards_glob}')
        WHERE tool <> ''
        GROUP BY tool ORDER BY tool
    """


def role_transitions(corpus_dir: str) -> pd.DataFrame:
    """Corpus-wide role-bigram counts: how often does role A hand off
    to role B within a conversation.

    Two-level combiner: per-conversation pair counts inside map_groups
    (tiny), then a global groupby(prev_role, role) merge — the shuffle
    moves at most |roles|^2 rows per conversation group."""
    ds = rd.read_parquet(f"{corpus_dir}/shards", columns=["conv_id", "turn_idx", "role"])

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable")
        r = g["role"].to_numpy()
        if len(r) < 2:
            return pd.DataFrame({"prev_role": [], "role": [], "n": []})
        pairs = pd.DataFrame({"prev_role": r[:-1], "role": r[1:]})
        out = pairs.groupby(["prev_role", "role"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    out = (
        ds.groupby("conv_id")
        .map_groups(per_conv, batch_format="pandas")
        .groupby(["prev_role", "role"])
        .aggregate(Sum("n", alias_name="n_transitions"))
        .to_pandas()
    )
    out["n_transitions"] = out["n_transitions"].astype("int64")
    return out.sort_values(["prev_role", "role"]).reset_index(drop=True)


def role_transitions_sql(shards_glob: str) -> str:
    return f"""
        SELECT prev_role, role, COUNT(*) AS n_transitions
        FROM (
            SELECT LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                       AS prev_role,
                   role
            FROM read_parquet('{shards_glob}')
        )
        WHERE prev_role IS NOT NULL
        GROUP BY prev_role, role
        ORDER BY prev_role, role
    """


def conv_fingerprints(corpus_dir: str) -> pd.DataFrame:
    """Conversation-level exact dedup: md5 over the turn-ordered text
    concatenation (US-separated), grouped to (fingerprint, n_convs,
    first_conv). Two shuffles, both over keys/fingerprints — the text
    never moves past the first groupby."""
    ds = rd.read_parquet(f"{corpus_dir}/shards", columns=["conv_id", "turn_idx", "text"])

    def fp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable")
        blob = _SEP.join(g["text"].tolist()).encode("utf-8")
        return pd.DataFrame(
            {
                "fingerprint": [hashlib.md5(blob).hexdigest()],
                "conv_id": [g["conv_id"].iloc[0]],
            }
        )

    out = (
        ds.groupby("conv_id")
        .map_groups(fp, batch_format="pandas")
        .groupby("fingerprint")
        .aggregate(Count(alias_name="n_convs"), Min("conv_id", alias_name="first_conv"))
        .to_pandas()
    )
    out["n_convs"] = out["n_convs"].astype("int64")
    return out.sort_values("fingerprint").reset_index(drop=True)


def conv_fingerprints_sql(shards_glob: str) -> str:
    return f"""
        SELECT fingerprint, COUNT(*) AS n_convs, MIN(conv_id) AS first_conv
        FROM (
            SELECT conv_id,
                   md5(string_agg(text, chr(31) ORDER BY turn_idx)) AS fingerprint
            FROM read_parquet('{shards_glob}')
            GROUP BY conv_id
        )
        GROUP BY fingerprint ORDER BY fingerprint
    """
