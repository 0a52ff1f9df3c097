"""Incremental stateful streaming over an ordered event log.

Ray Data has no event-time windows or watermarks; the guide-blessed
pattern for semantics that genuinely need INCREMENTAL state (emit
closed sessions as the stream advances, not at the end of a batch
job) is raw Ray actors: one actor per key-hash bucket, fed
micro-batches in timestamp order. This module implements that shape
once, end-to-end, and pins it against the batch operator's exact SQL
oracle — the streaming replay must close exactly the sessions the
batch groupby computes.

Partitioning assumptions (documented per the custom-operator rule):
  - the feed is globally ts-ordered (here: one Dataset.sort("ts") —
    at 100 TB the log would already arrive time-ordered per partition
    and only per-bucket order matters);
  - bucket = user_id % n_buckets, so one user's events always hit the
    same actor in order (Ray guarantees submission-order execution of
    actor calls from a single caller);
  - actor state is O(open sessions per bucket), not O(history) — the
    whole point of the streaming shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


@ray.remote
class _SessionBucket:
    """Per-bucket session state machine: open sessions keyed by user,
    closed sessions emitted incrementally from each feed() call."""

    def __init__(self, gap_us: int):
        self.gap = gap_us
        self.open: dict[int, list[int]] = {}  # user -> [start, end, n, sid]
        self.next_sid: dict[int, int] = {}

    def feed(self, users: np.ndarray, ts_us: np.ndarray) -> list[tuple]:
        out = []
        for u, t in zip(users.tolist(), ts_us.tolist()):
            st = self.open.get(u)
            if st is None:
                self.next_sid[u] = self.next_sid.get(u, 0) + 1
                self.open[u] = [t, t, 1, self.next_sid[u]]
            elif t - st[1] > self.gap:
                out.append((u, st[3], st[2], st[0], st[1]))
                self.next_sid[u] += 1
                self.open[u] = [t, t, 1, self.next_sid[u]]
            else:
                st[1] = t
                st[2] += 1
        return out

    def flush(self) -> list[tuple]:
        return [
            (u, st[3], st[2], st[0], st[1]) for u, st in self.open.items()
        ]


def streaming_sessionize(
    sf_dir: str,
    gap_minutes: int = 30,
    n_buckets: int = 8,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Incremental sessionization of the event log: replay events in
    ts order through per-bucket state actors; sessions close (and are
    emitted) the moment their gap expires, long before the stream
    ends. Final output is identical to the batch `sessionize`
    operator and shares its exact SQL oracle."""
    gap_us = gap_minutes * 60_000_000
    actors = [_SessionBucket.remote(gap_us) for _ in range(n_buckets)]

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).sort(
        "ts"
    )
    pending = []
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=batch_size):
        users = batch["user_id"].to_numpy()
        ts_us = batch["ts"].cast(pa.int64()).to_numpy()
        b = users % n_buckets
        for i in range(n_buckets):
            m = b == i
            if m.any():
                pending.append(actors[i].feed.remote(users[m], ts_us[m]))
    pending.extend(a.flush.remote() for a in actors)
    rows = [r for part in ray.get(pending) for r in part]

    out = pd.DataFrame(
        rows, columns=["user_id", "session_id", "n_events", "start_us", "end_us"]
    )
    out["session_start"] = pd.to_datetime(out["start_us"], unit="us")
    out["session_end"] = pd.to_datetime(out["end_us"], unit="us")
    out = out.drop(columns=["start_us", "end_us"])
    for c in ("user_id", "session_id", "n_events"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["user_id", "session_id"]).reset_index(drop=True)


@ray.remote
class _DedupBucket:
    """Per-bucket suppression state: last-seen ts per (user, type) —
    O(active keys), not O(history)."""

    def __init__(self, window_us: int):
        self.window = window_us
        self.last: dict[tuple[int, str], int] = {}

    def feed(
        self,
        event_ids: np.ndarray,
        users: np.ndarray,
        types: list[str],
        ts_us: np.ndarray,
    ) -> list[tuple]:
        out = []
        for e, u, ty, t in zip(
            event_ids.tolist(), users.tolist(), types, ts_us.tolist()
        ):
            k = (u, ty)
            prev = self.last.get(k)
            if prev is None or t - prev > self.window:
                out.append((e, u, ty, t))
            self.last[k] = t
        return out


def streaming_windowed_dedup(
    sf_dir: str,
    window_us: int = 3_600_000_000,
    n_buckets: int = 8,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Incremental replay of the windowed_event_dedup rule (emit an
    event iff no same-(user, type) event occurred within the trailing
    hour): events stream in (ts, event_id) order through per-bucket
    suppression actors that keep only the last-seen timestamp per key —
    the alerting/metering dedup as an ACTUAL stream with O(keys) state,
    emitting survivors immediately. Output is identical to the batch
    operator and shares its exact LAG-window SQL oracle. Same
    partitioning contract as streaming_sessionize: per-bucket order
    preserved by bucketing on user_id and feeding from one ts-sorted
    scan."""
    actors = [_DedupBucket.remote(window_us) for _ in range(n_buckets)]

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    ).sort(["ts", "event_id"])
    pending = []
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=batch_size):
        eids = batch["event_id"].to_numpy()
        users = batch["user_id"].to_numpy()
        types = batch["event_type"].to_pylist()
        ts_us = batch["ts"].cast(pa.int64()).to_numpy()
        b = users % n_buckets
        for i in range(n_buckets):
            m = b == i
            if m.any():
                pending.append(
                    actors[i].feed.remote(
                        eids[m], users[m], [types[j] for j in np.nonzero(m)[0]], ts_us[m]
                    )
                )
    rows = [r for part in ray.get(pending) for r in part]
    out = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts_us"])
    for c in ("event_id", "user_id", "ts_us"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


@ray.remote
class _HeavyHitterBucket:
    """Per-bucket SpaceSaving summary over event types: capacity-k
    (type -> count, overestimate) table with the classic min-eviction
    rule.  Deterministic given the feed order; eviction ties break to
    the lexicographically smallest type."""

    def __init__(self, capacity: int):
        self.cap = capacity
        self.counts: dict[str, int] = {}
        self.err: dict[str, int] = {}
        self.n_fed = 0

    def feed(self, types: list[str]) -> int:
        for t in types:
            self.n_fed += 1
            if t in self.counts:
                self.counts[t] += 1
            elif len(self.counts) < self.cap:
                self.counts[t] = 1
                self.err[t] = 0
            else:
                victim = min(self.counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
                vcount = self.counts.pop(victim)
                self.err.pop(victim)
                self.counts[t] = vcount + 1
                self.err[t] = vcount
        return self.n_fed

    def summary(self) -> tuple:
        items = [(t, c, self.err[t]) for t, c in sorted(self.counts.items())]
        # upper bound for ABSENT types in this bucket: the current min
        # estimate if the table ever filled (an absent type may have
        # been evicted with up to min count), else 0 (never evicted)
        absent_bound = (
            min(self.counts.values()) if len(self.counts) >= self.cap else 0
        )
        return items, absent_bound


def streaming_heavy_hitters(
    sf_dir: str, capacity: int = 4, n_buckets: int = 8
) -> pd.DataFrame:
    """Streaming heavy-hitter replay: SpaceSaving summaries (capacity
    4 per bucket) maintained incrementally by per-bucket actors over
    the ts-ordered event feed, merged at the end — the O(k)-memory
    top-type monitor a stream processor runs where exact counts are
    unaffordable.  The SpaceSaving invariant (est - err <= true <=
    est, and any type with true count > n_bucket/capacity is present)
    is asserted against exact counts in tests; the merged summary also
    reports per-type guaranteed lower bounds.

    Partitioning assumptions: bucket = user_id % n_buckets (same-user
    order preserved per actor); summaries merge by summing estimates
    and errors, which preserves the invariant bucket-wise.  The feed
    streams from `iter_batches` over the ts-sorted Dataset (like its
    sessionize/windowed-dedup siblings) — the full event log is never
    collected to the driver."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).sort("ts")
    actors = [_HeavyHitterBucket.remote(capacity) for _ in range(n_buckets)]
    pending = []
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        users = batch["user_id"].to_numpy()
        types = batch["event_type"].to_pylist()
        b = users % n_buckets
        for i in range(n_buckets):
            m = b == i
            if m.any():
                pending.append(
                    actors[i].feed.remote([types[j] for j in np.nonzero(m)[0]])
                )
    ray.get(pending)
    summaries = ray.get([a.summary.remote() for a in actors])
    # merge rule: a bucket where the type is PRESENT contributes its
    # estimate (and lower bound est - err); a bucket where it is
    # ABSENT contributes its absent_bound to the upper bound only —
    # summing bare estimates would UNDERCOUNT evicted types and break
    # est >= true (caught by the invariant test)
    types = sorted({t for items, _ in summaries for t, _, _ in items})
    rows = []
    for t in types:
        upper = 0
        lower = 0
        for items, absent_bound in summaries:
            lut = {it[0]: it for it in items}
            if t in lut:
                _, c, e = lut[t]
                upper += c
                lower += c - e
            else:
                upper += absent_bound
        rows.append(
            {"event_type": t, "est_count": upper,
             "max_overcount": upper - lower, "guaranteed_min": lower}
        )
    out = pd.DataFrame(rows)
    for c in ("est_count", "max_overcount", "guaranteed_min"):
        out[c] = out[c].astype("int64")
    return out


def heavy_hitters_det(
    sf_dir: str, capacity: int = 4, block_width: int = 64
) -> pd.DataFrame:
    """DETERMINISTIC-PARTITION heavy hitters — the quantile_sketch_det
    move applied to the last sequential-state family: blocked
    Misra-Gries summaries over fixed (ts, event_id)-rank blocks,
    combined by a deterministic pairwise merge tree. SpaceSaving's
    actor replay (streaming_heavy_hitters) is justifiably rows-only —
    its per-bucket feed order depends on Ray's ts-sort tie order; this
    sibling pins EVERY step to the total (ts, event_id) order, so an
    exact recursive-CTE twin replays it bit-for-bit.

    Spec (classic MG + mergeable-summaries merge, Agarwal et al. 2012):

      block b = global_rank // block_width; within a block, per item:
        counter hit -> +1; room (< capacity keys) -> insert 1;
        else decrement ALL counters by 1 and drop zeros;
      merge(a, b): sum counters over the key union; if more than
        `capacity` keys remain, subtract the (capacity+1)-th largest
        value and drop non-positives (at most `capacity` survive);
      tree: round m pairs block 2i with 2i+1 (odd block passes
        through) until one summary remains.

    The survivors' counters are guaranteed LOWER bounds on true
    counts, and any type with true count > n/(capacity+1) survives —
    both pinned against exact counts in pytest.

    Scale shape: global ranks via the bounded hour-bucket offset fold
    (counts per hour -> driver prefix -> broadcast), block summaries
    via ONE block-keyed groupby (each group holds block_width rows),
    and the O(B * capacity) summary rows tree-merge on the driver —
    the corpus is never collected.

    Output: (event_type, mg_count) ORDER BY mg_count DESC, type."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        tsu = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        hour = pc.divide(tsu, 3_600_000_000)
        return pa.table(
            {
                "hour": hour,
                "tsu": tsu,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    per_hour = (
        prepped.groupby("hour")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    offs = per_hour["n"].cumsum().shift(1, fill_value=0)
    off_of = dict(zip(per_hour["hour"].astype(int), offs.astype(int)))
    oref = ray.put(off_of)

    def ranks_of_hour(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref)[int(g["hour"].iloc[0])]
        g = g.sort_values(["tsu", "event_id"], kind="mergesort").reset_index(drop=True)
        pos = off + np.arange(len(g))
        return pd.DataFrame(
            {
                "block": pos // block_width,
                "pos": pos,
                "event_type": g["event_type"],
            }
        )

    def mg_of_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("pos")
        c: dict = {}
        for k in g["event_type"]:
            if k in c:
                c[k] += 1
            elif len(c) < capacity:
                c[k] = 1
            else:
                c = {k2: v - 1 for k2, v in c.items() if v - 1 > 0}
        return pd.DataFrame(
            {
                "block": np.int64(g["block"].iloc[0]),
                "key": list(c.keys()),
                "val": pd.Series(list(c.values()), dtype="int64"),
            }
        )

    summaries = (
        prepped.groupby("hour")
        .map_groups(ranks_of_hour, batch_format="pandas")
        .groupby("block")
        .map_groups(mg_of_block, batch_format="pandas")
        .to_pandas()
    )

    # deterministic pairwise merge tree on the bounded summary rows
    state: dict[int, dict[str, int]] = {}
    for r in summaries.itertuples(index=False):
        state.setdefault(int(r.block), {})[r.key] = int(r.val)

    def merge(a: dict, b: dict) -> dict:
        m = dict(a)
        for k, v in b.items():
            m[k] = m.get(k, 0) + v
        if len(m) > capacity:
            s = sorted(m.values(), reverse=True)[capacity]
            m = {k: v - s for k, v in m.items() if v - s > 0}
        return m

    while len(state) > 1:
        nxt: dict[int, dict[str, int]] = {}
        for blk in sorted(state):
            tgt = blk // 2
            nxt[tgt] = merge(nxt[tgt], state[blk]) if tgt in nxt else dict(state[blk])
        state = nxt

    final = state.popitem()[1] if state else {}
    out = pd.DataFrame(
        sorted(final.items(), key=lambda kv: (-kv[1], kv[0])),
        columns=["event_type", "mg_count"],
    )
    if not len(out):
        out = pd.DataFrame(
            {"event_type": pd.Series([], dtype="object"),
             "mg_count": pd.Series([], dtype="int64")}
        )
    out["mg_count"] = out["mg_count"].astype("int64")
    return out.reset_index(drop=True)


def heavy_hitters_det_sql(capacity: int = 4, block_width: int = 64) -> str:
    """Exact twin of heavy_hitters_det: one recursive CTE whose rounds
    first replay each block's Misra-Gries stream one item per round
    (ALL blocks advance simultaneously), then run the pairwise merge
    tree one level per round (block -> block // 2, sum counters,
    subtract the (capacity+1)-th largest, keep positives)."""
    merge_rounds = 40  # >> log2(any fixture block count); inert extras
    return f"""
WITH RECURSIVE items AS MATERIALIZED (
    SELECT (row_number() OVER (ORDER BY ts, event_id) - 1)
               // {block_width} AS block,
           (row_number() OVER (ORDER BY ts, event_id) - 1)
               % {block_width} AS local_pos,
           event_type AS key
    FROM events
),
nblocks AS (SELECT MAX(block) + 1 AS b FROM items),
mg(r, block, key, val) AS (
    -- round 0 processes each block's item 0: always an insert
    SELECT 0, block, key, CAST(1 AS BIGINT)
    FROM items WHERE local_pos = 0
    UNION ALL
    (
      WITH prev AS (SELECT * FROM mg),
      rr AS (SELECT MAX(r) AS r FROM prev),
      -- ---------------- stream phase: rounds 1 .. block_width-1
      it AS (
          SELECT i.block, i.key FROM items i, rr
          WHERE rr.r + 1 < {block_width} AND i.local_pos = rr.r + 1
      ),
      cnt AS (SELECT block, COUNT(*) AS n FROM prev GROUP BY 1),
      hit AS (
          SELECT p.block FROM prev p JOIN it
            ON it.block = p.block AND it.key = p.key
      ),
      in_stream AS (SELECT rr.r + 1 < {block_width} AS go FROM rr),
      stream_next AS (
          -- blocks without an item this round: carry unchanged
          SELECT p.block, p.key, p.val FROM prev p, in_stream
          WHERE in_stream.go AND p.block NOT IN (SELECT block FROM it)
          UNION ALL
          -- hit: +1 on the matched key, carry the rest
          SELECT p.block, p.key,
                 p.val + CASE WHEN it.key = p.key THEN 1 ELSE 0 END
          FROM prev p JOIN it ON it.block = p.block
          WHERE p.block IN (SELECT block FROM hit)
          UNION ALL
          -- miss with room: carry all, insert the new key at 1
          SELECT p.block, p.key, p.val
          FROM prev p JOIN cnt ON cnt.block = p.block
          WHERE p.block IN (SELECT block FROM it)
            AND p.block NOT IN (SELECT block FROM hit)
            AND cnt.n < {capacity}
          UNION ALL
          SELECT it.block, it.key, CAST(1 AS BIGINT)
          FROM it LEFT JOIN cnt ON cnt.block = it.block
          WHERE it.block NOT IN (SELECT block FROM hit)
            AND COALESCE(cnt.n, 0) < {capacity}
          UNION ALL
          -- miss with a full summary: decrement all, drop zeros
          SELECT p.block, p.key, p.val - 1
          FROM prev p JOIN cnt ON cnt.block = p.block
          WHERE p.block IN (SELECT block FROM it)
            AND p.block NOT IN (SELECT block FROM hit)
            AND cnt.n >= {capacity} AND p.val - 1 > 0
      ),
      -- ---------------- merge phase: one tree level per round
      can_merge AS (
          SELECT (SELECT COUNT(DISTINCT block) FROM prev) > 1 AS go
      ),
      summed AS (
          SELECT p.block // 2 AS block, p.key, SUM(p.val) AS val
          FROM prev p, rr, can_merge
          WHERE rr.r + 1 >= {block_width} AND can_merge.go
          GROUP BY 1, 2
      ),
      thr AS (
          SELECT block,
                 COALESCE(MAX(CASE WHEN rn = {capacity} + 1 THEN val END), 0) AS s
          FROM (
              SELECT block, val,
                     row_number() OVER (PARTITION BY block
                                        ORDER BY val DESC, key) AS rn
              FROM summed
          ) GROUP BY 1
      ),
      merge_next AS (
          SELECT s2.block, s2.key, CAST(s2.val - thr.s AS BIGINT) AS val
          FROM summed s2 JOIN thr ON thr.block = s2.block
          WHERE s2.val - thr.s > 0
      )
      SELECT rr.r + 1, x.block, x.key, x.val
      FROM rr, (
          SELECT * FROM stream_next
          UNION ALL
          SELECT * FROM merge_next
      ) x
      WHERE rr.r + 1 < {block_width} + {merge_rounds}
        AND (rr.r + 1 < {block_width}
             OR EXISTS (SELECT 1 FROM merge_next))
    )
)
SELECT key AS event_type, CAST(val AS BIGINT) AS mg_count
FROM mg WHERE r = (SELECT MAX(r) FROM mg)
ORDER BY val DESC, key
    """
