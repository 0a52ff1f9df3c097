"""Mergeable distributed sketches: HyperLogLog and heavy hitters.

At 10^12 rows, COUNT(DISTINCT) and global top-k are the two aggregates
whose exact form forces a full-key shuffle. Both have classical
bounded-memory mergeable summaries, and both fit Ray Data's combiner
shape exactly: map_batches emits one fixed-size partial per (block,
group), a key-partitioned groupby merges them, and the exchange volume
is O(groups x sketch size) — independent of row count.

- HyperLogLog (Flajolet et al., "HyperLogLog: the analysis of a
  near-optimal cardinality estimation algorithm", AofA 2007): 2^p
  8-bit registers, elementwise-max mergeable. Registers travel as a
  single binary cell per partial, so the shuffle moves kilobytes per
  block regardless of block row count. Deterministic here (fixed
  splitmix64 hash), so results are reproducible run to run.

- Heavy hitters (Misra-Gries, "Finding repeated elements", 1982):
  per-block summaries of capacity m guarantee, by pigeonhole, that any
  token with GLOBAL relative frequency > 1/m exceeds 1/m locally in at
  least one block and therefore survives that block's summary. The
  union of per-block candidates is then recounted EXACTLY in a second
  filtered pass (broadcast membership, vocabulary-sized groupby), so
  the final top-k is exact and SQL-oracleable while the full-vocabulary
  shuffle of a naive top-k never happens.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

_HLL_P = 14  # 2^14 = 16384 registers, standard error ~0.81%


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Public-domain splitmix64 finalizer (Steele/Lea/Flagg, JDK 8
    SplittableRandom): full-avalanche 64-bit mix, vectorized."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return z ^ (z >> np.uint64(31))


def _hll_partial(values: np.ndarray, p: int = _HLL_P) -> bytes:
    """Registers for one block of int64 keys, as a 2^p-byte blob."""
    m = 1 << p
    h = _splitmix64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # rho = position of the leftmost 1-bit in the remaining 64-p bits
    # (1-based), computed via bit_length of the shifted-down value.
    nbits = np.zeros(len(h), dtype=np.uint8)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):  # branchless bit_length
        mask = v >= (np.uint64(1) << np.uint64(shift))
        nbits[mask] += shift
        v[mask] >>= np.uint64(shift)
    nbits[rest > 0] += 1  # bit_length of nonzero v
    rho = np.where(rest == 0, 64 - p + 1, 64 - nbits + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs.tobytes()


def _hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator with linear-counting small-range
    correction (Flajolet et al. 2007, §4).

    The indicator sum is folded as the EXACT integer
    S51 = sum_j 2^(51 - reg_j)  (reg <= 64-p+1 = 51, so every term is
    integral; S51 <= m * 2^51 < 2^65 fits a Python int / SQL HUGEINT)
    and the float division happens once at the end — this makes the
    whole estimator a pure function of the register multiset with ONE
    deterministic rounding, reproducible bit-for-bit by the DuckDB twin
    (hll_distinct_users_sql), instead of an order-dependent float sum."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    counts = np.bincount(regs.astype(np.int64), minlength=52)
    s51 = sum(int(c) << (51 - r) for r, c in enumerate(counts.tolist()) if c)
    est = alpha * m * m * 2.0**51 / float(s51)
    zeros = int(counts[0])
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct user_id per event_type (plus a corpus-wide
    '__all__' row) via mergeable HyperLogLog partials.

    Ray shape: map_batches emits ONE (event_type, 16KiB-register-blob)
    row per group per block; groupby(event_type).map_groups folds the
    blobs with elementwise max and evaluates the estimator. The
    exchange is O(types x blocks x 16KiB) — row count never shuffles.
    Deterministic: fixed hash, max is order-independent — and therefore
    SQL-oracled EXACTLY (hll_distinct_users_sql recomputes the sketch
    and estimator value-for-value in DuckDB)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partials(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(), "user_id": t["user_id"].to_pandas()}
        )
        rows = []
        for et, g in df.groupby("event_type"):
            rows.append((et, _hll_partial(g["user_id"].to_numpy())))
        rows.append(("__all__", _hll_partial(df["user_id"].to_numpy())))
        return pd.DataFrame({"event_type": [r[0] for r in rows], "regs": [r[1] for r in rows]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(1 << _HLL_P, dtype=np.uint8)
        for blob in g["regs"]:
            np.maximum(acc, np.frombuffer(blob, dtype=np.uint8), out=acc)
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "est_distinct_users": [_hll_estimate(acc)]}
        )

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    out["est_distinct_users"] = out["est_distinct_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def heavy_tokens(sf_dir: str, k: int = 50, m: int = 4096) -> pd.DataFrame:
    """Exact corpus-wide top-k tokens via a Misra-Gries candidate pass
    plus an exact filtered recount — the sketch bounds the shuffle, the
    recount restores exactness, so the result is SQL-oracleable.

    Guarantee: a token with global frequency share > 1/m has, by
    pigeonhole, local share > 1/m in >=1 block, so it survives that
    block's capacity-m Misra-Gries summary and is in the candidate
    union. With m >> k the true top-k are all candidates (asserted in
    tests; the SQL oracle would flag any miss). Candidate union is
    <= m x blocks rows — vocabulary-bounded, never corpus-bounded; the
    recount shuffle moves one row per (block, candidate) instead of one
    per distinct token."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def mg_candidates(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for txt in t["text"].to_pylist():
            counts.update(txt.lower().split())
        # Batch-form Misra-Gries: subtracting the (m+1)-th largest count
        # from every counter and dropping non-positives is equivalent to
        # running the classic decrement loop to <= m live counters.
        if len(counts) > m:
            thresh = sorted(counts.values(), reverse=True)[m]
            counts = Counter({t_: c - thresh for t_, c in counts.items() if c > thresh})
        return pa.table({"token": pa.array(list(counts.keys()), pa.string())})

    cands = (
        ds.map_batches(mg_candidates, batch_format="pyarrow")
        .unique("token")
    )
    cand_ref = ray.put(set(cands))

    def recount(t: pa.Table) -> pa.Table:
        keep = ray.get(cand_ref)
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            c.update(tok for tok in txt.lower().split() if tok in keep)
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(np.fromiter(c.values(), dtype=np.int64), pa.int64()),
            }
        )

    out = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()
        .astype({"cnt": "int64"})
    )
    return out.reset_index(drop=True)[["token", "cnt"]]


def heavy_tokens_sql(k: int = 50) -> str:
    return rf"""
        WITH toks AS (
          SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                    w -> w <> '')) AS token
          FROM documents
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks GROUP BY token
        ORDER BY cnt DESC, token LIMIT {k}
    """


# --- Count-Min sketch (Cormode & Muthukrishnan, "An improved data
# stream summary: the count-min sketch and its applications", 2005) ---

_CMS_D = 4
_CMS_W = 2048
_CMS_SEEDS = np.array(
    [0xA076_1D64_78BD_642F, 0xE703_7ED1_A0B4_28DB, 0x8EBC_6AF0_9C88_C6E3, 0x5899_65CC_7537_4CC3],
    dtype=np.uint64,
)  # first four xxhash64 prime constants (public), one per row


def _token_u64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit token hashes (blake2b-8)."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in tokens
        ),
        dtype=np.uint64,
        count=len(tokens),
    )


def _cms_partial(counts: Counter, d: int = _CMS_D, w: int = _CMS_W) -> bytes:
    """One block's [d, w] int64 count matrix, serialized. Hashing runs
    once per DISTINCT token (the Counter), not per occurrence."""
    m = np.zeros((d, w), dtype=np.int64)
    if counts:
        toks = list(counts.keys())
        vals = np.fromiter(counts.values(), dtype=np.int64, count=len(toks))
        h = _token_u64(toks)
        for j in range(d):
            idx = (_splitmix64(h ^ _CMS_SEEDS[j]) % np.uint64(w)).astype(np.int64)
            np.add.at(m[j], idx, vals)
    return m.tobytes()


def cms_token_freqs(sf_dir: str, n_probe: int = 20) -> pd.DataFrame:
    """Approximate per-token frequency via a mergeable Count-Min
    sketch: every block emits ONE [d, w] count-matrix blob (64 KiB),
    merged by elementwise SUM in a single tiny groupby — the exchange
    is O(blocks x 64KiB), independent of vocabulary and row count,
    where the exact count would shuffle the whole vocabulary.

    Probe set: the first `n_probe` distinct tokens (sorted) of the
    lowest-doc_id document — deterministic without a corpus pass.
    Guarantee (pinned by pytest): est >= true always; est <= true +
    eps*N with eps = e/w at probability 1-exp(-d) per probe."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    first = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .limit(64)
        .to_pandas()
    )
    first = first.loc[first["doc_id"].idxmin()]
    probes = sorted(set(first["text"].lower().split()))[:n_probe]

    def partials(t: pa.Table) -> pd.DataFrame:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            c.update(txt.lower().split())
        return pd.DataFrame({"part": pd.Series([0], dtype="int64"), "blob": [_cms_partial(c)]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(_CMS_D * _CMS_W, dtype=np.int64)
        for blob in g["blob"]:
            acc += np.frombuffer(blob, dtype=np.int64)
        m = acc.reshape(_CMS_D, _CMS_W)
        h = _token_u64(probes)
        ests = []
        for i in range(len(probes)):
            est = None
            for j in range(_CMS_D):
                # NB: uint64 % python-int silently promotes to float64
                idx = int(_splitmix64(h[i : i + 1] ^ _CMS_SEEDS[j])[0] % np.uint64(_CMS_W))
                v = int(m[j, idx])
                est = v if est is None else min(est, v)
            ests.append(est)
        return pd.DataFrame({"token": probes, "est_count": pd.Series(ests, dtype="int64")})

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    out["est_count"] = out["est_count"].astype("int64")
    return out.sort_values("token").reset_index(drop=True)


def cms_token_freqs_sql(n_probe: int = 20) -> str:
    """Exact twin of the probe counts. Valid as an oracle because the
    fixture vocabulary is far below the sketch width (w=2048, ~40
    distinct tokens), so no probe collides and every CMS estimate
    equals the true count — verified by the bound pytest; a collision
    would surface as a driver hash mismatch."""
    toks = (
        "SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),"
        " w -> w <> '')) AS token FROM documents"
    )
    return f"""
        WITH p AS (
          SELECT DISTINCT unnest(list_filter(
                   string_split_regex(lower(text), '\\s+'), w -> w <> '')) AS token
          FROM documents
          WHERE doc_id = (SELECT MIN(doc_id) FROM documents)
          ORDER BY token LIMIT {n_probe}
        ), toks AS ({toks})
        SELECT p.token, CAST(COUNT(t.token) AS BIGINT) AS est_count
        FROM p LEFT JOIN toks t ON p.token = t.token
        GROUP BY p.token ORDER BY p.token
    """


# --- deterministic mergeable quantile sketch (compactor stack in the
# Munro-Paterson / Manku-Rajagopalan-Lindsay / KLL lineage, with the
# derandomized alternating compaction of Karnin-Lamport-Liberty §6) ---

_QS_K = 256  # per-level capacity; rank error ~ O(log(n/k)/k)


class _QuantileSketch:
    """Compactor stack: level i holds items of weight 2^i; when a level
    exceeds `k` items it is sorted and every other item (alternating
    start parity per compaction — deterministic, no RNG) is promoted to
    level i+1. Fully mergeable: concatenate levels then recompact."""

    def __init__(self, k: int = _QS_K):
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.parity: list[int] = [0]

    def extend(self, values) -> None:
        self.levels[0].extend(float(v) for v in values)
        self._compress()

    def merge(self, other: "_QuantileSketch") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self.parity.append(0)
        for i, lv in enumerate(other.levels):
            self.levels[i].extend(lv)
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = sorted(self.levels[i])
                start = self.parity[i]
                self.parity[i] ^= 1
                promoted = buf[start::2]
                self.levels[i] = []
                if i + 1 == len(self.levels):
                    self.levels.append([])
                    self.parity.append(0)
                self.levels[i + 1].extend(promoted)
            i += 1

    def to_rows(self) -> list[tuple[int, bytes]]:
        return [
            (i, np.asarray(lv, dtype=np.float64).tobytes())
            for i, lv in enumerate(self.levels)
            if lv
        ]

    @classmethod
    def from_rows(cls, rows, k: int = _QS_K) -> "_QuantileSketch":
        s = cls(k)
        for level, blob in rows:
            while len(s.levels) <= level:
                s.levels.append([])
                s.parity.append(0)
            s.levels[level].extend(np.frombuffer(blob, dtype=np.float64).tolist())
        s._compress()
        return s

    def query(self, qs: list[float]) -> list[float]:
        items: list[tuple[float, int]] = []
        for i, lv in enumerate(self.levels):
            w = 1 << i
            items.extend((v, w) for v in lv)
        items.sort()
        total = sum(w for _, w in items)
        out = []
        for q in qs:
            target = q * total
            acc = 0
            val = items[-1][0] if items else float("nan")
            for v, w in items:
                acc += w
                if acc >= target:
                    val = v
                    break
            out.append(val)
        return out


def quantile_sketch(sf_dir: str, qs: tuple = (0.25, 0.5, 0.75, 0.9)) -> pd.DataFrame:
    """Approximate quantiles of events.value via the mergeable compactor
    sketch: each block contributes one serialized sketch (<= k doubles
    per occupied level — kilobytes, independent of block row count);
    a single tiny groupby merges them. Completes the sketch family
    (HLL = distinct, Misra-Gries = heavy hitters, Count-Min =
    frequency, this = quantiles) — the four aggregates whose exact
    forms all force corpus-sized shuffles at 10^12 rows.

    Deterministic (alternating compaction parity, fixed merge order by
    block min event_id) but approximate by construction — no SQL twin;
    pinned by the measured-rank-error-bound and exact-when-small
    pytests. Returns (q, est_value)."""

    def partials(t: pa.Table) -> pd.DataFrame:
        s = _QuantileSketch()
        s.extend(t["value"].to_numpy())
        rows = s.to_rows()
        lo = int(t["event_id"].to_numpy().min()) if t.num_rows else -1
        return pd.DataFrame(
            {
                "part": pd.Series([0] * len(rows), dtype="int64"),
                "lo_eid": pd.Series([lo] * len(rows), dtype="int64"),
                "level": pd.Series([r[0] for r in rows], dtype="int64"),
                "blob": [r[1] for r in rows],
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lo_eid", "level"], kind="mergesort")
        s = _QuantileSketch.from_rows(list(zip(g["level"], g["blob"])))
        est = s.query(list(qs))
        return pd.DataFrame(
            {
                "q": pd.Series(list(qs), dtype="float64"),
                "est_value": pd.Series(est, dtype="float64"),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("q").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bloom filter: mergeable (bitwise-OR) approximate membership. The
# classical prefilter for INCREMENTAL dedup — test a new snapshot's keys
# against a previous snapshot's key set without shuffling either side.
# False positives only (rate (1-e^{-kn/m})^k), never false negatives, so
# a bloom "maybe" prefilter followed by an exact verify of the (small)
# candidate set computes the exact answer while the full old-key set
# never crosses the network.
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 20  # 128 KiB per partial
BLOOM_K = 7


def bloom_partial(keys: np.ndarray, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> bytes:
    """Bloom bitmap for one block of uint64 keys, as an m_bits/8-byte
    blob. Double hashing (Kirsch-Mitzenmatcher 2006): position_i =
    (h1 + i*h2) mod m, with h1/h2 from independent splitmix64 streams —
    asymptotically the same FP rate as k independent hashes."""
    h1 = _splitmix64(np.asarray(keys, dtype=np.uint64))
    h2 = _splitmix64(np.asarray(keys, dtype=np.uint64) ^ np.uint64(0xA5A5A5A5DEADBEEF)) | np.uint64(1)
    bits = np.zeros(m_bits >> 3, dtype=np.uint8)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64), np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return bits.tobytes()


def bloom_merge(blobs) -> np.ndarray:
    """OR-fold partial bitmaps (order-independent, hence mergeable)."""
    acc = None
    for b in blobs:
        arr = np.frombuffer(b, dtype=np.uint8)
        acc = arr.copy() if acc is None else np.bitwise_or(acc, arr, out=acc)
    return acc if acc is not None else np.zeros(BLOOM_M_BITS >> 3, dtype=np.uint8)


def bloom_contains(bits: np.ndarray, keys: np.ndarray, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership probe: True = maybe present, False =
    definitely absent."""
    h1 = _splitmix64(np.asarray(keys, dtype=np.uint64))
    h2 = _splitmix64(np.asarray(keys, dtype=np.uint64) ^ np.uint64(0xA5A5A5A5DEADBEEF)) | np.uint64(1)
    out = np.ones(len(keys), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        got = bits[(pos >> np.uint64(3)).astype(np.int64)] & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        out &= got != 0
    return out


# ---------------------------------------------------------------------------
# KMV / theta sketch: mergeable set-intersection cardinality
# ---------------------------------------------------------------------------

_KMV_K = 1024


def _kmv_partial(user_ids: np.ndarray, k: int = _KMV_K) -> bytes:
    """k smallest distinct splitmix64 hashes of the ids, as raw u64
    bytes — the KMV (k-minimum-values / bottom-k) summary (Bar-Yossef
    et al., "Counting distinct elements in a data stream", RANDOM
    2002; Dasgupta et al., "A framework for estimating frequencies of
    set expressions", the theta-sketch lineage)."""
    h = np.unique(_splitmix64(user_ids.astype(np.uint64)))
    return h[:k].tobytes()


def _kmv_merge(blobs, k: int = _KMV_K) -> np.ndarray:
    vals = np.unique(
        np.concatenate([np.frombuffer(b, dtype=np.uint64) for b in blobs])
        if blobs
        else np.zeros(0, dtype=np.uint64)
    )
    return vals[:k]


def kmv_type_intersections(sf_dir: str, k: int = _KMV_K) -> pd.DataFrame:
    """Audience-overlap estimation: |users(type_a) ∩ users(type_b)|
    for every event-type pair from mergeable KMV sketches — the
    theta-sketch set-operation pattern. Each block contributes one
    <= 8 KiB partial per type; merge is k-smallest-of-union; the
    intersection estimate is the standard theta formula
    |{common < theta}| / theta with theta = min of the two sketches'
    k-th values.

    When a type's distinct count is below k the sketch is the exact
    hash set (theta = 1), so the pair estimate is EXACT and the op is
    SQL-hash-oracled at fixture scale; at 10^12 rows the same code
    degrades gracefully to the ±1/sqrt(k) estimate (saturated path
    covered by a dedicated pytest)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pylist(), "u": t["user_id"].to_numpy()}
        )
        types, blobs = [], []
        for ty, g in df.groupby("event_type", sort=False):
            types.append(ty)
            blobs.append(_kmv_partial(g["u"].to_numpy(), k))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "blob": pa.array(blobs, pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sketches = {
        ty: _kmv_merge(list(g["blob"]), k)
        for ty, g in parts.groupby("event_type", sort=False)
    }
    rows = []
    U64 = float(2**64)
    for a in sorted(sketches):
        for b in sorted(sketches):
            if a >= b:
                continue
            sa, sb = sketches[a], sketches[b]
            sat_a, sat_b = len(sa) >= k, len(sb) >= k
            if not sat_a and not sat_b:
                est = len(np.intersect1d(sa, sb, assume_unique=True))
            else:
                theta = min(
                    (float(sa[-1]) + 1) / U64 if sat_a else 1.0,
                    (float(sb[-1]) + 1) / U64 if sat_b else 1.0,
                )
                lim = np.uint64(min(theta * U64, U64 - 1))
                common = np.intersect1d(sa, sb, assume_unique=True)
                est = int(round((common < lim).sum() / theta))
            rows.append((a, b, int(est)))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_common_users"])
    out["n_common_users"] = out["n_common_users"].astype("int64")
    return out.reset_index(drop=True)


def kmv_type_intersections_sql() -> str:
    return """
        WITH b AS (SELECT DISTINCT event_type, user_id FROM events)
        SELECT a.event_type AS type_a, c.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_common_users
        FROM b a JOIN b c ON a.user_id = c.user_id
                          AND a.event_type < c.event_type
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def hll_distinct_users_sql(p: int = _HLL_P) -> str:
    """EXACT DuckDB twin of hll_distinct_users: splitmix64 recomputed
    via HUGEINT 32-bit-limb wraparound arithmetic (bit-identical to
    the numpy implementation — same technique as
    relational.kmv_joinability_estimate_sql), registers rebuilt with
    idx = h >> (64-p) and rho = 65 - bitlength((h << p) mod 2^64),
    the indicator sum folded as the exact integer S51 and the
    estimator's single float division + linear-counting branch
    mirrored operation-for-operation.  Even the sketch is value-exact
    under the driver's hash gate."""
    m = 1 << p
    P64 = "18446744073709551616::HUGEINT"
    L32 = "4294967296::HUGEINT"

    def mul(z: str, c: int) -> str:
        clo, chi = c % (1 << 32), c >> 32
        return (
            f"((({z}) % {L32}) * {clo}::HUGEINT"
            f" + {L32} * ((({z}) % {L32}) * {chi}::HUGEINT"
            f"           + (({z}) // {L32}) * {clo}::HUGEINT)) % {P64}"
        )

    def xs(z: str, s: int) -> str:
        return (
            f"CAST(xor(CAST({z} AS UBIGINT), CAST({z} AS UBIGINT) >> {s})"
            f" AS HUGEINT)"
        )

    two51 = float(2.0**51)
    return f"""
        WITH du AS (
            SELECT DISTINCT event_type, CAST(user_id AS HUGEINT) AS x
            FROM events
            UNION
            SELECT DISTINCT '__all__' AS event_type,
                   CAST(user_id AS HUGEINT) AS x
            FROM events
        ),
        smx0 AS (SELECT event_type,
                        (x + 11400714819323198485::HUGEINT) % {P64} AS z
                 FROM du),
        smx1 AS (SELECT event_type,
                        {mul(xs('z', 30), 0xBF58476D1CE4E5B9)} AS z
                 FROM smx0),
        smx2 AS (SELECT event_type,
                        {mul(xs('z', 27), 0x94D049BB133111EB)} AS z
                 FROM smx1),
        smx AS (SELECT event_type,
                       CAST(xor(CAST(z AS UBIGINT),
                                CAST(z AS UBIGINT) >> 31) AS UBIGINT) AS h
                FROM smx2),
        rr AS (SELECT event_type,
                      CAST(h >> {64 - p} AS BIGINT) AS idx,
                      CAST((CAST(h AS HUGEINT) * {m}) % {P64} AS UBIGINT)
                          AS rest
               FROM smx),
        regs AS (SELECT event_type, idx,
                        MAX(CASE WHEN rest = 0 THEN {64 - p + 1}
                                 ELSE 65 - length(bin(rest)) END) AS rho
                 FROM rr GROUP BY 1, 2),
        agg AS (SELECT event_type,
                       CAST(COUNT(*) AS BIGINT) AS n_present,
                       SUM(1::BIGINT << (51 - rho)) AS s_present
                FROM regs GROUP BY 1),
        est AS (SELECT event_type,
                       {m} - n_present AS zeros,
                       (0.7213 / (1 + 1.079 / {float(m)}))
                           * {float(m)} * {float(m)} * {two51}
                           / CAST(({m} - n_present) * (1::HUGEINT << 51)
                                  + s_present AS DOUBLE) AS raw
                FROM agg)
        SELECT event_type,
               CAST(CASE WHEN raw <= 2.5 * {float(m)} AND zeros > 0
                         THEN ROUND({float(m)}
                                    * ln({float(m)} / CAST(zeros AS DOUBLE)))
                         ELSE ROUND(raw) END AS BIGINT)
                   AS est_distinct_users
        FROM est ORDER BY event_type
    """


def quantile_sketch_det(
    sf_dir: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.9),
    part_rows: int = 4096,
) -> pd.DataFrame:
    """Deterministically-partitioned sibling of quantile_sketch: rows
    group by pid = event_id // part_rows (ONE corpus-sized exchange of
    (pid, value) pairs — this is the verification sibling, not the
    zero-shuffle production path), each pid builds its compactor
    partial from its COMPLETE value multiset, and the merge cascade
    runs once over the concatenated levels.  Because partial content
    is now a pure function of the data (not of Ray block boundaries),
    the whole compaction schedule is replayable in SQL — the
    recursive-CTE twin (quantile_sketch_det_sql) recomputes every
    sort/halve cascade and the final weighted-rank query bit-for-bit.
    With each sketch object compressing exactly once, every level
    compacts at most once at parity 0, so the schedule is: promote the
    even-index half of the sorted overfull level, drop the rest."""

    def add_pid(t: pa.Table) -> pa.Table:
        pid = t["event_id"].to_numpy() // part_rows
        return pa.table(
            {"pid": pa.array(pid.astype(np.int64), pa.int64()), "value": t["value"]}
        )

    def part_sketch(g: pd.DataFrame) -> pd.DataFrame:
        s = _QuantileSketch()
        s.extend(g["value"].to_numpy())
        rows = s.to_rows()
        return pd.DataFrame(
            {
                "part": pd.Series([0] * len(rows), dtype="int64"),
                "pid": pd.Series([int(g["pid"].iloc[0])] * len(rows), dtype="int64"),
                "level": pd.Series([r[0] for r in rows], dtype="int64"),
                "blob": [r[1] for r in rows],
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pid", "level"], kind="mergesort")
        s = _QuantileSketch.from_rows(list(zip(g["level"], g["blob"])))
        est = s.query(list(qs))
        return pd.DataFrame(
            {
                "q": pd.Series(list(qs), dtype="float64"),
                "est_value": pd.Series(est, dtype="float64"),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    out = (
        ds.map_batches(add_pid, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(part_sketch, batch_format="pandas")
        .groupby("part")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("q").reset_index(drop=True)


def quantile_sketch_det_sql(
    qs: tuple = (0.25, 0.5, 0.75, 0.9),
    part_rows: int = 4096,
    k: int = _QS_K,
    rmax: int = 40,
) -> str:
    """EXACT DuckDB twin of quantile_sketch_det: phase-1 recursion
    replays each pid's compaction cascade (round r compacts level r
    when overfull: sort, promote row_number-odd == 0-indexed-even items
    to level r+1, drop the rest), phase-2 replays the merge cascade
    over the union, and the final query walks the (value, weight)
    order picking the first cumulative weight >= q * total.  A
    convergence error() fires if any level is still overfull at rmax
    (the silent-truncation guard)."""
    qvals = ", ".join(f"({float(q)})" for q in qs)
    return f"""
WITH RECURSIVE base AS (
    SELECT event_id // {part_rows} AS pid, CAST(value AS DOUBLE) AS v
    FROM events
),
p1(r, pid, lvl, v) AS (
    SELECT 0, pid, 0, v FROM base
    UNION ALL
    (
      WITH prev AS (SELECT * FROM p1),
      rr AS (SELECT MAX(r) AS r FROM prev),
      cnt AS (SELECT pid, lvl, COUNT(*) AS n FROM prev GROUP BY 1, 2),
      tagged AS (
          SELECT p.pid, p.lvl, p.v, c.n,
                 row_number() OVER (PARTITION BY p.pid, p.lvl
                                    ORDER BY p.v) AS rn
          FROM prev p JOIN cnt c ON c.pid = p.pid AND c.lvl = p.lvl, rr
          WHERE p.lvl = rr.r
      ),
      nxt AS (
          SELECT pid,
                 CASE WHEN n > {k} THEN lvl + 1 ELSE lvl END AS lvl, v
          FROM tagged WHERE n <= {k} OR rn % 2 = 1
          UNION ALL
          SELECT p.pid, p.lvl, p.v FROM prev p, rr WHERE p.lvl <> rr.r
      ),
      go AS (SELECT EXISTS (SELECT 1 FROM cnt, rr
                            WHERE cnt.n > {k} AND cnt.lvl >= rr.r) AS more)
      SELECT rr.r + 1, nxt.pid, nxt.lvl, nxt.v FROM nxt, rr, go
      WHERE go.more AND rr.r < {rmax}
    )
),
f1 AS (SELECT MAX(r) AS m FROM p1),
chk1 AS (
    SELECT CASE WHEN EXISTS (
        SELECT 1 FROM p1, f1 WHERE p1.r = f1.m
        GROUP BY pid, lvl HAVING COUNT(*) > {k}
    ) THEN error('quantile_sketch_det_sql: phase-1 rmax exhausted')
    ELSE 1 END AS ok
),
seed2 AS (
    SELECT lvl, v FROM p1, f1, chk1 WHERE p1.r = f1.m AND chk1.ok = 1
),
p2(r, lvl, v) AS (
    SELECT 0, lvl, v FROM seed2
    UNION ALL
    (
      WITH prev AS (SELECT * FROM p2),
      rr AS (SELECT MAX(r) AS r FROM prev),
      cnt AS (SELECT lvl, COUNT(*) AS n FROM prev GROUP BY 1),
      tagged AS (
          SELECT p.lvl, p.v, c.n,
                 row_number() OVER (PARTITION BY p.lvl ORDER BY p.v) AS rn
          FROM prev p JOIN cnt c ON c.lvl = p.lvl, rr
          WHERE p.lvl = rr.r
      ),
      nxt AS (
          SELECT CASE WHEN n > {k} THEN lvl + 1 ELSE lvl END AS lvl, v
          FROM tagged WHERE n <= {k} OR rn % 2 = 1
          UNION ALL
          SELECT p.lvl, p.v FROM prev p, rr WHERE p.lvl <> rr.r
      ),
      go AS (SELECT EXISTS (SELECT 1 FROM cnt, rr
                            WHERE cnt.n > {k} AND cnt.lvl >= rr.r) AS more)
      SELECT rr.r + 1, nxt.lvl, nxt.v FROM nxt, rr, go
      WHERE go.more AND rr.r < {rmax}
    )
),
f2 AS (SELECT MAX(r) AS m FROM p2),
chk2 AS (
    SELECT CASE WHEN EXISTS (
        SELECT 1 FROM p2, f2 WHERE p2.r = f2.m
        GROUP BY lvl HAVING COUNT(*) > {k}
    ) THEN error('quantile_sketch_det_sql: phase-2 rmax exhausted')
    ELSE 1 END AS ok
),
items AS (
    SELECT v, CAST(POWER(2, lvl) AS BIGINT) AS w
    FROM p2, f2, chk2 WHERE p2.r = f2.m AND chk2.ok = 1
),
ord AS (
    SELECT v, w,
           SUM(w) OVER (ORDER BY v, w
                        ROWS UNBOUNDED PRECEDING) AS acc
    FROM items
),
tot AS (SELECT SUM(w) AS t FROM items),
qq(q) AS (VALUES {qvals})
SELECT q,
       COALESCE((SELECT MIN(o.v) FROM ord o, tot WHERE o.acc >= q * tot.t),
                (SELECT MAX(v) FROM ord)) AS est_value
FROM qq ORDER BY q
"""
