"""Dataset-construction ops: split, chunk, index, collocations.

The remaining plumbing a training-data / retrieval pipeline needs
around the cleaning + dedup + packing families:

  - dataset_split: deterministic train/val/test assignment via an
    md5 hash bucket — pure streaming filter-map, zero shuffle, and the
    assignment is stable across runs/cluster sizes (the property that
    matters: re-running the split after adding data never moves an old
    doc between splits).
  - doc_chunks: fixed-size token windows with overlap — the RAG /
    context-window chunker. Embarrassingly parallel fan-out (one doc ->
    several chunk rows inside map_batches); no shuffle.
  - inverted_index_topk: token -> postings-list build, the search-index
    construction op. The exchange carries (token, doc_id) pairs — that
    IS the index (inherent output size, not overhead); per-batch
    distinct collapses within-doc repeats before the shuffle. At 100 TB
    the groupby(token) output would be written as partitioned parquet
    posting lists; here the query surfaces the top-df slice with an
    md5 of each postings list so the oracle check covers the full list
    content without hauling megabyte rows through the compare.
  - pmi_collocations: pointwise mutual information over adjacent word
    pairs (collocation mining / phrase detection à la word2phrase).
    Distributed unigram + bigram counting with per-batch Counter
    combiners (vocabulary-sized exchanges); the PMI finalize runs over
    the bounded count tables with the single float op quantized to
    micro-nats, floor(x*1e6+0.5), so the SQL twin is bit-identical
    (libm ln == DuckDB ln — same precedent as bigram_lm_scores).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _docs(sf_dir: str, columns=("doc_id", "text")) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------


def dataset_split(
    sf_dir: str, train_pct: int = 80, val_pct: int = 10
) -> pd.DataFrame:
    """Assign every document to train/val/test by md5(doc_id) % 100
    (train < train_pct <= val < train_pct+val_pct <= test). Stateless,
    shuffle-free, and stable under corpus growth."""
    def assign(t: pa.Table) -> pa.Table:
        from pdfrust_ray.functions.md5vec import md5_prefix_u32

        keys = [str(k).encode() for k in t["doc_id"].to_pylist()]
        b = md5_prefix_u32(keys) % 100
        split = np.where(
            b < train_pct, "train", np.where(b < train_pct + val_pct, "val", "test")
        )
        return pa.table(
            {"doc_id": t["doc_id"], "split": pa.array(split.tolist(), pa.string())}
        )

    out = (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(assign, batch_format="pyarrow")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def dataset_split_sql(train_pct: int = 80, val_pct: int = 10) -> str:
    return f"""
        SELECT doc_id,
               CASE WHEN b < {train_pct} THEN 'train'
                    WHEN b < {train_pct + val_pct} THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                     % 100 AS b
              FROM documents)
        ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# fixed-size token chunking with overlap
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64
CHUNK_STRIDE = 48  # overlap = CHUNK_SIZE - CHUNK_STRIDE = 16 tokens


def doc_chunks(
    sf_dir: str, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> pd.DataFrame:
    """Sliding-window chunker: chunk i covers tokens
    [i*stride, i*stride+size) for every i*stride < n_tokens (a doc with
    zero tokens yields no chunks; a final short window is emitted even
    when the previous window already covers it — simple, deterministic,
    and matched by the SQL twin). Each chunk row carries the md5 of its
    reassembled text so the oracle compare pins full chunk content."""
    def chunk(t: pa.Table) -> pa.Table:
        ids, idxs, ns, hashes = [], [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = txt.split()
            for ci, s in enumerate(range(0, len(ws), stride)):
                piece = ws[s : s + size]
                ids.append(did)
                idxs.append(ci)
                ns.append(len(piece))
                hashes.append(hashlib.md5(" ".join(piece).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int32()),
                "n_tokens": pa.array(ns, pa.int64()),
                "chunk_md5": pa.array(hashes, pa.string()),
            }
        )

    out = _docs(sf_dir).map_batches(chunk, batch_format="pyarrow").to_pandas()
    out["chunk_idx"] = out["chunk_idx"].astype("int32")
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def doc_chunks_sql(size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> str:
    return rf"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
          FROM documents
        ), starts AS (
          SELECT doc_id, ws, unnest(range(0, len(ws), {stride})) AS s FROM toks
        )
        SELECT doc_id,
               CAST(s // {stride} AS INTEGER) AS chunk_idx,
               CAST(least(len(ws) - s, {size}) AS BIGINT) AS n_tokens,
               md5(array_to_string(ws[s + 1 : s + {size}], ' ')) AS chunk_md5
        FROM starts
        ORDER BY doc_id, chunk_idx
    """


# ---------------------------------------------------------------------------
# inverted index build
# ---------------------------------------------------------------------------


def inverted_index_topk(sf_dir: str, k: int = 40) -> pd.DataFrame:
    """Token -> (document frequency, md5 of the sorted postings list)
    for the top-k tokens by (df DESC, token ASC).

    Shape: per batch, DISTINCT (token, doc_id) pairs (within-doc
    repeats collapse before the exchange) -> groupby(token).map_groups
    computes df and hashes the ','-joined numerically-sorted doc_id
    list -> vocabulary-sized sort + limit. At production scale the
    map_groups output is the index shard you'd write, one parquet
    partition per token range."""
    def pairs(t: pa.Table) -> pa.Table:
        toks, dids = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w in set(txt.split()):
                toks.append(w)
                dids.append(did)
        return pa.table(
            {"token": pa.array(toks, pa.string()), "doc_id": pa.array(dids, pa.int64())}
        )

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].astype(int)))
        joined = ",".join(str(i) for i in ids)
        return pd.DataFrame(
            {
                "token": [g["token"].iloc[0]],
                "df": pd.Series([len(ids)], dtype="int64"),
                "postings_md5": [hashlib.md5(joined.encode()).hexdigest()],
            }
        )

    agg = (
        _docs(sf_dir)
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("token")
        .map_groups(postings, batch_format="pandas")
        .to_pandas()
    )
    out = agg.sort_values(["df", "token"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def inverted_index_topk_sql(k: int = 40) -> str:
    return rf"""
        WITH tok AS (
          SELECT DISTINCT doc_id,
                 unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS token
          FROM documents
        )
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS df,
               md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS postings_md5
        FROM tok
        GROUP BY token
        ORDER BY df DESC, token
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def pmi_collocations(sf_dir: str, min_count: int = 5, k: int = 50) -> pd.DataFrame:
    """Top-k adjacent-word collocations by quantized PMI
    ln((c_xy*N*N) / ((B*c_x)*c_y)) with c_xy >= min_count.

    Both count passes are per-batch Counter combiners followed by a
    vocabulary-sized groupby Sum; the min_count filter applies on the
    distributed aggregate BEFORE collection, so the driver sees only
    surviving bigrams plus the (language-bounded) unigram table. The
    one float expression is evaluated in the SQL twin's exact
    association order and quantized immediately."""
    def uni_counts(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        total = 0
        for txt in t["text"].to_pylist():
            ws = txt.lower().split()
            c.update(ws)
            total += len(ws)
        w = sorted(c)
        tbl = pa.table(
            {
                "w": pa.array(w, pa.string()),
                "c": pa.array([c[x] for x in w], pa.int64()),
            }
        )
        return tbl

    def bi_counts(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            ws = txt.lower().split()
            c.update(map(" ".join, zip(ws, ws[1:])))
        bg = sorted(c)
        return pa.table(
            {
                "bg": pa.array(bg, pa.string()),
                "cxy": pa.array([c[x] for x in bg], pa.int64()),
            }
        )

    docs = _docs(sf_dir, columns=("text",))
    uni = (
        docs.map_batches(uni_counts, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    bi_ds = (
        docs.map_batches(bi_counts, batch_format="pyarrow")
        .groupby("bg")
        .aggregate(Sum("cxy", alias_name="cxy"))
    )

    def keep_min(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["cxy"], min_count))

    bi = bi_ds.map_batches(keep_min, batch_format="pyarrow").to_pandas()

    n = float(uni["c"].sum())
    b_total = float(_bigram_total(sf_dir))
    cmap = dict(zip(uni["w"], uni["c"].astype(int)))
    rows = []
    for bg, cxy in zip(bi["bg"], bi["cxy"].astype(int)):
        x, y = bg.split(" ", 1)
        # association order pinned to the SQL twin:
        # (cxy*n*n) / ((b*c_x)*c_y)
        val = (float(cxy) * n * n) / ((b_total * cmap[x]) * cmap[y])
        rows.append((bg, cxy, int(math.floor(math.log(val) * 1e6 + 0.5))))
    out = pd.DataFrame(rows, columns=["bg", "cxy", "pmi_micro"])
    out["cxy"] = out["cxy"].astype("int64")
    out["pmi_micro"] = out["pmi_micro"].astype("int64")
    out = out.sort_values(
        ["pmi_micro", "bg"], ascending=[False, True], kind="mergesort"
    )
    return out.head(k).reset_index(drop=True)


def _bigram_total(sf_dir: str) -> int:
    """Total adjacent-pair count: one tiny aggregate pass (sum of
    len(ws)-1 over docs with >= 2 tokens)."""
    def counts(t: pa.Table) -> pa.Table:
        tot = 0
        for txt in t["text"].to_pylist():
            nw = len(txt.split())
            if nw > 1:
                tot += nw - 1
        return pa.table({"n": pa.array([tot], pa.int64())})

    df = (
        _docs(sf_dir, columns=("text",))
        .map_batches(counts, batch_format="pyarrow")
        .to_pandas()
    )
    return int(df["n"].sum())


def pmi_collocations_sql(min_count: int = 5, k: int = 50) -> str:
    return rf"""
        WITH toks AS (
          SELECT list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ws
          FROM documents
        ),
        uni AS (SELECT unnest(ws) AS w FROM toks),
        ucnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w),
        tots AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM uni) AS n,
                        (SELECT CAST(SUM(len(ws) - 1) AS DOUBLE) FROM toks WHERE len(ws) > 1) AS b),
        big AS (SELECT unnest([ws[x] || ' ' || ws[x + 1] FOR x IN range(1, len(ws))]) AS bg FROM toks),
        bcnt AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cxy FROM big GROUP BY bg)
        SELECT bg, cxy,
               CAST(floor(ln((CAST(cxy AS DOUBLE) * n * n) / ((b * x.c) * y.c)) * 1e6 + 0.5) AS BIGINT)
                 AS pmi_micro
        FROM bcnt, tots, ucnt x, ucnt y
        WHERE x.w = string_split(bg, ' ')[1]
          AND y.w = string_split(bg, ' ')[2]
          AND cxy >= {min_count}
        ORDER BY pmi_micro DESC, bg
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# snapshot diff (change data capture between two corpus versions)
# ---------------------------------------------------------------------------


def snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """CDC-style diff of two corpus snapshots: which docs were added,
    removed, or changed between yesterday's crawl and today's. The
    snapshots are derived deterministically from the documents table
    (old = doc_id % 10 != 9, new = doc_id % 10 != 0, and docs with
    doc_id % 10 == 5 are re-crawled with edited text in the new
    snapshot), but the ENGINE treats them as two independent corpora:
    each side is scanned separately, reduced per row to
    (doc_id, side, text_md5) — text never crosses the exchange — and a
    doc_id-keyed groupby classifies each key from its (<= 2) indicator
    rows. That union + indicator-groupby shape is the FULL OUTER JOIN
    without a join operator, the same trick as heavy_user_full_outer.
    Unchanged docs (the overwhelming majority at crawl scale) are
    dropped inside the groupby, so the output is diff-sized."""

    def side_rows(side: int, edit: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            mod = ids % 10
            keep = mod != (9 if side == 0 else 0)
            texts = t["text"].to_pylist()
            out_id, out_md5 = [], []
            for i in np.nonzero(keep)[0]:
                txt = texts[i]
                if edit and mod[i] == 5:
                    txt = txt.upper()  # the re-crawl edit
                out_id.append(int(ids[i]))
                out_md5.append(hashlib.md5(txt.encode()).hexdigest())
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "side": pa.array([side] * len(out_id), pa.int32()),
                    "text_md5": pa.array(out_md5, pa.string()),
                }
            )

        return f

    old = _docs(sf_dir).map_batches(side_rows(0, False), batch_format="pyarrow")
    new = _docs(sf_dir).map_batches(side_rows(1, True), batch_format="pyarrow")

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        sides = set(g["side"])
        if sides == {0}:
            status = "removed"
        elif sides == {1}:
            status = "added"
        else:
            a = g.loc[g["side"] == 0, "text_md5"].iloc[0]
            b = g.loc[g["side"] == 1, "text_md5"].iloc[0]
            if a == b:
                # typed empty frame: a bare {} literal would make
                # float64 doc_id/status blocks that clash with the
                # int64/string blocks of other groups (the ray 2.49
                # schemaless-empty hazard documented elsewhere)
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "status": pd.Series([], dtype="object"),
                    }
                )
            status = "changed"
        return pd.DataFrame(
            {"doc_id": [int(g["doc_id"].iloc[0])], "status": [status]}
        )

    out = (
        old.union(new)
        .groupby("doc_id")
        .map_groups(classify, batch_format="pandas")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def snapshot_diff_sql() -> str:
    return """
        WITH old AS (SELECT doc_id, md5(text) AS h FROM documents
                     WHERE doc_id % 10 != 9),
        new AS (SELECT doc_id,
                       md5(CASE WHEN doc_id % 10 = 5 THEN upper(text)
                                ELSE text END) AS h
                FROM documents WHERE doc_id % 10 != 0)
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h != n.h
        ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Z-order (Morton) data layout + zone-map pruning
# ---------------------------------------------------------------------------

_Z_EPOCH = np.datetime64("2024-01-01", "m")


def _spread16(x: np.ndarray) -> np.ndarray:
    """Interleave-spread the low 16 bits of x to the even bit positions
    of a 32-bit lane (the standard Morton magic-mask ladder)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def _zkeys(t: pa.Table, bucket_shift: int) -> tuple[np.ndarray, ...]:
    u = t["user_id"].to_numpy().astype(np.int64)
    minute = (
        (t["ts"].to_numpy().astype("datetime64[m]") - _Z_EPOCH).astype(np.int64)
    )
    # 16-bit tiles: clustering masks, not correctness assumptions — ids
    # past 65535 wrap into the tile, which only softens locality
    z = ((_spread16(u) << np.uint64(1)) | _spread16(minute)).astype(np.int64)
    return u, minute, z, z >> bucket_shift


def zorder_layout(sf_dir: str, bucket_shift: int = 26) -> pd.DataFrame:
    """Z-order (Morton) layout zone maps over events: interleave the low
    16 bits of user_id with the minute-of-epoch into a 32-bit Morton
    key; a bucket is the key's top (32 - bucket_shift) bits. The output
    is the per-bucket zone map (row count, min/max of BOTH dimensions)
    — the metadata a lakehouse layout keeps so point/range queries on
    EITHER column prune at the file level (one clustered layout serves
    two predicates, where a plain sort serves one).

    Distributed shape: the Morton key is a per-batch vectorized bit
    ladder (zero shuffle); the zone-map groupby exchanges O(buckets)
    counter rows. Integer-exact SQL twin (bit-arithmetic interleave)."""
    from ray.data.aggregate import Count, Max, Min

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        u, minute, _z, zb = _zkeys(t, bucket_shift)
        return pa.table(
            {
                "zbucket": pa.array(zb, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "minute": pa.array(minute, pa.int64()),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("zbucket")
        .aggregate(
            Count(alias_name="n_rows"),
            Min("user_id", alias_name="min_user"),
            Max("user_id", alias_name="max_user"),
            Min("minute", alias_name="min_minute"),
            Max("minute", alias_name="max_minute"),
        )
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("zbucket").reset_index(drop=True)


def _zorder_sql_expr() -> str:
    """Bit-interleave of (user_id, minute) columns as SQL integer
    arithmetic — user bits at odd Morton positions, minute bits even."""
    terms = [f"(((user_id & 65535) >> {i}) & 1) * {1 << (2 * i + 1)}" for i in range(16)]
    terms += [f"(((minute & 65535) >> {i}) & 1) * {1 << (2 * i)}" for i in range(16)]
    return " + ".join(terms)


_MINUTE_SQL = "epoch_us(ts - TIMESTAMP '2024-01-01') // 60000000"


def zorder_layout_sql(bucket_shift: int = 26) -> str:
    return f"""
        WITH m AS (
            SELECT user_id, {_MINUTE_SQL} AS minute FROM events
        ), z AS (
            SELECT user_id, minute, {_zorder_sql_expr()} AS zkey FROM m
        )
        SELECT zkey // {1 << bucket_shift} AS zbucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(user_id) AS BIGINT) AS min_user,
               CAST(MAX(user_id) AS BIGINT) AS max_user,
               CAST(MIN(minute) AS BIGINT) AS min_minute,
               CAST(MAX(minute) AS BIGINT) AS max_minute
        FROM z
        GROUP BY 1 ORDER BY 1
    """


def zorder_pruned_count(
    sf_dir: str,
    user_lo: int = 2,
    user_hi: int = 120,
    minute_lo: int = 10_000,
    minute_hi: int = 20_000,
    bucket_shift: int = 26,
) -> pd.DataFrame:
    """Read-side payoff of the Z-order layout: count events in a
    (user range) x (time range) box by (1) WRITING the corpus as
    parquet partitioned by zbucket (the layout step — partitioned,
    resumable output), (2) selecting candidate buckets from the zone
    maps, and (3) reading back ONLY those partitions with the exact
    predicate applied. The result equals a plain WHERE count (the SQL
    twin proves pruning loses nothing); the pytest asserts the
    candidate set is a strict subset of the buckets (pruning is real).
    """
    import os

    from pyarrow import dataset as pads

    zm = zorder_layout(sf_dir, bucket_shift=bucket_shift)
    cand = zm[
        (zm["max_user"] >= user_lo)
        & (zm["min_user"] <= user_hi)
        & (zm["max_minute"] >= minute_lo)
        & (zm["min_minute"] <= minute_hi)
    ]["zbucket"].tolist()

    scale = os.path.basename(os.path.normpath(sf_dir))
    layout_dir = f"/tmp/pdfrust_ray_zorder_{scale}_{bucket_shift}"
    marker = os.path.join(layout_dir, "_DONE")
    if not os.path.exists(marker):
        ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

        def prep(t: pa.Table) -> pa.Table:
            u, minute, _z, zb = _zkeys(t, bucket_shift)
            return pa.table(
                {
                    "event_id": t["event_id"],
                    "user_id": pa.array(u, pa.int64()),
                    "minute": pa.array(minute, pa.int64()),
                    "zbucket": pa.array(zb, pa.int64()),
                }
            )

        ds.map_batches(prep, batch_format="pyarrow").write_parquet(
            layout_dir, partition_cols=["zbucket"]
        )
        open(marker, "w").close()

    if not cand:
        return pd.DataFrame(
            {
                "n_rows": pd.Series([0], dtype="int64"),
                "n_buckets_scanned": pd.Series([0], dtype="int64"),
                "n_buckets_total": pd.Series([len(zm)], dtype="int64"),
            }
        )
    import glob

    files = [
        f
        for b in sorted(cand)
        for f in sorted(glob.glob(f"{layout_dir}/zbucket={b}/*.parquet"))
    ]
    pruned = rd.read_parquet(files, columns=["user_id", "minute"])

    def box_count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["user_id"], pa.scalar(user_lo)),
                pc.less_equal(t["user_id"], pa.scalar(user_hi)),
            ),
            pc.and_(
                pc.greater_equal(t["minute"], pa.scalar(minute_lo)),
                pc.less_equal(t["minute"], pa.scalar(minute_hi)),
            ),
        )
        return pa.table({"n": pa.array([int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0)], pa.int64())})

    parts = pruned.map_batches(box_count, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "n_rows": pd.Series([int(parts["n"].sum())], dtype="int64"),
            "n_buckets_scanned": pd.Series([len(cand)], dtype="int64"),
            "n_buckets_total": pd.Series([len(zm)], dtype="int64"),
        }
    )


def zorder_pruned_count_sql(
    user_lo: int = 2,
    user_hi: int = 120,
    minute_lo: int = 10_000,
    minute_hi: int = 20_000,
    bucket_shift: int = 26,
) -> str:
    return f"""
        WITH m AS (
            SELECT user_id, {_MINUTE_SQL} AS minute FROM events
        ), z AS (
            SELECT user_id, minute, {_zorder_sql_expr()} AS zkey FROM m
        ), zm AS (
            SELECT zkey // {1 << bucket_shift} AS zbucket,
                   MIN(user_id) AS min_user, MAX(user_id) AS max_user,
                   MIN(minute) AS min_minute, MAX(minute) AS max_minute
            FROM z GROUP BY 1
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM z
                WHERE user_id BETWEEN {user_lo} AND {user_hi}
                  AND minute BETWEEN {minute_lo} AND {minute_hi}) AS n_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM zm
                WHERE max_user >= {user_lo} AND min_user <= {user_hi}
                  AND max_minute >= {minute_lo} AND min_minute <= {minute_hi})
                 AS n_buckets_scanned,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM zm) AS n_buckets_total
    """


# ---------------------------------------------------------------------------
# SCD type-2 history construction from two snapshots
# ---------------------------------------------------------------------------

_SCD_D0 = "2024-01-01"
_SCD_D1 = "2024-01-02"
_SCD_OPEN = "2200-01-01"  # open-ended sentinel within datetime64[ns] range


def scd2_history(sf_dir: str) -> pd.DataFrame:
    """Slowly-changing-dimension type-2 build from the same two derived
    snapshots as snapshot_diff (old crawl at D0, new crawl at D1):
    every doc_id's version history as (text_md5, valid_from, valid_to,
    is_current) rows — unchanged docs carry one open row from D0,
    changed docs close the old version at D1 and open the new one,
    removed docs close at D1 with nothing open, added docs open at D1.
    valid_to uses a far-future sentinel (2200-01-01) instead of NULL so
    the value-hash compare is total and stays in datetime64[ns] range.

    Same exchange as snapshot_diff: per-side md5 reduction (text never
    shuffles), one doc_id-keyed groupby emitting 1-2 history rows per
    key."""
    from pdfrust_ray.pipelines.datasetops import snapshot_diff  # noqa: F401  (shape twin)

    def side_rows(side: int, edit: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            mod = ids % 10
            keep = mod != (9 if side == 0 else 0)
            texts = t["text"].to_pylist()
            out_id, out_md5 = [], []
            for i in np.nonzero(keep)[0]:
                txt = texts[i]
                if edit and mod[i] == 5:
                    txt = txt.upper()
                out_id.append(int(ids[i]))
                out_md5.append(hashlib.md5(txt.encode()).hexdigest())
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "side": pa.array([side] * len(out_id), pa.int32()),
                    "text_md5": pa.array(out_md5, pa.string()),
                }
            )

        return f

    old = _docs(sf_dir).map_batches(side_rows(0, False), batch_format="pyarrow")
    new = _docs(sf_dir).map_batches(side_rows(1, True), batch_format="pyarrow")

    def history(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, grp in g.groupby("doc_id", sort=False):
            s = dict(zip(grp["side"], grp["text_md5"]))
            if 0 in s and 1 in s:
                if s[0] == s[1]:  # unchanged: one open row since D0
                    rows.append((did, s[0], _SCD_D0, _SCD_OPEN, True))
                else:  # changed: close old at D1, open new
                    rows.append((did, s[0], _SCD_D0, _SCD_D1, False))
                    rows.append((did, s[1], _SCD_D1, _SCD_OPEN, True))
            elif 0 in s:  # removed: closed, nothing current
                rows.append((did, s[0], _SCD_D0, _SCD_D1, False))
            else:  # added: open since D1
                rows.append((did, s[1], _SCD_D1, _SCD_OPEN, True))
        return pd.DataFrame(
            rows, columns=["doc_id", "text_md5", "valid_from", "valid_to", "is_current"]
        )

    out = (
        old.union(new)
        .groupby("doc_id")
        .map_groups(history, batch_format="pandas")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["is_current"] = out["is_current"].astype(bool)
    out["valid_from"] = pd.to_datetime(out["valid_from"])
    out["valid_to"] = pd.to_datetime(out["valid_to"])
    return out.sort_values(["doc_id", "valid_from"]).reset_index(drop=True)


def scd2_history_sql() -> str:
    return f"""
        WITH old AS (
            SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 != 9
        ), new AS (
            SELECT doc_id,
                   md5(CASE WHEN doc_id % 10 = 5 THEN upper(text) ELSE text END) AS h
            FROM documents WHERE doc_id % 10 != 0
        ), j AS (
            SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, o.h AS oh, n.h AS nh
            FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        )
        SELECT doc_id, text_md5, valid_from, valid_to, is_current FROM (
            SELECT doc_id, oh AS text_md5,
                   TIMESTAMP '{_SCD_D0}' AS valid_from,
                   CASE WHEN nh IS NOT NULL AND oh = nh
                        THEN TIMESTAMP '{_SCD_OPEN}'
                        ELSE TIMESTAMP '{_SCD_D1}' END AS valid_to,
                   (nh IS NOT NULL AND oh = nh) AS is_current
            FROM j WHERE oh IS NOT NULL
            UNION ALL
            SELECT doc_id, nh,
                   TIMESTAMP '{_SCD_D1}', TIMESTAMP '{_SCD_OPEN}', TRUE
            FROM j WHERE nh IS NOT NULL AND (oh IS NULL OR oh != nh)
        )
        ORDER BY doc_id, valid_from
    """


def documents_checksum_orc(sf_dir: str) -> pd.DataFrame:
    """Ingest-format parity gate: read the documents table through the
    ORC path (sources/tabular.read_documents_orc) and compute the same
    order-independent row checksum the parquet path would produce —
    the swap-validation a format migration runs before flipping a
    table pointer. Row hash covers doc_id, n_chars and md5(text);
    the checksum is a commutative int64 sum of per-row md5-prefix-u32,
    so per-batch partials fold with zero shuffle."""
    import hashlib as _h

    import numpy as np

    from pdfrust_ray.sources.tabular import read_documents_orc

    ds = read_documents_orc(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        s = 0
        for did, nch, txt in zip(
            t["doc_id"].to_pylist(), t["n_chars"].to_pylist(), t["text"].to_pylist()
        ):
            key = f"{did}|{nch}|{_h.md5(txt.encode()).hexdigest()}".encode()
            s += int.from_bytes(_h.md5(key).digest()[:4], "big")
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([s], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "n_rows": pd.Series([int(parts["n"].sum())], dtype="int64"),
            "checksum": pd.Series([int(parts["s"].sum())], dtype="int64"),
        }
    )


def documents_checksum_orc_sql() -> str:
    return """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(
                        CAST(doc_id AS VARCHAR) || '|' ||
                        CAST(n_chars AS VARCHAR) || '|' || md5(text)), 1, 8))
                    AS UBIGINT)) AS BIGINT) AS checksum
        FROM documents
    """


# ---------------------------------------------------------------------------
# Storage-bucketed co-partitioned join (zero-global-shuffle join)
# ---------------------------------------------------------------------------

_N_JOIN_BUCKETS = 16


def ensure_bucketed_layout(sf_dir: str, n_buckets: int = _N_JOIN_BUCKETS) -> str:
    """Write lineitem and orders bucketed by orderkey % n_buckets (one
    parquet file per bucket per table, Hive-style bucket= dirs) — the
    co-partitioned table layout Hive/Iceberg/Delta bucketing produces.
    Idempotent per scale dir. The layout pass is itself distributed:
    each table streams through one bucket-keyed groupby whose groups
    write their own file and return a manifest row."""
    import os

    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_bucketed_{scale}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir

    def write_table(name: str, key: str, columns: list[str]):
        ds = rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)

        def add_bucket(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy()
            return t.append_column(
                "_bucket", pa.array((k % n_buckets).astype(np.int32), pa.int32())
            )

        def write_group(g: pd.DataFrame) -> pd.DataFrame:
            b = int(g["_bucket"].iloc[0])
            d = os.path.join(out_dir, name, f"bucket={b}")
            os.makedirs(d, exist_ok=True)
            t = pa.Table.from_pandas(g.drop(columns=["_bucket"]), preserve_index=False)
            import pyarrow.parquet as _pq

            _pq.write_table(t, os.path.join(d, "part-0.parquet"))
            return pd.DataFrame({"bucket": [b], "n_rows": [len(g)]})

        return (
            ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(write_group, batch_format="pandas")
            .to_pandas()
        )

    write_table("lineitem", "l_orderkey", ["l_orderkey", "l_extendedprice"])
    write_table("orders", "o_orderkey", ["o_orderkey", "o_orderstatus"])
    open(marker, "w").close()
    return out_dir


def bucketed_join_revenue(sf_dir: str, n_buckets: int = _N_JOIN_BUCKETS) -> pd.DataFrame:
    """Zero-global-shuffle join via storage co-partitioning: both
    tables are pre-bucketed on the join key (ensure_bucketed_layout),
    so the join runs as n_buckets INDEPENDENT local Arrow hash joins —
    one task per bucket pair, no exchange at query time. This is the
    bucketed-table join every warehouse uses to amortize its biggest
    shuffle across all downstream joins; contrast with tpch_q3 /
    fulfillment_latency, which pay the hash-partitioned exchange per
    query. Revenue is per-row-quantized cents (SQL twin float-op
    order)."""
    base = ensure_bucketed_layout(sf_dir, n_buckets)
    buckets = rd.from_items([{"bucket": b} for b in range(n_buckets)])

    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq

        outs = []
        for b in t["bucket"].to_pylist():
            li = _pq.read_table(f"{base}/lineitem/bucket={b}/part-0.parquet")
            od = _pq.read_table(f"{base}/orders/bucket={b}/part-0.parquet")
            cents = pc.cast(
                pc.round(
                    pc.multiply(li["l_extendedprice"], pa.scalar(100.0)),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            li = pa.table({"l_orderkey": li["l_orderkey"], "cents": cents})
            j = li.join(od, keys="l_orderkey", right_keys="o_orderkey", join_type="inner")
            g = pa.TableGroupBy(j, "o_orderstatus").aggregate(
                [("cents", "count"), ("cents", "sum")]
            )
            outs.append(g)
        return pa.concat_tables(outs)

    parts = buckets.map_batches(join_bucket, batch_format="pyarrow", batch_size=1).to_pandas()
    out = (
        parts.groupby("o_orderstatus", as_index=False)
        .agg(n_items=("cents_count", "sum"), revenue_cents=("cents_sum", "sum"))
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    for c in ("n_items", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out


def bucketed_join_revenue_sql() -> str:
    return """
        SELECT o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# Small-file compaction (lakehouse maintenance)
# ---------------------------------------------------------------------------


def ensure_fragmented_events(sf_dir: str, n_files: int = 64) -> str:
    """A deliberately fragmented copy of events (64 tiny parquet
    files) — the small-file problem every streaming ingest creates.
    Idempotent per scale dir."""
    import os

    import pyarrow.parquet as _pq

    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_frag_{scale}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = _pq.read_table(f"{sf_dir}/events.parquet")
    n = t.num_rows
    step = max(1, (n + n_files - 1) // n_files)
    for i, off in enumerate(range(0, n, step)):
        _pq.write_table(t.slice(off, step), os.path.join(out_dir, f"part-{i:05d}.parquet"))
    open(marker, "w").close()
    return out_dir


def compact_events_checksum(sf_dir: str, target_files: int = 4) -> pd.DataFrame:
    """Small-file compaction with an integrity gate: stream the
    fragmented layout through a repartition into ~target_files larger
    files, then verify the compacted copy carries exactly the original
    rows via the order-independent md5-u32 row checksum (the same
    invariant a real compaction job checks before swapping the table
    pointer). Both the rewrite and the verification read are
    distributed; the checksum folds from per-batch partials."""
    import hashlib as _h
    import os

    frag = ensure_fragmented_events(sf_dir)
    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_compact_{scale}"
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        rd.read_parquet(frag).repartition(target_files).write_parquet(out_dir)
        open(marker, "w").close()

    ds = rd.read_parquet(out_dir, columns=["event_id", "user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        s = 0
        for e, u, ty in zip(
            t["event_id"].to_pylist(),
            t["user_id"].to_pylist(),
            t["event_type"].to_pylist(),
        ):
            s += int.from_bytes(_h.md5(f"{e}|{u}|{ty}".encode()).digest()[:4], "big")
        return pa.table(
            {"n": pa.array([t.num_rows], pa.int64()), "s": pa.array([s], pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "n_rows": pd.Series([int(parts["n"].sum())], dtype="int64"),
            "checksum": pd.Series([int(parts["s"].sum())], dtype="int64"),
        }
    )


def compact_events_checksum_sql() -> str:
    return """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(
                        CAST(event_id AS VARCHAR) || '|' ||
                        CAST(user_id AS VARCHAR) || '|' || event_type), 1, 8))
                    AS UBIGINT)) AS BIGINT) AS checksum
        FROM events
    """


# ---------------------------------------------------------------------------
# Schema-evolution read (mixed-version shards, explicit normalize stage)
# ---------------------------------------------------------------------------


def ensure_mixed_schema_shards(sf_dir: str) -> str:
    """Two generations of the events table on disk: v1 shards written
    before the `props` column existed (event_id % 3 == 0, column
    dropped), v2 shards with the full schema. Idempotent per scale."""
    import os

    import pyarrow.parquet as _pq

    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_mixed_{scale}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = _pq.read_table(f"{sf_dir}/events.parquet")
    eid = t["event_id"].to_numpy()
    v1 = t.filter(pa.array(eid % 3 == 0)).drop_columns(["props"])
    v2 = t.filter(pa.array(eid % 3 != 0))
    _pq.write_table(v1, os.path.join(out_dir, "v1-0000.parquet"))
    _pq.write_table(v2, os.path.join(out_dir, "v2-0000.parquet"))
    open(marker, "w").close()
    return out_dir


def schema_migration_counts(sf_dir: str) -> pd.DataFrame:
    """Schema-evolution ingest: shards written under two schema
    versions (v1 lacks `props`) are read through an explicit per-shard
    normalize stage — each task loads its file, adds any missing
    column as typed nulls, and reorders to the target schema — the
    backfill pattern a lakehouse "add column" migration needs when
    old files are never rewritten. Output: per schema version the row
    count and null-props count, proving nulls appear exactly where v1
    shards were."""
    import os

    import pyarrow.parquet as _pq

    shard_dir = ensure_mixed_schema_shards(sf_dir)
    paths = sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(".parquet")
    )
    target = pa.schema(
        [
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("props", pa.string()),
            ("schema_version", pa.string()),
        ]
    )

    files = rd.from_items([{"path": p} for p in paths])

    def normalize(t: pa.Table) -> pa.Table:
        outs = []
        for p in t["path"].to_pylist():
            raw = _pq.read_table(p)
            ver = os.path.basename(p).split("-")[0]
            cols = {}
            for f in target:
                if f.name == "schema_version":
                    cols[f.name] = pa.array([ver] * raw.num_rows, pa.string())
                elif f.name in raw.column_names:
                    cols[f.name] = raw[f.name].cast(f.type)
                else:
                    cols[f.name] = pa.nulls(raw.num_rows, f.type)
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    ds = files.map_batches(normalize, batch_format="pyarrow", batch_size=1)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "schema_version": t["schema_version"].to_pylist(),
                "null_props": pa.compute.is_null(t["props"]).to_pandas().astype("int64"),
            }
        )
        agg = df.groupby("schema_version")["null_props"].agg(["size", "sum"]).reset_index()
        return pa.table(
            {
                "schema_version": pa.array(agg["schema_version"], pa.string()),
                "n": pa.array(agg["size"].astype("int64"), pa.int64()),
                "nulls": pa.array(agg["sum"].astype("int64"), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("schema_version", as_index=False)
        .agg(n_rows=("n", "sum"), n_null_props=("nulls", "sum"))
        .sort_values("schema_version")
        .reset_index(drop=True)
    )
    for c in ("n_rows", "n_null_props"):
        out[c] = out[c].astype("int64")
    return out


def schema_migration_counts_sql() -> str:
    return """
        SELECT CASE WHEN event_id % 3 = 0 THEN 'v1' ELSE 'v2' END
                   AS schema_version,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_props
        FROM events GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# Manifest-based snapshot isolation (time travel)
# ---------------------------------------------------------------------------


def ensure_versioned_table(sf_dir: str) -> str:
    """Two table snapshots of events under manifest control, the
    Iceberg/Delta mechanism reduced to its core: data files are
    immutable; each version is a manifest listing its files. v1 =
    events with event_id % 5 != 4 (two files); v2 = v1 minus the file
    whose rows have event_id % 5 == 0, plus an appended file holding
    the % 5 == 4 rows — i.e. one delete + one append, with the
    surviving file SHARED between versions (no rewrite)."""
    import json
    import os

    import pyarrow.parquet as _pq

    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_versions_{scale}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = _pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    eid = t["event_id"].to_numpy()
    f_a = "data-a.parquet"  # % 5 in {1,2,3} — shared by both versions
    f_b = "data-b.parquet"  # % 5 == 0 — deleted in v2
    f_c = "data-c.parquet"  # % 5 == 4 — appended in v2
    _pq.write_table(t.filter(pa.array((eid % 5 != 4) & (eid % 5 != 0))), f"{out_dir}/{f_a}")
    _pq.write_table(t.filter(pa.array(eid % 5 == 0)), f"{out_dir}/{f_b}")
    _pq.write_table(t.filter(pa.array(eid % 5 == 4)), f"{out_dir}/{f_c}")
    json.dump({"files": [f_a, f_b]}, open(f"{out_dir}/manifest-v1.json", "w"))
    json.dump({"files": [f_a, f_c]}, open(f"{out_dir}/manifest-v2.json", "w"))
    open(marker, "w").close()
    return out_dir


def time_travel_read(sf_dir: str) -> pd.DataFrame:
    """Snapshot-isolated reads: resolve each version's manifest to its
    file list, read ONLY those files, and report per version the row
    count and order-independent checksum — proving v1 remains exactly
    readable after v2's delete+append (time travel) and that the two
    versions share the untouched file. The read fans out per file;
    checksums fold from per-batch partials."""
    import hashlib as _h
    import json
    import os

    base = ensure_versioned_table(sf_dir)
    rows = []
    for ver in ("v1", "v2"):
        files = json.load(open(f"{base}/manifest-{ver}.json"))["files"]
        ds = rd.read_parquet([os.path.join(base, f) for f in files])

        def partial(t: pa.Table) -> pa.Table:
            s = 0
            for e, u, ty in zip(
                t["event_id"].to_pylist(),
                t["user_id"].to_pylist(),
                t["event_type"].to_pylist(),
            ):
                s += int.from_bytes(_h.md5(f"{e}|{u}|{ty}".encode()).digest()[:4], "big")
            return pa.table(
                {"n": pa.array([t.num_rows], pa.int64()), "s": pa.array([s], pa.int64())}
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        rows.append((ver, int(parts["n"].sum()), int(parts["s"].sum())))
    out = pd.DataFrame(rows, columns=["version", "n_rows", "checksum"])
    for c in ("n_rows", "checksum"):
        out[c] = out[c].astype("int64")
    return out


def time_travel_read_sql() -> str:
    chk = (
        "CAST(SUM(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '|' || "
        "CAST(user_id AS VARCHAR) || '|' || event_type), 1, 8)) AS UBIGINT)) AS BIGINT)"
    )
    return f"""
        SELECT 'v1' AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
               {chk} AS checksum
        FROM events WHERE event_id % 5 != 4
        UNION ALL
        SELECT 'v2', CAST(COUNT(*) AS BIGINT), {chk}
        FROM events WHERE event_id % 5 IN (1, 2, 3, 4)
        ORDER BY version
    """


# ---------------------------------------------------------------------------
# distributed MERGE INTO (upsert + delete apply)
# ---------------------------------------------------------------------------


def merge_upsert(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """MERGE INTO semantics — apply a CDC batch of inserts, updates and
    deletes to a base snapshot — as the canonical distributed merge:
    co-partition base and CDC rows on a hash of the merge key, then
    apply the merge group-locally (WHEN MATCHED AND op='U' THEN UPDATE,
    WHEN MATCHED AND op='D' THEN DELETE, WHEN NOT MATCHED THEN INSERT).
    Both sides are derived deterministically from the events fixture:
    base = event_id % 4 != 3; inserts = the % 4 == 3 rows; updates
    double `value` for base rows with event_id % 10 == 0; deletes
    target base rows with event_id % 10 == 5. The merged table never
    materializes — each bucket reduces to per-event_type partials
    (count + exact cents sum) and only those fold on the driver. At
    100 TB the same bucket grouping writes the merged files directly
    (one bucket = one output partition), so the single exchange is the
    co-partitioning shuffle that any MERGE needs."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def tag(t: pa.Table) -> pd.DataFrame:
        eid = t["event_id"].to_numpy().astype(np.int64)
        ety = np.asarray(t["event_type"].to_pylist(), dtype=object)
        val = t["value"].to_numpy().astype(np.float64)
        is_base = eid % 4 != 3
        parts = [
            pd.DataFrame(
                {"event_id": eid[is_base], "event_type": ety[is_base],
                 "value": val[is_base], "op": "B"}
            ),
            pd.DataFrame(
                {"event_id": eid[~is_base], "event_type": ety[~is_base],
                 "value": val[~is_base], "op": "I"}
            ),
        ]
        upd = is_base & (eid % 10 == 0)
        parts.append(
            pd.DataFrame(
                {"event_id": eid[upd], "event_type": ety[upd],
                 "value": val[upd] * 2.0, "op": "U"}
            )
        )
        dele = is_base & (eid % 10 == 5)
        parts.append(
            pd.DataFrame(
                {"event_id": eid[dele], "event_type": ety[dele],
                 "value": val[dele], "op": "D"}
            )
        )
        out = pd.concat(parts, ignore_index=True)
        out["_b"] = (out["event_id"] % n_buckets).astype("int32")
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["op"] == "B"].set_index("event_id")
        upd = g[g["op"] == "U"].set_index("event_id")
        base.loc[upd.index, "value"] = upd["value"]
        base = base.drop(index=g.loc[g["op"] == "D", "event_id"], errors="ignore")
        ins = g[g["op"] == "I"]
        merged = pd.concat([base.reset_index(), ins], ignore_index=True)
        cents = np.round(merged["value"].to_numpy() * 100.0).astype(np.int64)
        agg = (
            pd.DataFrame({"event_type": merged["event_type"], "cents": cents})
            .groupby("event_type", as_index=False)
            .agg(n_rows=("cents", "size"), sum_value_cents=("cents", "sum"))
        )
        return agg

    parts = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("event_type", as_index=False)[["n_rows", "sum_value_cents"]]
        .sum()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("n_rows", "sum_value_cents"):
        out[c] = out[c].astype("int64")
    return out


def merge_upsert_sql() -> str:
    return """
        WITH base AS (
            SELECT event_id, event_type, value FROM events WHERE event_id % 4 != 3
        ), cdc_u AS (
            SELECT event_id, value * 2 AS value FROM events
            WHERE event_id % 4 != 3 AND event_id % 10 = 0
        ), merged AS (
            SELECT b.event_type, COALESCE(u.value, b.value) AS value
            FROM base b LEFT JOIN cdc_u u USING (event_id)
            WHERE b.event_id % 10 != 5
            UNION ALL
            SELECT event_type, value FROM events WHERE event_id % 4 = 3
        )
        SELECT event_type, COUNT(*) AS n_rows,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM merged GROUP BY event_type ORDER BY event_type
    """


# ---------------------------------------------------------------------------
# point-in-time join against the SCD2 dimension
# ---------------------------------------------------------------------------


def scd2_pit_join(sf_dir: str) -> pd.DataFrame:
    """Point-in-time (temporal) join: attach to every fact the SCD2
    dimension version that was valid AT the fact's timestamp
    (valid_from <= ts < valid_to) — how a feature pipeline joins facts
    to a versioned dimension without leakage. The dimension is the
    scd2_history build; facts derive deterministically from events
    (doc_id = event_id % 500; the timestamp lands before D0, between
    D0 and D1, or after D1 by event_id % 3, so every version class is
    exercised and pre-D0 facts match nothing). The dimension is tiny
    relative to the fact stream — the canonical broadcast-PIT plan:
    history is ray.put once, every fact batch interval-matches against
    it vectorized (merge on key + range filter), and per-version match
    counts fold. Were the dimension itself huge, the same per-key
    interval match would run inside a doc_id co-partitioned
    groupby(map_groups) instead."""
    import ray

    hist = scd2_history(sf_dir)[["doc_id", "valid_from", "valid_to"]].copy()
    hist["vf_us"] = hist["valid_from"].astype("int64") // 1000
    hist["vt_us"] = hist["valid_to"].astype("int64") // 1000
    hist_ref = ray.put(hist[["doc_id", "vf_us", "vt_us"]])

    stamps = np.array(
        [
            np.datetime64("2023-12-15T00:00:00", "us"),
            np.datetime64("2024-01-01T12:00:00", "us"),
            np.datetime64("2024-02-01T00:00:00", "us"),
        ]
    ).astype(np.int64)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def match(t: pa.Table, *, hist_ref) -> pd.DataFrame:
        h = ray.get(hist_ref)
        eid = t["event_id"].to_numpy().astype(np.int64)
        facts = pd.DataFrame(
            {"doc_id": eid % 500, "fts_us": stamps[eid % 3]}
        )
        j = facts.merge(h, on="doc_id", how="inner")
        j = j[(j["fts_us"] >= j["vf_us"]) & (j["fts_us"] < j["vt_us"])]
        out = (
            j.groupby(["doc_id", "vf_us"], as_index=False)
            .size()
            .rename(columns={"size": "n_facts"})
        )
        return out

    parts = ds.map_batches(
        match, batch_format="pyarrow", fn_kwargs={"hist_ref": hist_ref}
    ).to_pandas()
    out = (
        parts.groupby(["doc_id", "vf_us"], as_index=False)["n_facts"]
        .sum()
        .sort_values(["doc_id", "vf_us"])
        .reset_index(drop=True)
    )
    out["valid_from"] = pd.to_datetime(out.pop("vf_us"), unit="us")
    out = out[["doc_id", "valid_from", "n_facts"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_facts"] = out["n_facts"].astype("int64")
    return out


def scd2_pit_join_sql() -> str:
    return f"""
        WITH hist AS ({scd2_history_sql()}),
        facts AS (
            SELECT event_id % 500 AS doc_id,
                   CASE event_id % 3
                        WHEN 0 THEN TIMESTAMP '2023-12-15 00:00:00'
                        WHEN 1 THEN TIMESTAMP '2024-01-01 12:00:00'
                        ELSE TIMESTAMP '2024-02-01 00:00:00' END AS fts
            FROM events
        )
        SELECT h.doc_id, h.valid_from, COUNT(*) AS n_facts
        FROM facts f
        JOIN hist h ON f.doc_id = h.doc_id
             AND f.fts >= h.valid_from AND f.fts < h.valid_to
        GROUP BY 1, 2 ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# merge-on-read deletion vectors
# ---------------------------------------------------------------------------


def ensure_dv_table(sf_dir: str) -> str:
    """Events split into two immutable sorted data files (event_id % 2)
    plus a POSITIONAL deletion-vector sidecar: (file, row position)
    rows marking event_id % 7 == 3 as deleted — the Iceberg v2 /
    Delta deletion-vector mechanism: deletes never rewrite data files,
    readers apply the position mask at scan time (merge-on-read)."""
    import os

    import pyarrow.parquet as _pq

    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_dv_{scale}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = _pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    t = t.sort_by("event_id")
    eid = t["event_id"].to_numpy()
    dv_files, dv_pos = [], []
    for side in (0, 1):
        part = t.filter(pa.array(eid % 2 == side))
        fname = f"data-{side}.parquet"
        _pq.write_table(part, f"{out_dir}/{fname}")
        pos = np.nonzero(part["event_id"].to_numpy() % 7 == 3)[0]
        dv_files.extend([fname] * len(pos))
        dv_pos.extend(pos.tolist())
    _pq.write_table(
        pa.table(
            {"file": pa.array(dv_files, pa.string()),
             "pos": pa.array(dv_pos, pa.int64())}
        ),
        f"{out_dir}/deletes.parquet",
    )
    open(marker, "w").close()
    return out_dir


def deletion_vector_read(sf_dir: str) -> pd.DataFrame:
    """Merge-on-read scan with deletion vectors applied: one task per
    data file (the granularity at which positions are meaningful)
    streams its file row-group by row-group, tracks the running row
    offset, masks out the positions its deletion vector names, and
    reduces the survivors to (n_live, checksum) partials — the same
    order-independent checksum as time_travel_read, so the oracle
    proves the masked scan returns exactly the undeleted rows. The DV
    sidecar is ray.put once (it is delete-sized, not table-sized)."""
    import hashlib as _h
    import os

    import pyarrow.parquet as _pq

    import ray

    base = ensure_dv_table(sf_dir)
    dv = _pq.read_table(f"{base}/deletes.parquet")
    dv_map = {
        f: np.array(g["pos"], dtype=np.int64)
        for f, g in pd.DataFrame(
            {"file": dv["file"].to_pylist(), "pos": dv["pos"].to_pylist()}
        ).groupby("file")
    }
    dv_ref = ray.put(dv_map)

    files = rd.from_items(
        [{"file": f} for f in sorted(os.listdir(base)) if f.startswith("data-")]
    )

    def scan_file(t: pa.Table, *, dv_ref, base) -> pa.Table:
        dv_map = ray.get(dv_ref)
        out_files, out_n, out_s = [], [], []
        for fname in t["file"].to_pylist():
            dead = dv_map.get(fname, np.zeros(0, dtype=np.int64))
            pf = _pq.ParquetFile(os.path.join(base, fname))
            offset, n_live, s = 0, 0, 0
            for rg in range(pf.num_row_groups):
                tbl = pf.read_row_group(rg)
                n = tbl.num_rows
                local = dead[(dead >= offset) & (dead < offset + n)] - offset
                mask = np.ones(n, dtype=bool)
                mask[local] = False
                live = tbl.filter(pa.array(mask))
                offset += n
                n_live += live.num_rows
                for e, u, ty in zip(
                    live["event_id"].to_pylist(),
                    live["user_id"].to_pylist(),
                    live["event_type"].to_pylist(),
                ):
                    s += int.from_bytes(
                        _h.md5(f"{e}|{u}|{ty}".encode()).digest()[:4], "big"
                    )
            out_files.append(fname)
            out_n.append(n_live)
            out_s.append(s)
        return pa.table(
            {
                "file": pa.array(out_files, pa.string()),
                "n_live": pa.array(out_n, pa.int64()),
                "checksum": pa.array(out_s, pa.int64()),
            }
        )

    out = (
        files.map_batches(
            scan_file, batch_format="pyarrow", batch_size=1,
            fn_kwargs={"dv_ref": dv_ref, "base": base},
        )
        .to_pandas()
        .sort_values("file")
        .reset_index(drop=True)
    )
    for c in ("n_live", "checksum"):
        out[c] = out[c].astype("int64")
    return out


def deletion_vector_read_sql() -> str:
    chk = (
        "CAST(SUM(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '|' || "
        "CAST(user_id AS VARCHAR) || '|' || event_type), 1, 8)) AS UBIGINT)) AS BIGINT)"
    )
    return f"""
        SELECT 'data-' || CAST(event_id % 2 AS VARCHAR) || '.parquet' AS file,
               CAST(COUNT(*) AS BIGINT) AS n_live,
               {chk} AS checksum
        FROM events WHERE event_id % 7 != 3
        GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# JSONL sink round-trip
# ---------------------------------------------------------------------------


def documents_jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Sink-fidelity proof for the JSONL writer: documents stream out
    through Dataset.write_json (partitioned, one file per block — the
    resumable layout), stream back in through the JSON reader, and
    reduce to a per-lang order-independent checksum over (doc_id,
    md5(text), lang). The oracle computes the same checksum from the
    parquet originals, so any escaping / unicode / ordering damage in
    the write-read cycle breaks the hash. Text bytes never reach the
    driver."""
    import hashlib as _h
    import os
    import shutil

    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_jsonl_{scale}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    _docs(sf_dir, columns=("doc_id", "text", "lang")).write_json(out_dir)

    back = rd.read_json(out_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        rows = {}
        for d, txt, lg in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist(), t["lang"].to_pylist()
        ):
            m = _h.md5(f"{d}|{_h.md5(txt.encode()).hexdigest()}|{lg}".encode())
            agg = rows.setdefault(lg, [0, 0])
            agg[0] += 1
            agg[1] += int.from_bytes(m.digest()[:4], "big")
        return pd.DataFrame(
            {
                "lang": list(rows),
                "n_docs": pd.Series([v[0] for v in rows.values()], dtype="int64"),
                "checksum": pd.Series([v[1] for v in rows.values()], dtype="int64"),
            }
        )

    out = (
        back.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("lang", as_index=False)[["n_docs", "checksum"]]
        .sum()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "checksum"):
        out[c] = out[c].astype("int64")
    return out


def documents_jsonl_roundtrip_sql() -> str:
    return """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
                    md5(text) || '|' || lang), 1, 8)) AS UBIGINT)) AS BIGINT)
                   AS checksum
        FROM documents GROUP BY lang ORDER BY lang
    """


# ---------------------------------------------------------------------------
# orphan-file audit (lakehouse maintenance)
# ---------------------------------------------------------------------------


def orphan_files_audit(sf_dir: str) -> pd.DataFrame:
    """Maintenance sweep over the versioned table: classify every data
    file as live (referenced by some version manifest) or orphan
    (present on storage but unreachable — the residue of failed writes
    that remove_orphan_files garbage-collects). A deterministic orphan
    is planted once beside the ensure_versioned_table layout; the audit
    lists storage, broadcasts the union of manifest references, and
    classifies per file with a row count per file — fan-out stat work
    with zero data movement beyond file metadata. Rows-only contract
    (filesystem state has no SQL surface); the exact classification is
    pinned by pytest."""
    import json
    import os

    import pyarrow.parquet as _pq

    import ray

    base = ensure_versioned_table(sf_dir)
    orphan = os.path.join(base, "data-orphan.parquet")
    if not os.path.exists(orphan):
        _pq.write_table(
            pa.table({"event_id": pa.array([0], pa.int64()),
                      "user_id": pa.array([0], pa.int64()),
                      "event_type": pa.array(["stray"], pa.string())}),
            orphan,
        )
    referenced: set[str] = set()
    for ver in ("v1", "v2"):
        referenced.update(json.load(open(f"{base}/manifest-{ver}.json"))["files"])
    ref_ref = ray.put(referenced)

    files = rd.from_items(
        [
            {"file": f}
            for f in sorted(os.listdir(base))
            if f.startswith("data-") and f.endswith(".parquet")
        ]
    )

    def classify(t: pa.Table, *, ref_ref, base) -> pa.Table:
        referenced = ray.get(ref_ref)
        names = t["file"].to_pylist()
        return pa.table(
            {
                "file": pa.array(names, pa.string()),
                "status": pa.array(
                    ["live" if f in referenced else "orphan" for f in names],
                    pa.string(),
                ),
                "n_rows": pa.array(
                    [_pq.read_metadata(os.path.join(base, f)).num_rows for f in names],
                    pa.int64(),
                ),
            }
        )

    out = (
        files.map_batches(
            classify, batch_format="pyarrow", fn_kwargs={"ref_ref": ref_ref, "base": base}
        )
        .to_pandas()
        .sort_values("file")
        .reset_index(drop=True)
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# catalog-wide integrity report
# ---------------------------------------------------------------------------

_CATALOG_PKS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def catalog_integrity_report(sf_dir: str) -> pd.DataFrame:
    """One-shot integrity snapshot of EVERY primary-keyed table in the
    catalog: row count plus an order-independent md5-u32 checksum over
    the key column — the manifest a backup/restore or replication job
    compares across environments. Each table streams through its own
    pruned single-column read; per-batch (n, checksum) partials fold;
    tables run sequentially here but are independent pipelines (a
    driver would launch them concurrently at scale)."""
    import hashlib

    rows = []
    for table, key in sorted(_CATALOG_PKS.items()):
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[key])

        def partial(t: pa.Table, *, key=key) -> pa.Table:
            s = 0
            for v in t[key].to_pylist():
                s += int.from_bytes(hashlib.md5(str(v).encode()).digest()[:4], "big")
            return pa.table(
                {"n": pa.array([t.num_rows], pa.int64()), "s": pa.array([s], pa.int64())}
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        rows.append((table, int(parts["n"].sum()), int(parts["s"].sum())))
    out = pd.DataFrame(rows, columns=["table_name", "n_rows", "key_checksum"])
    for c in ("n_rows", "key_checksum"):
        out[c] = out[c].astype("int64")
    return out


def catalog_integrity_report_sql() -> str:
    selects = []
    for table, key in sorted(_CATALOG_PKS.items()):
        selects.append(
            f"""SELECT '{table}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(SUM(CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))
                              AS UBIGINT)) AS BIGINT) AS key_checksum
                FROM {table}"""
        )
    return " UNION ALL ".join(selects) + " ORDER BY table_name"


# ---------------------------------------------------------------------------
# vocabulary growth + ingest lineage
# ---------------------------------------------------------------------------


def bigram_vocab_growth(sf_dir: str, bucket_docs: int = 100) -> pd.DataFrame:
    """Vocabulary growth curve (Heaps' law over word bigrams): how many
    NEW distinct bigrams each successive block of `bucket_docs`
    documents contributes, plus the running total — the
    diminishing-returns estimate that sizes how much more data a
    tokenizer/vocab needs. Uses the first-touch trick: one
    bigram-keyed exchange computes each bigram's FIRST doc_id (min),
    the bounded bucket histogram and cumulative sum then fold
    driver-side — no resorting of the corpus, no per-checkpoint
    rescans."""
    import numpy as np

    from ray.data.aggregate import Min

    ds = _docs(sf_dir)

    def pairs(t: pa.Table) -> pd.DataFrame:
        out_b, out_d = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            words = [w for w in txt.split(" ") if w != ""]
            bs = {f"{a} {b}" for a, b in zip(words, words[1:])}
            out_b.extend(bs)
            out_d.extend([did] * len(bs))
        return pd.DataFrame({"bigram": out_b, "doc_id": out_d})

    first = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Min("doc_id", alias_name="first_doc"))
        .to_pandas()
    )
    bucket = (first["first_doc"].to_numpy() // bucket_docs).astype(np.int64)
    hist = (
        pd.DataFrame({"bucket": bucket})
        .groupby("bucket", as_index=False)
        .size()
        .rename(columns={"size": "n_new_bigrams"})
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    hist["cum_vocab"] = hist["n_new_bigrams"].cumsum()
    for c in hist.columns:
        hist[c] = hist[c].astype("int64")
    return hist


def bigram_vocab_growth_sql(bucket_docs: int = 100) -> str:
    return f"""
        WITH w AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS ord,
                   unnest(string_split(text, ' ')) AS word
            FROM documents
        ), b AS (
            SELECT a.doc_id, a.word || ' ' || c.word AS bigram
            FROM w a JOIN w c
              ON a.doc_id = c.doc_id AND c.ord = a.ord + 1
            WHERE a.word <> '' AND c.word <> ''
        ), f AS (
            SELECT bigram, MIN(doc_id) AS first_doc FROM b GROUP BY 1
        ), h AS (
            SELECT first_doc // {bucket_docs} AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_new_bigrams
            FROM f GROUP BY 1
        )
        SELECT bucket, n_new_bigrams,
               CAST(SUM(n_new_bigrams) OVER (ORDER BY bucket) AS BIGINT)
                   AS cum_vocab
        FROM h ORDER BY bucket
    """


def csv_shard_lineage(sf_dir: str) -> pd.DataFrame:
    """Record-level ingest lineage: read the CSV shard mirror with
    include_paths=True so every row carries its source file, then roll
    up per shard the row count and an order-independent event_id
    checksum — the provenance table that lets a bad upstream shard be
    traced and replayed. The lineage column is attached at the scan
    (zero-cost — it is the reader's own context), partials fold per
    file."""
    import hashlib
    import os

    import numpy as np

    import ray.data as _rd

    from pdfrust_ray.sources.tabular import ensure_events_csv

    shard_dir = ensure_events_csv(sf_dir)
    shard_files = sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.startswith("events_") and f.endswith(".csv")
    )
    ds = _rd.read_csv(shard_files, include_paths=True)

    def partial(t: pa.Table) -> pd.DataFrame:
        names = [os.path.basename(p) for p in t["path"].to_pylist()]
        chk = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(e).encode()).digest()[:4], "big")
                for e in t["event_id"].to_pylist()
            ),
            dtype=np.int64,
            count=t.num_rows,
        )
        df = pd.DataFrame({"shard": names, "chk": chk})
        return df.groupby("shard", as_index=False).agg(
            n_rows=("chk", "size"), checksum=("chk", "sum")
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("shard", as_index=False)[["n_rows", "checksum"]]
        .sum()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    for c in ("n_rows", "checksum"):
        out[c] = out[c].astype("int64")
    return out


def csv_shard_lineage_sql(sf_dir_placeholder: str = "") -> str:
    # shards are written row-contiguously: shard i holds rows
    # [i*step, (i+1)*step) of the parquet order; event_id is the row
    # index in the fixture, so the shard of a row is derivable
    return """
        WITH n AS (SELECT COUNT(*) AS total FROM events),
        s AS (
            SELECT event_id,
                   event_id // CAST(CEIL(CAST(total AS DOUBLE) / 8) AS BIGINT)
                       AS shard_no
            FROM events, n
        )
        SELECT 'events_' || lpad(CAST(shard_no AS VARCHAR), 4, '0') || '.csv'
                   AS shard,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                             AS UBIGINT)) AS BIGINT) AS checksum
        FROM s GROUP BY 1 ORDER BY 1
    """


# ---------------------------------------------------------------------------
# partitioned parquet sink + partition-pruned read
# ---------------------------------------------------------------------------


def partitioned_write_pruned_read(sf_dir: str) -> pd.DataFrame:
    """Hive-partitioned sink round-trip: events stream out through
    Dataset.write_parquet(partition_cols=['event_type']) — one
    directory per key, the resumable layout the brief mandates — and
    the query then reads ONLY the purchase partition's directory,
    proving the layout prunes at the filesystem level (no row of any
    other type is even opened). Output: per-type checksum of the
    pruned read plus its row count, hash-matched against a plain
    filtered scan."""
    import hashlib
    import os
    import shutil

    import numpy as np

    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_hivepart_{scale}"
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
        ).write_parquet(out_dir, partition_cols=["event_type"])
        open(marker, "w").close()

    part_dir = os.path.join(out_dir, "event_type=purchase")
    ds = rd.read_parquet(part_dir)

    def partial(t: pa.Table) -> pa.Table:
        cents = pa.compute.cast(
            pa.compute.round(pa.compute.multiply(t["value"], 100.0)), pa.int64()
        ).to_numpy()
        s = 0
        for e, c in zip(t["event_id"].to_pylist(), cents.tolist()):
            s += int.from_bytes(hashlib.md5(f"{e}|{c}".encode()).digest()[:4], "big")
        return pa.table(
            {"n": pa.array([t.num_rows], pa.int64()), "s": pa.array([s], pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "event_type": ["purchase"],
            "n_rows": pd.Series([int(parts["n"].sum())], dtype="int64"),
            "checksum": pd.Series([int(parts["s"].sum())], dtype="int64"),
        }
    )


def partitioned_write_pruned_read_sql() -> str:
    return """
        SELECT 'purchase' AS event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '|' ||
                    CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)), 1, 8))
                             AS UBIGINT)) AS BIGINT) AS checksum
        FROM events WHERE event_type = 'purchase'
    """


# ---------------------------------------------------------------------------
# right-to-erasure sweep
# ---------------------------------------------------------------------------


def erasure_sweep(sf_dir: str, min_errors: int = 20) -> pd.DataFrame:
    """GDPR right-to-erasure cascade: derive the subject set (every
    user with at least `min_errors` 'error' events — a deterministic
    stand-in for a deletion-request list; the plain any-error variant
    would delete EVERY fixture user, TESTDATA.md), delete ALL of those
    users' rows from the events stream, and publish the per-type
    post-delete accounting (row count + order-independent md5
    checksum) a compliance audit signs off on.

    Distributed plan: the subject set reduces distributed (filtered
    pruned read -> per-batch partial counts -> single-key groupby ->
    threshold filter) and broadcasts once via ray.put — deletion-request
    lists are small by nature; the sweep is an embarrassingly parallel
    anti-filter with per-batch (type, n, checksum-sum) partials folding
    through a tiny single-key groupby. Nothing rewrites in place — at
    scale the filtered stream writes a new partitioned snapshot and the
    catalog pointer swaps."""
    import numpy as np

    from pdfrust_ray.functions.md5vec import md5_prefix_u32
    from ray.data.aggregate import Sum

    def err_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "error"))
        g = pa.TableGroupBy(t.select(["user_id"]), "user_id").aggregate([([], "count_all")])
        return pa.table(
            {"user_id": g["user_id"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
        .map_batches(err_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n_err"))
        .filter(expr=f"n_err >= {min_errors}")
        .to_pandas()
    )
    subjects = pa.array(sorted(int(u) for u in counts["user_id"]), pa.int64())
    subj_ref = ray.put(subjects)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )

    def partial(t: pa.Table, *, subj_ref) -> pa.Table:
        mask = pc.invert(pc.is_in(t["user_id"], value_set=ray.get(subj_ref)))
        t = t.filter(mask)
        keys = [
            f"{e}|{u}".encode()
            for e, u in zip(t["event_id"].to_pylist(), t["user_id"].to_pylist())
        ]
        h = md5_prefix_u32(keys).astype(np.int64) if keys else np.array([], np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(), "h": h})
        g = df.groupby("event_type", as_index=False).agg(n=("h", "size"), s=("h", "sum"))
        g["n"] = g["n"].astype("int64")
        g["s"] = g["s"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow", fn_kwargs={"subj_ref": subj_ref})
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_rows"), Sum("s", alias_name="checksum"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    out["checksum"] = out["checksum"].astype("int64")
    return out[["event_type", "n_rows", "checksum"]]


def erasure_sweep_sql(min_errors: int = 20) -> str:
    return f"""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(
                        CAST(event_id AS VARCHAR) || '|' ||
                        CAST(user_id AS VARCHAR)), 1, 8))
                    AS UBIGINT)) AS BIGINT) AS checksum
        FROM events
        WHERE user_id NOT IN (SELECT user_id FROM events
                              WHERE event_type = 'error'
                              GROUP BY 1 HAVING COUNT(*) >= {min_errors})
        GROUP BY 1 ORDER BY 1
    """


def hash_partition_skew(sf_dir: str, n_partitions: int = 32) -> pd.DataFrame:
    """Partitioning skew report: row counts per md5-hash partition of
    user_id — the diagnostic run before choosing a shuffle key (a hot
    key shows up as one partition holding a multiple of the mean). The
    md5 bucket matches the engine's own partitioned sinks, so the
    report predicts REAL file sizes.

    Distributed plan: per-batch vectorized md5 (functions/md5vec) +
    bincount partials, folded through an n_partitions-row groupby —
    an embarrassingly parallel profile, no shuffle of data rows."""
    import numpy as np

    from pdfrust_ray.functions.md5vec import md5_prefix_u32

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        keys = [str(u).encode() for u in t["user_id"].to_pylist()]
        p = (md5_prefix_u32(keys).astype(np.int64)) % n_partitions
        counts = np.bincount(p, minlength=n_partitions).astype(np.int64)
        return pa.table(
            {
                "partition": pa.array(np.arange(n_partitions, dtype=np.int64)),
                "n": pa.array(counts, pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("partition")
        .aggregate(Sum("n", alias_name="n_rows"))
        .to_pandas()
        .sort_values("partition")
        .reset_index(drop=True)
    )
    out["partition"] = out["partition"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def hash_partition_skew_sql(n_partitions: int = 32) -> str:
    # empty partitions matter in a skew report: densify on a spine
    return f"""
        WITH h AS (
            SELECT CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                             AS UBIGINT) % {n_partitions} AS BIGINT) AS partition,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM events GROUP BY 1
        )
        SELECT g.p AS partition, COALESCE(h.n_rows, 0) AS n_rows
        FROM (SELECT UNNEST(generate_series(0, {n_partitions - 1})) AS p) g
        LEFT JOIN h ON h.partition = g.p
        ORDER BY g.p
    """


def documents_arrow_ipc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Arrow IPC (Feather v2 stream) as an interchange format: the
    documents table is re-encoded shard-by-shard into Arrow IPC stream
    files under /tmp (one file per block — the zero-copy handoff format
    for non-parquet consumers), read BACK through a binary-file source +
    per-file IPC decode, and checksummed — proving a full custom
    source/sink round trip with no driver materialization of the data.

    Distributed plan: the write is map_batches emitting one (path, rows)
    manifest row per block; the read is rd.read_binary_files over the
    shard directory with the IPC decode running inside the map stage.
    The checksum folds per batch then through a 1-row aggregate."""
    import glob
    import os
    import shutil
    import tempfile

    import numpy as np

    from pdfrust_ray.functions.md5vec import md5_prefix_u32

    out_dir = os.path.join(
        tempfile.gettempdir(), f"pdfrust_ray_ipc_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        # deterministic shard name from content, not task id: resumable
        lo = pc.min(t["doc_id"]).as_py()
        hi = pc.max(t["doc_id"]).as_py()
        path = os.path.join(out_dir, f"docs_{lo:012d}_{hi:012d}.arrows")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            with pa.ipc.new_stream(f, t.schema) as w:
                w.write_table(t)
        os.replace(tmp, path)  # tmp-then-commit, crash-safe
        return pa.table({"path": [path], "rows": [t.num_rows]})

    manifest = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
        .map_batches(write_shard, batch_format="pyarrow", batch_size=128)
        .to_pandas()
    )
    assert manifest["rows"].sum() > 0

    def decode(batch: dict) -> pa.Table:
        tables = []
        for b in batch["bytes"]:
            with pa.ipc.open_stream(pa.BufferReader(b)) as r:
                tables.append(r.read_all())
        return pa.concat_tables(tables)

    def checksum(t: pa.Table) -> pa.Table:
        keys = [
            f"{d}|{l}|{n}".encode()
            for d, l, n in zip(
                t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["n_chars"].to_pylist()
            )
        ]
        h = md5_prefix_u32(keys).astype(np.int64) if keys else np.array([], np.int64)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([int(h.sum())], pa.int64()),
            }
        )

    agg = (
        rd.read_binary_files(out_dir)
        .map_batches(decode, batch_format="numpy")
        .map_batches(checksum, batch_format="pyarrow")
        .aggregate(Sum("n", alias_name="n_docs"), Sum("s", alias_name="checksum"))
    )
    return pd.DataFrame(
        {
            "n_docs": pd.Series([int(agg["n_docs"])], dtype="int64"),
            "checksum": pd.Series([int(agg["checksum"])], dtype="int64"),
        }
    )


def documents_arrow_ipc_roundtrip_sql() -> str:
    return """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(('0x' || substr(md5(
                        CAST(doc_id AS VARCHAR) || '|' || lang || '|' ||
                        CAST(n_chars AS VARCHAR)), 1, 8))
                    AS UBIGINT)) AS BIGINT) AS checksum
        FROM documents
    """


def hot_key_detector(sf_dir: str, rate: int = 10, min_sampled: int = 15) -> pd.DataFrame:
    """Two-pass skew diagnosis: a deterministic 1/rate row sample (md5
    of event_id — reproducible, not random) estimates per-key
    frequencies; keys whose SAMPLED count clears min_sampled are
    flagged hot and get an EXACT count in a second pushed-down pass —
    the cheap prelude that decides whether a join needs salting. Both
    passes are embarrassingly parallel; the exchange carries only
    per-key partial counts, and the exact pass scans with the flagged
    key set broadcast once.

    At 100 TB this is the only affordable way to find the hot keys: the
    sample pass touches 1% of rows and the exact pass only re-counts
    the handful of suspects."""
    import numpy as np

    from pdfrust_ray.functions.md5vec import md5_prefix_u32

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def sample_partial(t: pa.Table) -> pa.Table:
        keys = [str(e).encode() for e in t["event_id"].to_pylist()]
        h = md5_prefix_u32(keys).astype(np.int64)
        u = t["user_id"].to_numpy()[h % rate == 0]
        uu, cc = np.unique(u, return_counts=True)
        return pa.table(
            {"user_id": pa.array(uu, pa.int64()), "n": pa.array(cc, pa.int64())}
        )

    sampled = (
        ds.map_batches(sample_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n_sampled"))
        .filter(expr=f"n_sampled >= {min_sampled}")
        .to_pandas()
    )
    if sampled.empty:  # Ray drops columns on all-empty blocks
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_sampled": pd.Series([], dtype="int64"),
                "est_count": pd.Series([], dtype="int64"),
                "exact_count": pd.Series([], dtype="int64"),
            }
        )
    hot = pa.array(sorted(int(u) for u in sampled["user_id"]), pa.int64())
    hot_ref = ray.put(hot)

    def exact_partial(t: pa.Table, *, hot_ref) -> pa.Table:
        mask = pc.is_in(t["user_id"], value_set=ray.get(hot_ref))
        u = t["user_id"].to_numpy()[mask.to_numpy(zero_copy_only=False)]
        uu, cc = np.unique(u, return_counts=True)
        return pa.table(
            {"user_id": pa.array(uu, pa.int64()), "n": pa.array(cc, pa.int64())}
        )

    exact = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(exact_partial, batch_format="pyarrow", fn_kwargs={"hot_ref": hot_ref})
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="exact_count"))
        .to_pandas()
    )
    out = sampled.merge(exact, on="user_id")
    out["user_id"] = out["user_id"].astype("int64")
    out["n_sampled"] = out["n_sampled"].astype("int64")
    out["est_count"] = (out["n_sampled"] * rate).astype("int64")
    out["exact_count"] = out["exact_count"].astype("int64")
    return (
        out[["user_id", "n_sampled", "est_count", "exact_count"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def hot_key_detector_sql(rate: int = 10, min_sampled: int = 15) -> str:
    return f"""
        WITH s AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sampled
            FROM events
            WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                       AS UBIGINT) % {rate} = 0
            GROUP BY 1 HAVING COUNT(*) >= {min_sampled}
        ),
        x AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
            FROM events WHERE user_id IN (SELECT user_id FROM s) GROUP BY 1
        )
        SELECT s.user_id, s.n_sampled,
               CAST(s.n_sampled * {rate} AS BIGINT) AS est_count, x.exact_count
        FROM s JOIN x USING (user_id) ORDER BY s.user_id
    """


def range_partitioned_write(sf_dir: str, n_parts: int = 8) -> pd.DataFrame:
    """Range-sharded sink: quantile boundaries of the sort key
    (user_id) come from the exact distributed selection, every row
    routes to its range shard, and each shard writes its own parquet
    directory — the layout that keeps a SORTED key range per file so
    downstream merge scans and key-range reads stay sequential (the
    complement of the hash/hive layout in partitioned_write_pruned_read).
    Output: per-shard row count, key min/max, and content checksum,
    re-read FROM THE SINK (round-trip proven, not assumed).

    Distributed plan: boundaries are K-1 exact quantiles (histogram-
    refinement selection, O(B) driver state); routing is a per-batch
    searchsorted; the write streams per shard; the audit re-reads each
    shard directory pruned."""
    import os
    import shutil

    import numpy as np

    from pdfrust_ray.functions.md5vec import md5_prefix_u32
    from pdfrust_ray.pipelines.relational import _exact_quantile_disc

    base = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]).map_batches(
        lambda t: pa.table({"c": pc.cast(t["user_id"], pa.int64())}),
        batch_format="pyarrow",
    )
    bounds = [
        _exact_quantile_disc(base, i / n_parts) for i in range(1, n_parts)
    ]
    b = np.array(bounds, dtype=np.int64)

    scale = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/pdfrust_ray_rangepart_{scale}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def route(t: pa.Table) -> pa.Table:
        u = pc.cast(t["user_id"], pa.int64()).to_numpy()
        part = np.searchsorted(b, u, side="left").astype(np.int64)
        return t.append_column("range_part", pa.array(part, pa.int64()))

    (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
        )
        .map_batches(route, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["range_part"])
    )

    def audit(t: pa.Table) -> pa.Table:
        keys = [
            f"{e}|{u}".encode()
            for e, u in zip(t["event_id"].to_pylist(), t["user_id"].to_pylist())
        ]
        h = md5_prefix_u32(keys).astype(np.int64) if keys else np.array([], np.int64)
        part = pc.cast(t["range_part"], pa.int64()).to_numpy()
        df = pd.DataFrame(
            {"part": part, "u": t["user_id"].to_numpy(), "h": h}
        )
        g = df.groupby("part", as_index=False).agg(
            n=("u", "size"), lo=("u", "min"), hi=("u", "max"), s=("h", "sum")
        )
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    out = (
        rd.read_parquet(out_dir)
        .map_batches(audit, batch_format="pyarrow")
        .groupby("part")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            _Min("lo", alias_name="min_user"),
            _Max("hi", alias_name="max_user"),
            Sum("s", alias_name="checksum"),
        )
        .to_pandas()
        .sort_values("part")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def range_partitioned_write_sql(n_parts: int = 8) -> str:
    qs = ", ".join(f"{i}/{n_parts}.0" for i in range(1, n_parts))
    return f"""
        WITH bounds AS (
            SELECT quantile_disc(user_id, [{qs}]) AS b FROM events
        ),
        routed AS (
            SELECT e.event_id, e.user_id,
                   (SELECT COUNT(*) FROM UNNEST(bounds.b) AS t(x)
                    WHERE t.x < e.user_id) AS part
            FROM events e, bounds
        )
        SELECT CAST(part AS BIGINT) AS part, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(user_id) AS BIGINT) AS min_user,
               CAST(MAX(user_id) AS BIGINT) AS max_user,
               CAST(SUM(CAST(('0x' || substr(md5(
                        CAST(event_id AS VARCHAR) || '|' ||
                        CAST(user_id AS VARCHAR)), 1, 8))
                    AS UBIGINT)) AS BIGINT) AS checksum
        FROM routed GROUP BY 1 ORDER BY 1
    """


def range_merge_join(sf_dir: str, n_parts: int = 8) -> pd.DataFrame:
    """Co-partitioned merge join: events AND customers are both
    range-sharded on the SAME quantile boundaries of the join key
    (user_id == c_custkey), so matching keys land in the same shard by
    construction and the join runs per shard with NO all-to-all — one
    task per partition reads its two shard directories (storage-pruned)
    and joins locally. This is the 'pick ONE partitioning key and reuse
    it across stages' discipline: the boundary list is computed once
    (exact distributed selection) and reused for both sinks and the
    join. Output: revenue by (segment, event_type).

    Distributed plan: two range-partitioned writes (streaming), then a
    Dataset over partition ids fans one co-read+join task per shard;
    the only exchange after the sinks is the tiny result fold."""
    import os
    import shutil

    import numpy as np

    from pdfrust_ray.pipelines.relational import _cents, _exact_quantile_disc

    base = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]).map_batches(
        lambda t: pa.table({"c": pc.cast(t["user_id"], pa.int64())}),
        batch_format="pyarrow",
    )
    bounds = np.array(
        [_exact_quantile_disc(base, i / n_parts) for i in range(1, n_parts)],
        dtype=np.int64,
    )

    scale = os.path.basename(os.path.normpath(sf_dir))
    ev_dir = f"/tmp/pdfrust_ray_cojoin_ev_{scale}"
    cu_dir = f"/tmp/pdfrust_ray_cojoin_cu_{scale}"

    def route(col: str):
        def fn(t: pa.Table) -> pa.Table:
            u = pc.cast(t[col], pa.int64()).to_numpy()
            part = np.searchsorted(bounds, u, side="left").astype(np.int64)
            return t.append_column("range_part", pa.array(part, pa.int64()))

        return fn

    for d in (ev_dir, cu_dir):
        shutil.rmtree(d, ignore_errors=True)
    (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"])
        .map_batches(route("user_id"), batch_format="pyarrow")
        .write_parquet(ev_dir, partition_cols=["range_part"])
    )
    (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
        .map_batches(route("c_custkey"), batch_format="pyarrow")
        .write_parquet(cu_dir, partition_cols=["range_part"])
    )

    import pyarrow.parquet as _pq

    def cojoin(t: pa.Table) -> pa.Table:
        outs = []
        for p in t["id"].to_pylist():
            ep = os.path.join(ev_dir, f"range_part={p}")
            cp = os.path.join(cu_dir, f"range_part={p}")
            if not (os.path.isdir(ep) and os.path.isdir(cp)):
                continue  # an empty shard on either side joins to nothing
            ev = _pq.read_table(ep, columns=["user_id", "event_type", "value"])
            cu = _pq.read_table(cp, columns=["c_custkey", "c_mktsegment"])
            j = ev.join(cu, keys="user_id", right_keys="c_custkey", join_type="inner")
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "c_mktsegment": j["c_mktsegment"],
                        "event_type": j["event_type"],
                        "cents": _cents(j["value"]),
                    }
                ),
                ["c_mktsegment", "event_type"],
            ).aggregate([("cents", "sum"), ("cents", "count")])
            outs.append(
                pa.table(
                    {
                        "c_mktsegment": g["c_mktsegment"],
                        "event_type": g["event_type"],
                        "cents": g["cents_sum"],
                        "n": pc.cast(g["cents_count"], pa.int64()),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "event_type": pa.array([], pa.string()),
                    "cents": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    out = (
        rd.range(n_parts, override_num_blocks=n_parts)
        .map_batches(cojoin, batch_format="pyarrow")
        .to_pandas()
    )
    out = (
        out.groupby(["c_mktsegment", "event_type"], as_index=False)
        .agg(n_events=("n", "sum"), total_cents=("cents", "sum"))
        .sort_values(["c_mktsegment", "event_type"])
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out


def range_merge_join_sql() -> str:
    return """
        SELECT c.c_mktsegment, e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# chunk-level dedup statistics
# ---------------------------------------------------------------------------


def chunk_dedup_stats(
    sf_dir: str, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> pd.DataFrame:
    """Cross-document chunk duplication histogram: chunk every document
    exactly like `doc_chunks`, md5 each chunk's text, and report how
    many distinct chunk hashes occur once, twice, ... — the
    repetition profile a RAG ingest (or a CCNet-style chunk dedup)
    inspects before deciding dedup thresholds.

    Distributed plan: chunking + hashing is embarrassingly parallel
    with a per-batch np.unique combiner, so the exchange carries
    (hash, partial_count) rows; a 64-way coarse shard on the hash
    prefix finishes the per-hash totals VECTORIZED (the hash space is
    corpus-sized — a per-key Ray aggregate would hit the per-group
    dispatch cliff, see part_copurchase_pairs); the finalize is a
    single-key aggregate over <= a few dozen dup-count values."""

    def hash_chunks(t: pa.Table) -> pa.Table:
        hs = []
        for txt in t["text"].to_pylist():
            ws = txt.split()
            for s in range(0, len(ws), stride):
                hs.append(hashlib.md5(" ".join(ws[s : s + size]).encode()).hexdigest())
        u, c = np.unique(np.array(hs, dtype=object), return_counts=True)
        shard = np.array([int(h[:8], 16) & 63 for h in u], dtype=np.int32)
        return pa.table(
            {
                "h": pa.array(u, pa.string()),
                "n": pa.array(c, pa.int64()),
                "_shard": pa.array(shard, pa.int32()),
            }
        )

    def shard_hist(g: pd.DataFrame) -> pd.DataFrame:
        per_hash = g.groupby("h", sort=False)["n"].sum().to_numpy()
        dup, cnt = np.unique(per_hash, return_counts=True)
        return pd.DataFrame(
            {"dup_count": dup.astype("int64"), "partial": cnt.astype("int64")}
        )

    out = (
        _docs(sf_dir, columns=("text",))
        .map_batches(hash_chunks, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_hist, batch_format="pandas")
        .groupby("dup_count")
        .aggregate(Sum("partial", alias_name="n_chunk_hashes"))
        .to_pandas()
        .sort_values("dup_count")
        .reset_index(drop=True)
    )
    for c in ("dup_count", "n_chunk_hashes"):
        out[c] = out[c].astype("int64")
    return out


def chunk_dedup_stats_sql(size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> str:
    return rf"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
          FROM documents
        ), starts AS (
          SELECT doc_id, ws, unnest(range(0, len(ws), {stride})) AS s FROM toks
        ), per_hash AS (
          SELECT md5(array_to_string(ws[s + 1 : s + {size}], ' ')) AS h,
                 COUNT(*) AS dup_count
          FROM starts GROUP BY 1
        )
        SELECT CAST(dup_count AS BIGINT) AS dup_count,
               CAST(COUNT(*) AS BIGINT) AS n_chunk_hashes
        FROM per_hash GROUP BY 1 ORDER BY 1
    """


def consistent_hash_ring(sf_dir: str, n_workers: int = 8, vnodes: int = 64) -> pd.DataFrame:
    """Consistent-hashing ring audit: place `vnodes` md5 virtual nodes
    per worker, route every user to its clockwise successor, then add
    one more worker and measure movement.  The defining guarantee —
    users only ever move TO the new worker — is pinned in pytest, and
    the whole routing is md5-reproducible so the SQL twin (correlated
    successor lookups over the ring CTE) matches exactly.  Output per
    worker: users before, users after, users moved away.

    Distributed plan: the ring (workers x vnodes entries) broadcasts
    once; users stream through a searchsorted routing map_batches; the
    fold is a worker-keyed Count — exchange is worker-sized."""
    import hashlib

    import numpy as np

    def ring(nw: int):
        pos, owner = [], []
        for w in range(nw):
            for v in range(vnodes):
                h = int.from_bytes(
                    hashlib.md5(f"w{w}:{v}".encode()).digest()[:8], "big"
                )
                pos.append(h)
                owner.append(w)
        pos = np.array(pos, dtype=np.uint64)
        order = np.argsort(pos)
        return pos[order], np.array(owner, dtype=np.int64)[order]

    p8, o8 = ring(n_workers)
    p9, o9 = ring(n_workers + 1)
    rref = ray.put((p8, o8, p9, o9))

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def route(t: pa.Table) -> pa.Table:
        import hashlib as hl

        a8, w8, a9, w9 = ray.get(rref)
        users = np.unique(t["user_id"].to_numpy(zero_copy_only=False))
        h = np.array(
            [int.from_bytes(hl.md5(str(u).encode()).digest()[:8], "big") for u in users],
            dtype=np.uint64,
        )
        i8 = np.searchsorted(a8, h, side="left") % len(a8)
        i9 = np.searchsorted(a9, h, side="left") % len(a9)
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "before": pa.array(w8[i8]),
                "after": pa.array(w9[i9]),
            }
        )

    from ray.data.aggregate import Count, Max

    # distinct users via a user-keyed groupby (per-batch unique is the
    # combiner inside route), then fold (before, after) pairs into one
    # packed key — the final exchange is O(workers^2), never user-sized
    pairs = (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("before", alias_name="b"), Max("after", alias_name="a"))
        .map_batches(
            lambda t: pa.table(
                {"k": pc.add(pc.multiply(t["b"], 16), t["a"])}
            ),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    rows = []
    for w in range(n_workers + 1):
        before = after = moved = 0
        for k, n in zip(pairs["k"].astype(int), pairs["n"].astype(int)):
            bw, aw = k // 16, k % 16
            if bw == w:
                before += n
                if aw != w:
                    moved += n
            if aw == w:
                after += n
        rows.append((w, before, after, moved))
    return pd.DataFrame(
        rows, columns=["worker", "n_users_before", "n_users_after", "n_moved_away"]
    ).astype("int64")


def consistent_hash_ring_sql(n_workers: int = 8, vnodes: int = 64) -> str:
    return f"""
        WITH ring8 AS (
            SELECT w, CAST(concat('0x', substr(md5(concat('w', w, ':', v)), 1, 16))
                           AS UBIGINT) AS pos
            FROM (SELECT UNNEST(generate_series(0, {n_workers - 1})) AS w)
            CROSS JOIN (SELECT UNNEST(generate_series(0, {vnodes - 1})) AS v)
        ),
        ring9 AS (
            SELECT w, CAST(concat('0x', substr(md5(concat('w', w, ':', v)), 1, 16))
                           AS UBIGINT) AS pos
            FROM (SELECT UNNEST(generate_series(0, {n_workers})) AS w)
            CROSS JOIN (SELECT UNNEST(generate_series(0, {vnodes - 1})) AS v)
        ),
        users AS (
            SELECT DISTINCT user_id,
                   CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
                        AS UBIGINT) AS h
            FROM events
        ),
        routed AS (
            SELECT user_id,
                   COALESCE(
                       (SELECT arg_min(w, pos) FROM ring8 WHERE pos >= u.h),
                       (SELECT arg_min(w, pos) FROM ring8)) AS before,
                   COALESCE(
                       (SELECT arg_min(w, pos) FROM ring9 WHERE pos >= u.h),
                       (SELECT arg_min(w, pos) FROM ring9)) AS after
            FROM users u
        ),
        workers AS (SELECT UNNEST(generate_series(0, {n_workers})) AS worker)
        SELECT CAST(w.worker AS BIGINT) AS worker,
               CAST(COALESCE(SUM(CASE WHEN r.before = w.worker THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_users_before,
               CAST(COALESCE(SUM(CASE WHEN r.after = w.worker THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_users_after,
               CAST(COALESCE(SUM(CASE WHEN r.before = w.worker AND r.after <> w.worker
                                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_moved_away
        FROM workers w CROSS JOIN routed r
        GROUP BY 1 ORDER BY 1
    """


def late_event_audit(sf_dir: str, lateness_us: int = 3_600_000_000) -> pd.DataFrame:
    """Streaming watermark audit: replay events in arrival order
    (event_id) with watermark = (max event-time seen over STRICTLY
    earlier arrivals) - lateness; an event is late when its own
    event-time falls below the watermark — exactly what a windowed
    streaming job would drop.  Output per event_type: arrivals, late
    count and the worst lateness in microseconds (all BIGINT).

    Distributed plan: a two-pass block-stitched prefix scan — the
    distributed-scan idiom.  Pass 1: bucket arrivals by event_id range
    and reduce each bucket to its max event-time (one tiny groupby).
    Driver: exclusive prefix-max over the O(buckets) spine, broadcast.
    Pass 2: within each bucket the exclusive running max is a shifted
    cummax seeded by the bucket's prefix; late flags aggregate with a
    per-batch combiner.  No global sort materializes; state per bucket
    is O(1)."""
    from ray.data.aggregate import Max

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "ts"])
    n_total = ds.count()
    n_buckets = 64
    # event_ids are dense from 0; bucket by range so arrival order is
    # bucket-major then in-bucket sortable
    width = max(1, (n_total + n_buckets - 1) // n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {
                "bucket": pc.cast(pc.divide(t["event_id"], width), pa.int64()),
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "us": us,
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    bmax = (
        tagged.groupby("bucket")
        .aggregate(Max("us", alias_name="mx"))
        .to_pandas()
        .sort_values("bucket")
    )
    mx = bmax["mx"].to_numpy()
    prefix = np.concatenate(([-(2**62)], np.maximum.accumulate(mx)[:-1]))
    seed = {int(b): int(p) for b, p in zip(bmax["bucket"], prefix)}
    seed_ref = ray.put(seed)

    def judge(g: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(seed_ref)
        g = g.sort_values("event_id", kind="stable")
        us = g["us"].to_numpy()
        run = np.maximum.accumulate(us)
        excl = np.concatenate(([s[int(g["bucket"].iloc[0])]], run[:-1]))
        excl = np.maximum(excl, s[int(g["bucket"].iloc[0])])
        late = us < excl - lateness_us
        lateness = np.where(late, excl - lateness_us - us, 0)
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "one": np.ones(len(g), dtype="int64"),
                "late": late.astype("int64"),
                "lateness": lateness.astype("int64"),
            }
        )

    out = (
        tagged.groupby("bucket")
        .map_groups(judge, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("one", alias_name="n"),
            Sum("late", alias_name="n_late"),
            Max("lateness", alias_name="max_lateness_us"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n": "int64", "n_late": "int64", "max_lateness_us": "int64"}
    )


def late_event_audit_sql(lateness_us: int = 3_600_000_000) -> str:
    return f"""
        WITH scan AS (
            SELECT event_type, epoch_us(ts) AS us,
                   MAX(epoch_us(ts)) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_max
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN prev_max IS NOT NULL
                             AND us < prev_max - {lateness_us}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               CAST(MAX(CASE WHEN prev_max IS NOT NULL
                             AND us < prev_max - {lateness_us}
                             THEN prev_max - {lateness_us} - us
                             ELSE 0 END) AS BIGINT) AS max_lateness_us
        FROM scan
        GROUP BY event_type
        ORDER BY event_type
    """


_POISSON1_CDF = (
    0.3678794411714423,  # P(X<=0)
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,  # P(X<=5); above -> w=6 (capped)
)


def poisson_bootstrap_stats(sf_dir: str, n_reps: int = 32) -> pd.DataFrame:
    """Distributed Poisson bootstrap: every event draws, for each
    replica r, a weight w ~ Poisson(1) — the streaming-friendly
    bootstrap that never needs to know n — derived DETERMINISTICALLY
    from md5(event_id*n_reps + r) (52 bits -> u in [0,1) -> inverse
    CDF, capped at 6).  Per (rep, event_type) the replica's exact
    integer sufficient stats: n_eff = sum w and sum_cents =
    sum w*cents, from which between-replica variance estimates the
    sampling error of per-type revenue — reproducible across runs and
    cluster sizes.

    Distributed plan: weights are computed inside map_batches (pure
    function of the row id — no RNG state, no broadcast), then one
    (rep x type)-sized groupby of per-batch partials."""
    import hashlib

    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"])

    def weights(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        types = t["event_type"].to_pylist()
        out_rep, out_type, out_w, out_wc = [], [], [], []
        for eid, ty, cc in zip(ids, types, cents):
            base = int(eid) * n_reps
            for r in range(n_reps):
                u = int(hashlib.md5(str(base + r).encode()).hexdigest()[:13], 16) / float(2**52)
                w = 0
                while w < 6 and u >= _POISSON1_CDF[w]:
                    w += 1
                if w:
                    out_rep.append(r)
                    out_type.append(ty)
                    out_w.append(w)
                    out_wc.append(w * int(cc))
        return pa.table(
            {
                "rep": pa.array(out_rep, pa.int64()),
                "event_type": pa.array(out_type, pa.string()),
                "w": pa.array(out_w, pa.int64()),
                "wc": pa.array(out_wc, pa.int64()),
            }
        )

    out = (
        ds.map_batches(weights, batch_format="pyarrow")
        .groupby(["rep", "event_type"])
        .aggregate(Sum("w", alias_name="n_eff"), Sum("wc", alias_name="sum_cents"))
        .to_pandas()
        .sort_values(["rep", "event_type"])
        .reset_index(drop=True)
    )
    return out.astype({"rep": "int64", "n_eff": "int64", "sum_cents": "int64"})


def poisson_bootstrap_stats_sql(n_reps: int = 32) -> str:
    ladder = " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(_POISSON1_CDF)
    )
    return f"""
        WITH draws AS (
            SELECT e.event_type, r.r AS rep,
                   CAST(ROUND(e.value * 100) AS BIGINT) AS cents,
                   CAST(CAST(('0x' || substr(md5(CAST(e.event_id * {n_reps} + r.r
                        AS VARCHAR)), 1, 13)) AS UBIGINT) AS DOUBLE)
                       / 4503599627370496.0 AS u
            FROM events e
            CROSS JOIN (SELECT UNNEST(range({n_reps})) AS r) r
        ),
        w AS (
            SELECT rep, event_type, cents,
                   CASE {ladder} ELSE 6 END AS w
            FROM draws
        )
        SELECT rep, event_type,
               CAST(SUM(w) AS BIGINT) AS n_eff,
               CAST(SUM(w * cents) AS BIGINT) AS sum_cents
        FROM w
        WHERE w > 0
        GROUP BY rep, event_type
        ORDER BY rep, event_type
    """


def bitmap_index_audit(sf_dir: str, container_bits: int = 12, array_cap: int = 256) -> pd.DataFrame:
    """Roaring-style bitmap-index planning: per event_type, chop the
    event_id universe into 2^container_bits-wide containers and pick
    the cheaper representation per container (sorted array of
    2-byte offsets when cardinality < array_cap, else a fixed
    2^container_bits-bit bitmap) — the secondary-index sizing audit a
    query planner runs before building type -> row-id indexes.
    Outputs exact integer container counts and total bytes.

    Distributed plan: per-batch (type, container) histogram combine,
    one container-sized groupby, O(containers) driver finalize."""
    import numpy as np

    bitmap_bytes = (1 << container_bits) // 8

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])

    def hist(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "container": pc.cast(
                    pc.shift_right(t["event_id"], container_bits), pa.int64()
                ),
                "one": pa.array(np.ones(len(t), np.int64)),
            }
        )

    cont = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["event_type", "container"])
        .aggregate(Sum("one", alias_name="card"))
        .to_pandas()
    )
    cont["is_array"] = (cont["card"] < array_cap).astype("int64")
    cont["bytes"] = np.where(cont["is_array"] == 1, 8 + 2 * cont["card"], 8 + bitmap_bytes)
    out = (
        cont.groupby("event_type")
        .agg(
            n_containers=("container", "size"),
            n_array=("is_array", "sum"),
            total_bytes=("bytes", "sum"),
            n_rows=("card", "sum"),
        )
        .reset_index()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_containers": "int64", "n_array": "int64", "total_bytes": "int64", "n_rows": "int64"}
    )


def bitmap_index_audit_sql(container_bits: int = 12, array_cap: int = 256) -> str:
    bitmap_bytes = (1 << container_bits) // 8
    return f"""
        WITH cont AS (
            SELECT event_type, event_id // {1 << container_bits} AS container,
                   COUNT(*) AS card
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_containers,
               CAST(SUM(CASE WHEN card < {array_cap} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_array,
               CAST(SUM(CASE WHEN card < {array_cap} THEN 8 + 2 * card
                             ELSE 8 + {bitmap_bytes} END) AS BIGINT) AS total_bytes,
               CAST(SUM(card) AS BIGINT) AS n_rows
        FROM cont
        GROUP BY event_type
        ORDER BY event_type
    """


def rendezvous_hash_audit(sf_dir: str, n_old: int = 8) -> pd.DataFrame:
    """Rendezvous (highest-random-weight) routing audit: assign every
    document to the worker maximizing md5(worker|doc_id), then replay
    the assignment with one extra worker and measure movement.  HRW's
    defining guarantee — scaling out moves keys ONLY onto the new
    worker, ~1/(W+1) of them, with no old-to-old churn — is what the
    audit certifies before a cache/shard tier adopts the scheme (the
    sibling of consistent_hash_ring's vnode-ring view).

    Distributed plan: per-batch vectorized md5 over W+1 worker lanes
    (functions/md5vec), owner = lexicographic argmax of (hash, worker)
    so ties are deterministic; per-old-worker integer partials fold
    through a W-row groupby — no data rows cross the exchange."""
    from ray.data.aggregate import Sum

    from pdfrust_ray.functions.md5vec import md5_prefix_u32

    workers = [f"w{i}" for i in range(n_old + 1)]

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def route(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        if not ids:
            return pa.table(
                {
                    "worker": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "moved": pa.array([], pa.int64()),
                }
            )
        # [N, W+1] hash matrix; owner = argmax of (hash, worker_idx)
        h = np.stack(
            [
                md5_prefix_u32([f"{w}|{d}".encode() for d in ids])
                for w in workers
            ],
            axis=1,
        ).astype(np.uint64)
        key = h * np.uint64(16) + np.arange(len(workers), dtype=np.uint64)
        old = np.argmax(key[:, :n_old], axis=1)
        new = np.argmax(key, axis=1)
        moved = (old != new).astype(np.int64)
        n = np.bincount(old, minlength=n_old).astype(np.int64)
        m = np.bincount(old, weights=moved, minlength=n_old).astype(np.int64)
        return pa.table(
            {
                "worker": pa.array([f"w{i}" for i in range(n_old)], pa.string()),
                "n": pa.array(n, pa.int64()),
                "moved": pa.array(m, pa.int64()),
            }
        )

    out = (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("worker")
        .aggregate(Sum("n", alias_name="n_docs"), Sum("moved", alias_name="n_moved"))
        .to_pandas()
        .sort_values("worker")
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_moved"] = out["n_moved"].astype("int64")
    return out


def rendezvous_hash_audit_sql(n_old: int = 8) -> str:
    return f"""
        WITH lanes AS (
            SELECT d.doc_id, w.i AS wi,
                   CAST(('0x' || substr(md5('w' || w.i || '|' ||
                            CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                       * 16 + w.i AS key
            FROM documents d, generate_series(0, {n_old}) w(i)
        ),
        old_owner AS (
            SELECT doc_id, arg_max(wi, key) AS wo
            FROM lanes WHERE wi < {n_old} GROUP BY doc_id
        ),
        new_owner AS (
            SELECT doc_id, arg_max(wi, key) AS wn FROM lanes GROUP BY doc_id
        )
        SELECT 'w' || o.wo AS worker,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE n.wn <> o.wo) AS BIGINT) AS n_moved
        FROM old_owner o JOIN new_owner n USING (doc_id)
        GROUP BY o.wo ORDER BY worker
    """


def part_trigram_selectivity(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Trigram-index planning over part names: document frequency of
    every character 3-gram (each part counted once per trigram) and
    the top-k least selective trigrams — the statistic a LIKE-pattern
    index planner needs, since a '%foo%' scan is only cheap when foo's
    trigrams are rare.  Ties break on the trigram string so the top-k
    cut is deterministic.

    Distributed plan: per-batch per-name trigram SETS collapse into
    Counter partials (vocabulary-sized: <= alphabet³ rows cross the
    exchange, never one row per occurrence), one groupby(trigram) Sum,
    then a distributed sort + limit over the bounded trigram table."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for name in t["p_name"].to_pylist():
            c.update({name[i : i + 3] for i in range(len(name) - 2)})
        if not c:
            return pa.table(
                {"trigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        tg, n = zip(*sorted(c.items()))
        return pa.table(
            {"trigram": pa.array(tg, pa.string()), "n": pa.array(n, pa.int64())}
        )

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("trigram")
        .aggregate(Sum("n", alias_name="df"))
        .to_pandas()
    )
    df["df"] = df["df"].astype("int64")
    out = df.sort_values(["df", "trigram"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)[["trigram", "df"]]


def part_trigram_selectivity_sql(k: int = 25) -> str:
    return f"""
        WITH tg AS (
            SELECT DISTINCT p_partkey,
                   substr(p_name,
                          unnest(generate_series(1, length(p_name) - 2)),
                          3) AS trigram
            FROM part
        )
        SELECT trigram, CAST(COUNT(*) AS BIGINT) AS df
        FROM tg GROUP BY trigram
        ORDER BY df DESC, trigram LIMIT {k}
    """


_FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_custkey"),       # true key -> holds
    ("orders", "o_custkey", "o_orderstatus"),    # violated
    ("lineitem", "l_orderkey", "l_partkey"),     # violated (multi-line)
    ("lineitem", "l_partkey", "l_suppkey"),      # violated (multi-supplier)
    ("lineitem", "l_orderkey", "l_returnflag"),  # data-dependent
]


def fd_discovery_audit(sf_dir: str) -> pd.DataFrame:
    """Functional-dependency profiling: for each candidate lhs -> rhs
    column pair, does the dependency hold, how many lhs values violate
    it, and how fan-out-y is the worst violator — the schema-inference
    pass a lakehouse catalog runs to discover keys and denormalization
    opportunities before choosing partition columns.

    Distributed plan: per candidate, one distinct-pair groupby (the
    per-batch map collapses within-batch duplicates first) then a
    lhs-keyed count whose summary folds through map_batches partials —
    the exchange carries distinct pairs, never raw rows."""
    from ray.data.aggregate import Count

    rows = []
    for table, lhs, rhs in _FD_CANDIDATES:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[lhs, rhs])

        def dedupe(t: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            g = pa.TableGroupBy(t, [lhs, rhs]).aggregate([])
            return g.select([lhs, rhs])

        per_lhs = (
            ds.map_batches(dedupe, batch_format="pyarrow")
            .groupby([lhs, rhs])
            .aggregate(Count(alias_name="c"))
            .groupby(lhs)
            .aggregate(Count(alias_name="n_rhs"))
        )

        def summary(t: pa.Table) -> pa.Table:
            import numpy as np

            nr = t["n_rhs"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "n_lhs": pa.array([len(nr)], pa.int64()),
                    "n_violating": pa.array([int((nr > 1).sum())], pa.int64()),
                    "max_fanout": pa.array([int(nr.max()) if len(nr) else 0], pa.int64()),
                }
            )

        s = (
            per_lhs.map_batches(summary, batch_format="pyarrow")
            .to_pandas()
            .agg({"n_lhs": "sum", "n_violating": "sum", "max_fanout": "max"})
        )
        rows.append(
            {
                "tbl": table,
                "lhs": lhs,
                "rhs": rhs,
                "n_lhs": int(s["n_lhs"]),
                "n_violating": int(s["n_violating"]),
                "max_fanout": int(s["max_fanout"]),
                "holds": 1 if int(s["n_violating"]) == 0 else 0,
            }
        )
    out = pd.DataFrame(rows).sort_values(["tbl", "lhs", "rhs"]).reset_index(drop=True)
    for c in ("n_lhs", "n_violating", "max_fanout", "holds"):
        out[c] = out[c].astype("int64")
    return out


def fd_discovery_audit_sql() -> str:
    parts = []
    for table, lhs, rhs in _FD_CANDIDATES:
        parts.append(f"""
            SELECT '{table}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
                   CAST(COUNT(*) AS BIGINT) AS n_lhs,
                   CAST(COUNT(*) FILTER (WHERE n_rhs > 1) AS BIGINT)
                       AS n_violating,
                   CAST(MAX(n_rhs) AS BIGINT) AS max_fanout,
                   CAST(CASE WHEN COUNT(*) FILTER (WHERE n_rhs > 1) = 0
                             THEN 1 ELSE 0 END AS BIGINT) AS holds
            FROM (
                SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs
                FROM {table} GROUP BY 1
            )""")
    union = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM (\n{union}\n) ORDER BY tbl, lhs, rhs"


_JOIN_CANDIDATES = [
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events_customer", "events", "user_id", "customer", "c_custkey"),
]


def join_cardinality_audit(sf_dir: str) -> pd.DataFrame:
    """Optimizer cost-model audit: for each candidate equi-join, the
    textbook cardinality estimate floor(n_left * n_right /
    max(d_left, d_right)) (containment-of-values assumption) versus
    the EXACT join output size — the feedback loop that tells a query
    planner where its uniformity assumption breaks (skewed keys blow
    the estimate).  The exact count never materializes the join: it is
    sum over matching keys of count_left * count_right.

    Distributed plan: per side one key-count groupby (key-cardinality
    output); the exact count is an Arrow hash join of the two bounded
    count tables + one vectorized product-sum."""
    from ray.data.aggregate import Count

    rows = []
    for name, lt, lk, rt, rk in _JOIN_CANDIDATES:
        lc = (
            rd.read_parquet(f"{sf_dir}/{lt}.parquet", columns=[lk])
            .groupby(lk)
            .aggregate(Count(alias_name="nl"))
            .to_pandas()
        )
        rc = (
            rd.read_parquet(f"{sf_dir}/{rt}.parquet", columns=[rk])
            .groupby(rk)
            .aggregate(Count(alias_name="nr"))
            .to_pandas()
        )
        n_l, n_r = int(lc["nl"].sum()), int(rc["nr"].sum())
        d_l, d_r = len(lc), len(rc)
        m = lc.merge(rc, left_on=lk, right_on=rk)
        actual = int((m["nl"].astype("int64") * m["nr"].astype("int64")).sum())
        est = n_l * n_r // max(d_l, d_r)
        rows.append(
            {
                "join_name": name,
                "n_left": n_l,
                "n_right": n_r,
                "d_left": d_l,
                "d_right": d_r,
                "est": est,
                "actual": actual,
            }
        )
    out = pd.DataFrame(rows).sort_values("join_name").reset_index(drop=True)
    for c in out.columns:
        if c != "join_name":
            out[c] = out[c].astype("int64")
    return out


def join_cardinality_audit_sql() -> str:
    parts = []
    for name, lt, lk, rt, rk in _JOIN_CANDIDATES:
        parts.append(f"""
            SELECT '{name}' AS join_name,
                   (SELECT COUNT(*) FROM {lt}) AS n_left,
                   (SELECT COUNT(*) FROM {rt}) AS n_right,
                   (SELECT COUNT(DISTINCT {lk}) FROM {lt}) AS d_left,
                   (SELECT COUNT(DISTINCT {rk}) FROM {rt}) AS d_right,
                   (SELECT COUNT(*) FROM {lt}) * (SELECT COUNT(*) FROM {rt})
                       // GREATEST((SELECT COUNT(DISTINCT {lk}) FROM {lt}),
                                   (SELECT COUNT(DISTINCT {rk}) FROM {rt})) AS est,
                   (SELECT COUNT(*) FROM {lt} JOIN {rt} ON {lt}.{lk} = {rt}.{rk})
                       AS actual""")
    union = "\nUNION ALL\n".join(parts)
    return (
        "SELECT join_name, CAST(n_left AS BIGINT) AS n_left, "
        "CAST(n_right AS BIGINT) AS n_right, CAST(d_left AS BIGINT) AS d_left, "
        "CAST(d_right AS BIGINT) AS d_right, CAST(est AS BIGINT) AS est, "
        f"CAST(actual AS BIGINT) AS actual FROM (\n{union}\n) ORDER BY join_name"
    )


_PROFILE_COLUMNS = [
    ("customer", "c_nationkey"),
    ("customer", "c_mktsegment"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("part", "p_brand"),
    ("part", "p_type"),
    ("events", "event_type"),
    ("documents", "lang"),
]


def table_stats_profile(sf_dir: str) -> pd.DataFrame:
    """ANALYZE-style catalog statistics over a fixed column list:
    row count, distinct count and null count per (table, column) —
    the stats collection pass every cost-based planner and layout
    optimizer runs first (join_cardinality_audit consumes exactly
    these numbers).

    Distributed plan: per column one value-keyed groupby whose output
    is value-cardinality-sized; nulls and rows fold as integer
    partials inside the same pass — no data-sized exchange."""
    from ray.data.aggregate import Count, Sum

    rows = []
    for table, col in _PROFILE_COLUMNS:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        counts = (
            ds.map_batches(
                lambda t, col=col: pa.table(
                    {
                        "one": pa.array([1] * len(t), pa.int64()),
                        "isnull": pc.cast(pc.is_null(t[col]), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .aggregate(Sum("one", alias_name="n_rows"), Sum("isnull", alias_name="n_null"))
        )
        distinct = (
            ds.map_batches(
                lambda t, col=col: pa.TableGroupBy(
                    t.select([col]).drop_null(), col
                ).aggregate([]),
                batch_format="pyarrow",
            )
            .groupby(col)
            .aggregate(Count(alias_name="c"))
            .count()
        )
        rows.append(
            {
                "tbl": table,
                "col": col,
                "n_rows": int(counts["n_rows"]),
                "n_distinct": int(distinct),
                "n_null": int(counts["n_null"] or 0),
            }
        )
    out = pd.DataFrame(rows).sort_values(["tbl", "col"]).reset_index(drop=True)
    for c in ("n_rows", "n_distinct", "n_null"):
        out[c] = out[c].astype("int64")
    return out


def table_stats_profile_sql() -> str:
    parts = []
    for table, col in _PROFILE_COLUMNS:
        parts.append(f"""
            SELECT '{table}' AS tbl, '{col}' AS col,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
                   CAST(COUNT(*) FILTER (WHERE {col} IS NULL) AS BIGINT)
                       AS n_null
            FROM {table}""")
    union = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM (\n{union}\n) ORDER BY tbl, col"


def orderkey_fragmentation_audit(sf_dir: str, bucket_width: int = 64) -> pd.DataFrame:
    """Keyspace fragmentation census after a logical delete: drop the
    finished ('F') orders and measure the holes the deletion tears in
    the (originally dense) o_orderkey sequence — live keys, gap runs,
    missing keys, and the largest hole.  This is the compaction
    trigger metric a lakehouse maintenance job reads: many small holes
    -> rewrite; one big hole -> range-drop.

    Distributed plan: surviving keys shuffle once by key // width so
    each bucket's gap scan sees ALL of its keys together (a per-batch
    scan would miss holes between fragments of the same bucket); the
    driver then stitches only the bucket-summary table
    (keyspace/width rows) for holes spanning bucket boundaries — the
    block-stitched scan shape."""
    import numpy as np

    from ray.data.aggregate import Max, Min, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["o_orderstatus"], "F")))
        k = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {"bucket": pc.divide(k, pa.scalar(bucket_width, pa.int64())), "k": k}
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(g["k"].to_numpy(np.int64))
        d = np.diff(k) - 1
        return pd.DataFrame(
            {
                "bucket": [int(g["bucket"].iloc[0])],
                "kmin": [int(k[0])],
                "kmax": [int(k[-1])],
                "n": [len(k)],
                "runs": [int((d > 0).sum())],
                "missing": [int(d[d > 0].sum()) if (d > 0).any() else 0],
                "max_run": [int(d.max()) if len(d) else 0],
            }
        )

    g = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    n_keys = int(g["n"].sum())
    runs = int(g["runs"].sum())
    missing = int(g["missing"].sum())
    max_run = int(g["max_run"].max())
    # stitch bucket boundaries on the bucket-summary table
    for i in range(1, len(g)):
        hole = int(g["kmin"].iloc[i]) - int(g["kmax"].iloc[i - 1]) - 1
        if hole > 0:
            runs += 1
            missing += hole
            max_run = max(max_run, hole)
    return pd.DataFrame(
        {
            "n_live_keys": pd.Series([n_keys], dtype="int64"),
            "n_gap_runs": pd.Series([runs], dtype="int64"),
            "n_missing_keys": pd.Series([missing], dtype="int64"),
            "max_gap_run": pd.Series([max_run], dtype="int64"),
        }
    )


def orderkey_fragmentation_audit_sql() -> str:
    return """
        WITH live AS (
            SELECT o_orderkey AS k FROM orders WHERE o_orderstatus <> 'F'
        ),
        d AS (
            SELECT k - LAG(k) OVER (ORDER BY k) - 1 AS hole FROM live
        )
        SELECT CAST((SELECT COUNT(*) FROM live) AS BIGINT) AS n_live_keys,
               CAST(COUNT(*) FILTER (WHERE hole > 0) AS BIGINT) AS n_gap_runs,
               CAST(COALESCE(SUM(hole) FILTER (WHERE hole > 0), 0) AS BIGINT)
                   AS n_missing_keys,
               CAST(COALESCE(MAX(hole), 0) AS BIGINT) AS max_gap_run
        FROM d
    """


def _hilbert_d(x, y, order: int = 6):
    """Vectorized xy -> Hilbert distance on a 2^order x 2^order grid
    (classic Wikipedia rot/reflect loop, lifted to numpy arrays)."""
    import numpy as np

    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x[swap], y[swap] = y_f[swap], x_f[swap]
        x[flip] = (s - 1) - x[flip]
        y[flip] = (s - 1) - y[flip]
        s >>= 1
    return d


def _zorder_d(x, y, order: int = 6):
    """Vectorized bit-interleave (Morton) on a 2^order grid."""
    import numpy as np

    d = np.zeros_like(x, dtype=np.int64)
    for b in range(order):
        d |= ((x >> b) & 1) << (2 * b)
        d |= ((y >> b) & 1) << (2 * b + 1)
    return d


def curve_locality_audit(sf_dir: str, order: int = 6, n_buckets: int = 64) -> pd.DataFrame:
    """Space-filling-curve locality shoot-out: map every event's
    (hour, minute) cell onto a 2^order grid and linearize it three
    ways — Hilbert, Z-order (Morton), and row-major — then measure how
    far consecutive events (event_id order) jump along each curve:
    total |delta d| and the worst single jump. Smaller totals mean a
    clustered file layout would serve this access pattern with fewer
    seeks — the layout-advisor companion to zorder_layout.

    Distributed plan: a block-stitched scan — each event_id-range
    bucket reduces to its internal step sums plus its boundary d
    values; the driver adds the O(buckets) boundary jumps. Exchange is
    O(buckets), never pairs.

    No SQL oracle: the Hilbert rotation recursion isn't
    SQL-expressible; bijectivity/adjacency certificates and the
    brute-force total on a small prefix are pinned in pytests."""
    import numpy as np

    from ray.data.aggregate import Max, Min

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    stats = ds.aggregate(Min("event_id"), Max("event_id"))
    lo, hi = stats["min(event_id)"], stats["max(event_id)"]
    width = max(1, (hi - lo + n_buckets) // n_buckets)
    side = 1 << order

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("event_id", kind="stable")
        ts = pd.to_datetime(df["ts"])
        x = (ts.dt.hour.to_numpy().astype(np.int64) * side) // 24
        y = (ts.dt.minute.to_numpy().astype(np.int64) * side) // 60
        ds_ = {
            "hilbert": _hilbert_d(x, y, order),
            "zorder": _zorder_d(x, y, order),
            "row_major": y * side + x,
        }
        rows = []
        b = int((df["event_id"].iloc[0] - lo) // width)
        for curve, d in ds_.items():
            step = np.abs(np.diff(d)) if len(d) > 1 else np.array([], dtype=np.int64)
            rows.append(
                {
                    "bucket": b,
                    "curve": curve,
                    "internal_steps": int(step.sum()),
                    "max_step": int(step.max()) if len(step) else 0,
                    "first_d": int(d[0]),
                    "last_d": int(d[-1]),
                }
            )
        return pd.DataFrame(rows)

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.divide(pc.subtract(t["event_id"], lo), width), pa.int64()
                ),
                "event_id": t["event_id"],
                "ts": t["ts"],
            }
        )

    partials = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values(["curve", "bucket"])
    )
    rows = []
    for curve, g in partials.groupby("curve", sort=True):
        total = int(g["internal_steps"].sum())
        mx = int(g["max_step"].max())
        # stitch bucket boundaries in bucket order
        lastd = g["last_d"].to_numpy()[:-1]
        firstd = g["first_d"].to_numpy()[1:]
        if len(lastd):
            bstep = np.abs(firstd - lastd)
            total += int(bstep.sum())
            mx = max(mx, int(bstep.max()))
        rows.append({"curve": curve, "total_steps": total, "max_step": mx})
    out = pd.DataFrame(rows).sort_values("curve").reset_index(drop=True)
    out["total_steps"] = out["total_steps"].astype("int64")
    out["max_step"] = out["max_step"].astype("int64")
    return out[["curve", "total_steps", "max_step"]]


RG_AUDIT_PATH = "/tmp/pdfrust_ray_fixtures/rg_audit/events_rg.parquet"


def _ensure_rg_file(sf_dir: str) -> str:
    """Write the ts-sorted, ten-row-group copy of events the physical
    audits run on — the layout a time-partitioned lakehouse table
    would actually have (the raw fixture is one giant row group, so
    zone maps have nothing to prune).  Deterministic: same input, same
    bytes."""
    import os

    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(RG_AUDIT_PATH), exist_ok=True)
    marker = RG_AUDIT_PATH + ".src"
    if os.path.exists(RG_AUDIT_PATH) and os.path.exists(marker):
        if open(marker).read() == sf_dir:
            return RG_AUDIT_PATH
    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.take(_pc.sort_indices(t, sort_keys=[("ts", "ascending"),
                                              ("event_id", "ascending")]))
    # ~10 groups at every scale so the zone-map ladder is never vacuous
    rg = max(1, -(-t.num_rows // 10))
    pq.write_table(t, RG_AUDIT_PATH, row_group_size=rg)
    with open(marker, "w") as f:
        f.write(sf_dir)
    return RG_AUDIT_PATH


def parquet_layout_audit(sf_dir: str) -> "pd.DataFrame":
    """Physical-layout census of the ts-sorted events copy (see
    _ensure_rg_file): one row per Parquet row group with its row
    count, column-chunk count, and exact compressed/uncompressed byte
    totals — the file-health report compaction planners and
    readers-per-core sizing start from.  Engine reads the footer via
    pyarrow; the oracle re-derives the same numbers from DuckDB's
    parquet_metadata() over the SAME engine-written file, so both the
    write path and the audit are pinned bit-exact.

    Distributed plan: footers are O(KB) regardless of data size; at a
    100-TB table this maps over the file list (one footer read per
    task) — here a single file, read once on the driver."""
    import pandas as pd
    import pyarrow.parquet as pq

    md = pq.ParquetFile(_ensure_rg_file(sf_dir)).metadata
    rows = []
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        comp = sum(rg.column(c).total_compressed_size
                   for c in range(rg.num_columns))
        unc = sum(rg.column(c).total_uncompressed_size
                  for c in range(rg.num_columns))
        rows.append(
            {
                "row_group_id": g,
                "num_rows": rg.num_rows,
                "n_columns": rg.num_columns,
                "compressed_bytes": comp,
                "uncompressed_bytes": unc,
            }
        )
    return pd.DataFrame(rows).astype("int64")


def parquet_layout_audit_sql(sf_dir: str) -> str:
    return f"""
        SELECT CAST(row_group_id AS BIGINT) AS row_group_id,
               CAST(MAX(row_group_num_rows) AS BIGINT) AS num_rows,
               CAST(COUNT(*) AS BIGINT) AS n_columns,
               CAST(SUM(total_compressed_size) AS BIGINT)
                   AS compressed_bytes,
               CAST(SUM(total_uncompressed_size) AS BIGINT)
                   AS uncompressed_bytes
        FROM parquet_metadata('{RG_AUDIT_PATH}')
        GROUP BY 1 ORDER BY 1
    """


def rowgroup_pruning_audit(sf_dir: str) -> "pd.DataFrame":
    """Zone-map effectiveness audit: for a ladder of `ts >= c`
    predicates (c at eighths of the observed stats span, exact
    epoch-microsecond integers), how many row groups the footer
    min/max statistics prove skippable and how many rows that saves —
    the number that says whether the table's sort order actually buys
    predicate pushdown.  A group is prunable iff its stats_max < c.
    Bit-exact vs the parquet_metadata() SQL twin.

    Distributed plan: footer-only, like parquet_layout_audit."""
    import pandas as pd
    import pyarrow.parquet as pq

    md = pq.ParquetFile(_ensure_rg_file(sf_dir))
    meta = md.metadata
    names = md.schema_arrow.names
    ts_idx = names.index("ts")
    groups = []
    for g in range(meta.num_row_groups):
        rg = meta.row_group(g)
        st = rg.column(ts_idx).statistics
        lo = int(st.min.timestamp() * 1_000_000) if hasattr(st.min, "timestamp") else int(st.min)
        hi = int(st.max.timestamp() * 1_000_000) if hasattr(st.max, "timestamp") else int(st.max)
        groups.append((lo, hi, rg.num_rows))
    lo_all = min(g[0] for g in groups)
    hi_all = max(g[1] for g in groups)
    rows = []
    for i in range(1, 9):
        c = lo_all + i * (hi_all - lo_all) // 8
        pruned = [g for g in groups if g[1] < c]
        rows.append(
            {
                "step": i,
                "cutoff_us": c,
                "n_groups": len(groups),
                "n_pruned": len(pruned),
                "rows_skipped": sum(g[2] for g in pruned),
            }
        )
    return pd.DataFrame(rows).astype("int64")


def rowgroup_pruning_audit_sql(sf_dir: str) -> str:
    return f"""
        WITH st AS (
            SELECT row_group_id,
                   MAX(row_group_num_rows) AS nrows,
                   epoch_us(CAST(MAX(stats_min_value) AS TIMESTAMP)) AS lo,
                   epoch_us(CAST(MAX(stats_max_value) AS TIMESTAMP)) AS hi
            FROM parquet_metadata('{RG_AUDIT_PATH}')
            WHERE path_in_schema = 'ts'
            GROUP BY 1
        ), span AS (
            SELECT MIN(lo) AS lo_all, MAX(hi) AS hi_all,
                   CAST(COUNT(*) AS BIGINT) AS n_groups
            FROM st
        ), ladder AS (
            SELECT CAST(range AS BIGINT) AS step,
                   span.lo_all + range * (span.hi_all - span.lo_all) // 8
                       AS cutoff_us,
                   span.n_groups
            FROM range(1, 9) CROSS JOIN span
        )
        SELECT l.step, l.cutoff_us, l.n_groups,
               CAST(COALESCE(SUM(CASE WHEN st.hi < l.cutoff_us
                                      THEN 1 END), 0) AS BIGINT)
                   AS n_pruned,
               CAST(COALESCE(SUM(CASE WHEN st.hi < l.cutoff_us
                                      THEN st.nrows END), 0) AS BIGINT)
                   AS rows_skipped
        FROM ladder l CROSS JOIN st
        GROUP BY 1, 2, 3 ORDER BY 1
    """
