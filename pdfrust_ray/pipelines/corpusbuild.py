"""The end-to-end corpus build: extraction -> clean -> dedup -> pack.

Everything upstream exists as an individually-oracled operator; this
module chains them into the ONE pipeline a pretraining-data owner
actually runs over a transcript dump, with a single chained SQL twin:

  flagship extraction (mode=text, full Ray pipeline, actor pools,
  skew routing)                       [oracle: the frozen golden]
  -> parse_status == 'ok', non-empty text
  -> quality_score(extracted_text) >= cut        [quality twin expr]
  -> exact dedup on md5(extracted_text), keep the (conv_id, turn_idx)
     minimum                                   [ROW_NUMBER twin]
  -> greedy sequence packing into token-budget packs, hash-bucketed
     (coordination-free)              [pack_sequences recursion twin]

The oracle substitutes the extraction stage with the frozen golden
parquet (the same anchoring every extract_* query uses — the golden
itself is pinned by byte parity against the reference binary), then
replays filter, dedup and packing in SQL, so the WHOLE chain is
value-exact end-to-end.

Scale shape: extraction is the flagship (streaming, actor pools); the
clean/score stage is a zero-shuffle scan (texts never leave their
task after the digest + token count are computed); dedup shuffles
16-byte digests + keys on a coarse shard key (64 python dispatches,
not one per digest); packing shuffles the same skinny rows once more
on the pack bucket. The full text crosses the wire zero times after
extraction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_DEDUP_SHARDS = 64


def transcript_corpus_build(
    corpus_dir: str,
    quality_cut_centi: int = 30,
    budget: int = 256,
    n_buckets: int = 16,
    concurrency=None,
) -> pd.DataFrame:
    """Run the full build; returns the pack assignment for every
    surviving turn: (conv_id, turn_idx, n_tokens, bucket, pack_id,
    pack_pos) ORDER BY conv_id, turn_idx."""
    from ..functions.md5vec import md5_prefix_u32
    from ..functions.textstats import quality_score, token_count
    from ..sources.transcripts import read_transcripts
    from .extract_pipeline import build_extraction

    if concurrency is None:
        import ray

        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cpus = 4
        concurrency = max(2, min(cpus - 1, 30))
    cut = quality_cut_centi / 100.0
    ext = build_extraction(
        read_transcripts(corpus_dir),
        mode="text",
        order=False,
        concurrency=concurrency,
    )

    def prep(t: pa.Table) -> pa.Table:
        convs = t["conv_id"].to_pylist()
        idxs = t["turn_idx"].to_pylist()
        texts = t["extracted_text"].to_pylist()
        stats = t["parse_status"].to_pylist()
        oc, oi, dig, dsh, ntok, bkt = [], [], [], [], [], []
        for c, i, x, s in zip(convs, idxs, texts, stats):
            if s != "ok" or x == "" or quality_score(x) < cut:
                continue
            d = hashlib.md5(x.encode("utf-8")).hexdigest()
            oc.append(c)
            oi.append(int(i))
            dig.append(d)
            dsh.append(int(d[:8], 16) % _DEDUP_SHARDS)
            ntok.append(token_count(x))
        if oc:
            bkt = (
                md5_prefix_u32([f"{c}:{i}".encode() for c, i in zip(oc, oi)])
                % n_buckets
            ).astype(np.int64)
        return pa.table(
            {
                "conv_id": pa.array(oc, pa.string()),
                "turn_idx": pa.array(oi, pa.int64()),
                "digest": pa.array(dig, pa.string()),
                "dshard": pa.array(dsh, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "bucket": pa.array(
                    bkt if len(oc) else [], pa.int64()
                ),
            }
        )

    def dedup_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["digest", "conv_id", "turn_idx"], kind="mergesort"
        ).drop_duplicates("digest", keep="first")
        return g[["conv_id", "turn_idx", "n_tokens", "bucket"]]

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
            drop=True
        )
        pack_id, acc, pos = 0, 0, 0
        pids, poss = [], []
        for n in g["n_tokens"]:
            if acc > 0 and acc + int(n) > budget:
                pack_id += 1
                acc = 0
                pos = 0
            acc += int(n)
            pids.append(pack_id)
            poss.append(pos)
            pos += 1
        g["pack_id"] = pd.Series(pids, dtype="int64")
        g["pack_pos"] = pd.Series(poss, dtype="int64")
        return g[["conv_id", "turn_idx", "n_tokens", "bucket", "pack_id", "pack_pos"]]

    out = (
        ext.map_batches(prep, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(dedup_shard, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
        .to_pandas()
    )
    for c in out.columns:
        if c != "conv_id":
            out[c] = out[c].astype("int64")
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def transcript_corpus_build_sql(
    golden_glob: str,
    quality_cut_centi: int = 30,
    budget: int = 256,
    n_buckets: int = 16,
) -> str:
    """Chained exact twin over the frozen golden: quality expression
    (the quality_scores twin transplanted onto extracted_text), md5
    ROW_NUMBER dedup, and the pack_sequences greedy recursion."""
    from ..functions.textstats import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in sorted(STOPWORDS["en"]))
    cut = quality_cut_centi
    return rf"""
WITH RECURSIVE ext AS MATERIALIZED (
    SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, extracted_text
    FROM read_parquet('{golden_glob}')
    WHERE parse_status = 'ok' AND extracted_text <> ''
), qb AS (
    SELECT conv_id, turn_idx,
           CAST(length(extracted_text) AS DOUBLE) AS n,
           CAST(length(regexp_extract_all(extracted_text, '[^\w\s]'))
                AS DOUBLE) AS punct,
           regexp_extract_all(lower(extracted_text), '[A-Za-zÀ-ɏ'']+')
               AS words
    FROM ext
), qc AS (
    SELECT conv_id, turn_idx, n, punct,
           CAST(len(words) AS DOUBLE) AS nw,
           CAST(len(list_filter(words, w -> list_contains([{sw}], w)))
                AS DOUBLE) AS nsw,
           CASE WHEN len(words) > 0
                THEN CAST(list_sum(list_transform(words, w -> length(w)))
                          AS DOUBLE) / CAST(len(words) AS DOUBLE)
                ELSE 0.0 END AS mean_len
    FROM qb
), q AS (
    SELECT conv_id, turn_idx,
           CASE WHEN n = 0 THEN 0.0 ELSE round(
             0.35 * (least(n, 2000.0) / 2000.0)
           + 0.25 * (1.0 - least((punct / n) * 4.0, 1.0))
           + 0.25 * (CASE WHEN nw > 0 THEN least((4.0 * nsw) / nw, 1.0)
                          ELSE 0.0 END)
           + 0.15 * (CASE WHEN nw > 0 THEN
                       (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0
                             THEN 1.0 ELSE 0.5 END)
                     ELSE 0.0 END)
           , 6) END AS quality
    FROM qc
), kept AS (
    SELECT e.conv_id, e.turn_idx, e.extracted_text,
           CAST(length(string_split_regex(e.extracted_text, '\s+'))
                AS BIGINT) AS n_tokens
    FROM ext e JOIN q USING (conv_id, turn_idx)
    WHERE q.quality >= {cut} / 100.0
), dd AS (
    SELECT conv_id, turn_idx, n_tokens,
           row_number() OVER (PARTITION BY md5(extracted_text)
                              ORDER BY conv_id, turn_idx) AS rn
    FROM kept
), u AS (
    SELECT conv_id, turn_idx, n_tokens,
           CAST(CAST(('0x' || substr(md5(conv_id || ':'
                    || CAST(turn_idx AS VARCHAR)), 1, 8)) AS UBIGINT)
                % {n_buckets} AS BIGINT) AS bucket
    FROM dd WHERE rn = 1
), o AS (
    SELECT conv_id, turn_idx, n_tokens, bucket,
           row_number() OVER (PARTITION BY bucket
                              ORDER BY conv_id, turn_idx) AS rn
    FROM u
), s AS (
    SELECT conv_id, turn_idx, n_tokens, bucket, rn,
           CAST(0 AS BIGINT) AS pack_id,
           CAST(0 AS BIGINT) AS pack_pos,
           n_tokens AS acc
    FROM o WHERE rn = 1
    UNION ALL
    SELECT o.conv_id, o.turn_idx, o.n_tokens, o.bucket, o.rn,
           CASE WHEN s.acc + o.n_tokens > {budget}
                THEN s.pack_id + 1 ELSE s.pack_id END,
           CASE WHEN s.acc + o.n_tokens > {budget}
                THEN 0 ELSE s.pack_pos + 1 END,
           CASE WHEN s.acc + o.n_tokens > {budget}
                THEN o.n_tokens ELSE s.acc + o.n_tokens END
    FROM s JOIN o ON o.bucket = s.bucket AND o.rn = s.rn + 1
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, n_tokens, bucket,
       pack_id, pack_pos
FROM s ORDER BY conv_id, turn_idx
    """
