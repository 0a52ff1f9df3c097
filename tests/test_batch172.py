"""Batch-172 ops: the round-4 second-session additions.

  - containment_dedup_dfcap: stop-shingle-capped SSJoin scale sibling
    of the exact containment op (the named super-linear sf1 cell);
    subset-of-exact + fixture recall pinned, degenerate cap == exact.
  - soft_dedup_reweight: 1/cluster_size ppm weights over near-dup
    clusters (exact SQL twin via the dedup_clusters recursive CTE).
  - dsir_select: DSIR hashed bag-of-words importance resampling with
    micro-nat integer quantization (exact SQL twin).
  - unimax_allocation: UniMax epoch-capped integer water-filling
    (exact recursive-CTE twin; both branches exercised at fixture).
  - perplexity_buckets: CCNet head/middle/tail tertiles over the
    bigram-LM surprisal (exact NTILE twin).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


def _assert_oracle(con, mine: pd.DataFrame, sql: str):
    odf = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )


# ---------------------------------------------------------------- containment


def test_containment_dfcap_subset_and_recall(ray_session):
    from pdfrust_ray.stages.dedup import containment_dedup, containment_dedup_dfcap

    exact = containment_dedup(SF)
    capped = containment_dedup_dfcap(SF, df_cap=64)
    ek = set(zip(exact.doc_a, exact.doc_b))
    ck = set(zip(capped.doc_a, capped.doc_b))
    assert ck <= ek  # exact verify: never a false positive
    # the fixture's true pairs all share rare shingles: full recall
    assert ck == ek


def test_containment_dfcap_degenerate_is_exact(ray_session):
    from pdfrust_ray.stages.dedup import containment_dedup, containment_dedup_dfcap

    exact = containment_dedup(SF)
    # a cap no shingle df exceeds keeps every posting list: identical
    loose = containment_dedup_dfcap(SF, df_cap=10_000_000)
    pd.testing.assert_frame_equal(loose, exact)


def test_containment_dfcap_planted_hot_only_pair_missed(ray_session, tmp_path):
    # two docs identical except both made ENTIRELY of shingles that are
    # hot (shared by every doc): the capped sibling must (by design)
    # miss the pair the exact op finds — pinning the documented recall
    # trade rather than silently relying on lucky fixtures.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfrust_ray.stages.dedup import containment_dedup, containment_dedup_dfcap

    hot = "abcdefghij"  # every doc contains these shingles
    docs = [hot + f" filler{i:02d} " + f"unique words here {i}" for i in range(8)]
    docs += [hot, hot]  # the hot-only near-dup pair
    pq.write_table(
        pa.table({"doc_id": list(range(len(docs))), "text": docs}),
        tmp_path / "documents.parquet",
    )
    exact = containment_dedup(str(tmp_path))
    ek = set(zip(exact.doc_a, exact.doc_b))
    assert (8, 9) in ek
    capped = containment_dedup_dfcap(str(tmp_path), df_cap=2, lsh_union=False)
    ck = set(zip(capped.doc_a, capped.doc_b))
    assert (8, 9) not in ck  # its shingles all have df=10 > cap
    assert ck <= ek
    # ... but the hybrid's MinHash source catches it (identical docs
    # are maximal-Jaccard) — the insurance the union exists for
    hybrid = containment_dedup_dfcap(str(tmp_path), df_cap=2, lsh_union=True)
    hk = set(zip(hybrid.doc_a, hybrid.doc_b))
    assert (8, 9) in hk
    assert hk <= ek


# ------------------------------------------------------------------ soft dedup


def test_soft_dedup_reweight_oracle(ray_session, con):
    from pdfrust_ray.stages.dedup import soft_dedup_reweight, soft_dedup_reweight_sql

    mine = soft_dedup_reweight(SF)
    assert len(mine) == 500
    assert (mine.cluster_size > 1).any()  # non-vacuous on the fixture
    _assert_oracle(con, mine, soft_dedup_reweight_sql())


def test_soft_dedup_reweight_invariants(ray_session):
    from pdfrust_ray.stages.dedup import dedup_clusters, soft_dedup_reweight

    mine = soft_dedup_reweight(SF)
    # exact ppm reciprocal of the near-dup cluster size
    assert (mine.weight_ppm == 1_000_000 // mine.cluster_size).all()
    labels = dedup_clusters(SF)
    clustered = set(labels.doc_id.astype(int))
    flagged = set(mine.loc[mine.cluster_size > 1, "doc_id"].astype(int))
    assert flagged == clustered


# ------------------------------------------------------------------------ DSIR


def test_dsir_select_oracle(ray_session, con):
    from pdfrust_ray.pipelines.llmdata import dsir_select, dsir_select_sql

    mine = dsir_select(SF)
    assert len(mine) == 100
    _assert_oracle(con, mine, dsir_select_sql())


def test_dsir_select_prefers_target_vocabulary(ray_session, tmp_path):
    # planted: target-source docs use a disjoint vocabulary; a raw doc
    # written in that vocabulary must out-rank every ordinary raw doc.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfrust_ray.pipelines.llmdata import dsir_select

    tgt_words = "alpha beta gamma delta epsilon"
    raw_words = "one two three four five"
    rows = []
    for i in range(10):
        rows.append((i, tgt_words, "tgt"))
    for i in range(10, 30):
        rows.append((i, raw_words, "raw"))
    rows.append((30, tgt_words, "raw"))  # the target-like raw doc
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "source": [r[2] for r in rows],
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = dsir_select(str(tmp_path), target_source="tgt", m=31)
    raw_ranked = out[out.doc_id >= 10].reset_index(drop=True)
    assert int(raw_ranked.iloc[0].doc_id) == 30
    assert raw_ranked.iloc[0].weight_q > raw_ranked.iloc[1].weight_q


# ---------------------------------------------------------------------- UniMax


def test_unimax_allocation_oracle(ray_session, con):
    from pdfrust_ray.pipelines.llmdata import unimax_allocation, unimax_allocation_sql

    mine = unimax_allocation(SF)
    _assert_oracle(con, mine, unimax_allocation_sql())


def test_unimax_allocation_both_branches_and_invariants(ray_session):
    from pdfrust_ray.pipelines.llmdata import unimax_allocation

    mine = unimax_allocation(SF)
    capped = mine.alloc == mine.capacity
    assert capped.any() and (~capped).any()  # fixture pins both branches
    assert (mine.alloc <= mine.capacity).all()
    budget = int(mine.n_tokens.sum()) * 3 // 2
    assert int(mine.alloc.sum()) <= budget
    # uncapped languages all receive within 1 token of each other
    uncapped = mine.loc[~capped, "alloc"]
    assert int(uncapped.max()) - int(uncapped.min()) <= 1


# --------------------------------------------------------------- CCNet buckets


def test_perplexity_buckets_oracle(ray_session, con):
    from pdfrust_ray.pipelines.quality import perplexity_buckets, perplexity_buckets_sql

    mine = perplexity_buckets(SF)
    assert len(mine) == 500
    _assert_oracle(con, mine, perplexity_buckets_sql())


def test_perplexity_buckets_tiles_balanced_and_ordered(ray_session):
    from pdfrust_ray.pipelines.quality import perplexity_buckets

    mine = perplexity_buckets(SF)
    counts = mine.tile.value_counts()
    assert set(counts.index) == {1, 2, 3}
    assert counts.max() - counts.min() <= 1
    # head max ratio <= middle min ratio <= tail: tertiles are ordered
    assert mine.loc[mine.tile == 1, "ratio_q"].max() <= mine.loc[
        mine.tile == 2, "ratio_q"
    ].min() or True  # ties may straddle; check rank-consistency instead
    m = mine.sort_values(["ratio_q", "doc_id"]).reset_index(drop=True)
    assert (np.diff(m.tile.to_numpy()) >= 0).all()


# ------------------------------------------------------------ NB classifier


def test_nb_source_classifier_oracle(ray_session, con):
    from pdfrust_ray.pipelines.quality import (
        nb_source_classifier,
        nb_source_classifier_sql,
    )

    mine = nb_source_classifier(SF)
    assert int(mine.n_docs.sum()) == 500  # every doc classified once
    _assert_oracle(con, mine, nb_source_classifier_sql())


def test_nb_source_classifier_separable_vocab(ray_session, tmp_path):
    # two sources with disjoint vocabularies: NB must classify every
    # doc correctly (diagonal confusion matrix)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfrust_ray.pipelines.quality import nb_source_classifier

    rows = []
    for i in range(20):
        rows.append((i, "apple banana cherry durian elderberry", "fruit"))
    for i in range(20, 40):
        rows.append((i, "carrot potato onion garlic leek", "veg"))
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "source": [r[2] for r in rows],
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = nb_source_classifier(str(tmp_path))
    assert set(zip(out.source, out.predicted)) == {("fruit", "fruit"), ("veg", "veg")}
    assert (out.n_docs == 20).all()


# -------------------------------------------------------------- CCNet capstone


def test_ccnet_head_middle_mix_oracle(ray_session, con):
    from pdfrust_ray.pipelines.llmdata import (
        ccnet_head_middle_mix,
        ccnet_head_middle_mix_sql,
    )

    mine = ccnet_head_middle_mix(SF)
    assert set(mine.tile) == {1, 2}  # tail dropped
    assert int(mine.n_docs.sum()) == 334  # 2/3 of 500, NTILE split
    _assert_oracle(con, mine, ccnet_head_middle_mix_sql())


def test_ccnet_mix_consistent_with_constituents(ray_session):
    from pdfrust_ray.pipelines.llmdata import ccnet_head_middle_mix
    from pdfrust_ray.pipelines.quality import perplexity_buckets

    mix = ccnet_head_middle_mix(SF)
    tiles = perplexity_buckets(SF)
    kept = tiles[tiles.tile <= 2]
    assert int(mix.n_docs.sum()) == len(kept)
    # weighted tokens never exceed raw tokens (weights <= 1e6 ppm)
    assert (mix.weighted_tokens_ppm <= mix.sum_tokens * 1_000_000).all()


# ------------------------------------------------------- BWT oracle upgrade


def test_bwt_compressibility_oracle(ray_session, con):
    # round-4 upgrade: the former rows-only BWT audit now has an exact
    # rotation-sort SQL twin (chr(1) sentinel ~ the engine's byte 0,
    # both the strict minimum against ASCII text)
    from pdfrust_ray.pipelines.textops import (
        bwt_compressibility,
        bwt_compressibility_sql,
    )

    mine = bwt_compressibility(SF)
    assert (mine.runs_bwt <= mine.runs_orig).all()  # BWT clusters chars
    _assert_oracle(con, mine, bwt_compressibility_sql())


# ------------------------------------------------- Belady OPT oracle upgrade


def test_belady_opt_cache_audit_oracle(ray_session):
    # round-4 upgrade: the former rows-only OPT replay now has an exact
    # recursive-CTE twin (one access step per round across all users)
    import duckdb

    from pdfrust_ray.pipelines.relational import (
        belady_opt_cache_audit,
        belady_opt_cache_audit_sql,
    )

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    mine = belady_opt_cache_audit(SF)
    assert (mine.opt_hits >= mine.lru_hits).all()  # the OPT theorem
    _assert_oracle(c, mine, belady_opt_cache_audit_sql())


# ------------------------------------------------------------ pretrain plan


def test_pretrain_mix_plan_oracle(ray_session, con):
    from pdfrust_ray.pipelines.llmdata import pretrain_mix_plan, pretrain_mix_plan_sql

    mine = pretrain_mix_plan(SF)
    assert len(mine) == 15  # 5 langs x 3 tiles
    _assert_oracle(con, mine, pretrain_mix_plan_sql())


def test_pretrain_mix_plan_invariants(ray_session):
    from pdfrust_ray.pipelines.llmdata import pretrain_mix_plan, unimax_allocation

    mine = pretrain_mix_plan(SF)
    uni = unimax_allocation(SF, epoch_cap=2).set_index("lang")
    assert (mine.alloc <= mine.capacity).all()
    # fixture exercises both the cap and the spill branches
    assert (mine.alloc == mine.capacity).any()
    assert (mine.spill_out > 0).any()
    for lang, g in mine.groupby("lang"):
        g = g.sort_values("tile")
        # targets sum exactly to the lang's UniMax budget
        assert int(g.target.sum()) == int(uni.loc[lang, "alloc"])
        # conservation: allocated + final spill == budget
        assert int(g.alloc.sum()) + int(g.spill_out.iloc[-1]) == int(
            uni.loc[lang, "alloc"]
        )


# ------------------------------------------------------- fixed-point k-means


def test_kmeans_fixedpoint_oracle(ray_session):
    import duckdb

    from pdfrust_ray.stages.similarity import kmeans_fixedpoint, kmeans_fixedpoint_sql

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    mine = kmeans_fixedpoint(SF)
    assert int(mine.n_members.sum()) == 500  # every vector assigned
    assert len(mine) <= 10
    _assert_oracle(c, mine, kmeans_fixedpoint_sql())


def test_kmeans_fixedpoint_label_recovery(ray_session, tmp_path):
    # three well-separated planted blobs: fixed-point Lloyd must
    # recover them exactly (cluster sizes 20/20/20, tiny inertia)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfrust_ray.stages.similarity import kmeans_fixedpoint

    rng = np.random.RandomState(7)
    blobs = []
    for c0 in ([5.0] * 8, [-5.0] * 8, [0.0] * 4 + [9.0] * 4):
        blobs.append(np.asarray(c0) + rng.uniform(-0.2, 0.2, size=(20, 8)))
    m = np.concatenate(blobs).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(60), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in m],
                                      pa.list_(pa.float32())),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = kmeans_fixedpoint(str(tmp_path), k=3, iters=5, scale=64)
    assert sorted(out.n_members) == [20, 20, 20]


# ----------------------------------------------------- fixed-point PCA power


def test_pca_power_fixedpoint_oracle(ray_session):
    import duckdb

    from pdfrust_ray.stages.similarity import (
        pca_power_fixedpoint,
        pca_power_fixedpoint_sql,
    )

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    mine = pca_power_fixedpoint(SF)
    assert len(mine) == 65  # 64 dims + the lam_q row
    assert int(mine.loc[mine.dim == -1, "component"].iloc[0]) > 0
    _assert_oracle(c, mine, pca_power_fixedpoint_sql())


def test_pca_power_fixedpoint_matches_float_eigenvector(ray_session):
    # the integer iteration must land on the true dominant axis of the
    # quantized second-moment matrix (|cos| > 0.999 vs numpy eigh)
    import numpy as np
    import pyarrow.parquet as pq

    from pdfrust_ray.stages.similarity import pca_power_fixedpoint

    mine = pca_power_fixedpoint(SF)
    v = mine.loc[mine.dim >= 0].sort_values("dim")["component"].to_numpy(float)
    emb = np.stack(
        [np.asarray(x, dtype=np.float64)
         for x in pq.read_table(f"{SF}/embeddings.parquet")["embedding"].to_pylist()]
    )
    q = np.floor(emb * 1024.0 + 0.5)
    a = q.T @ q
    w, vecs = np.linalg.eigh(a)
    top = vecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999
    # Rayleigh quotient agrees with the true top eigenvalue to <0.1%
    lam = mine.loc[mine.dim == -1, "component"].iloc[0] / 1e6
    assert abs(lam - w[-1]) / w[-1] < 1e-3


# ------------------------------------------------- fixed-point SemDeDup


def test_semantic_dedup_fixedpoint_oracle(ray_session):
    import duckdb

    from pdfrust_ray.stages.similarity import (
        semantic_dedup_fixedpoint,
        semantic_dedup_fixedpoint_sql,
    )

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    mine = semantic_dedup_fixedpoint(SF)
    assert len(mine) > 0  # non-vacuous at the fixture threshold
    assert (mine.vec_a < mine.vec_b).all()
    _assert_oracle(c, mine, semantic_dedup_fixedpoint_sql())


def test_semantic_dedup_fixedpoint_pairs_verify_cosine(ray_session):
    # every reported pair really is >= the cosine threshold (checked
    # in float against the raw embeddings), and pairs share a cluster
    import numpy as np
    import pyarrow.parquet as pq

    from pdfrust_ray.stages.similarity import semantic_dedup_fixedpoint

    mine = semantic_dedup_fixedpoint(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    emb = {i: np.asarray(v, float) for i, v in zip(ids, t["embedding"].to_pylist())}
    for a, b in zip(mine.vec_a, mine.vec_b):
        va, vb = emb[int(a)], emb[int(b)]
        cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        # quantization slack: the integer test ran at scale 1024
        assert cos >= 0.4 - 0.01


# ---------------------------------------------- det heavy hitters (MG tree)


def test_heavy_hitters_det_oracle(ray_session):
    import duckdb

    from pdfrust_ray.stages.streaming import heavy_hitters_det, heavy_hitters_det_sql

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    mine = heavy_hitters_det(SF)
    assert 0 < len(mine) <= 4
    _assert_oracle(c, mine, heavy_hitters_det_sql())


def test_heavy_hitters_det_mg_guarantees(ray_session):
    # mergeable-summary guarantees vs exact counts: survivors'
    # counters are lower bounds, and any type with true count
    # > n/(capacity+1) must be present
    import duckdb

    from pdfrust_ray.stages.streaming import heavy_hitters_det

    c = duckdb.connect()
    exact = dict(
        c.execute(
            f"SELECT event_type, COUNT(*) FROM "
            f"read_parquet('{SF}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    n = sum(exact.values())
    mine = heavy_hitters_det(SF, capacity=4)
    got = dict(zip(mine.event_type, mine.mg_count))
    for t, cnt in got.items():
        assert cnt <= exact[t]  # lower bound
    for t, true in exact.items():
        if true > n // 5:  # n/(capacity+1)
            assert t in got


# --------------------------------------------------------------- DPO pairs


def test_dpo_pairs_oracle(ray_session):
    import duckdb

    from pdfrust_ray.fixtures.corpus import ensure_forks_fixture
    from pdfrust_ray.pipelines.conversation import dpo_pairs, dpo_pairs_sql

    d = ensure_forks_fixture()
    mine = dpo_pairs(d)
    assert len(mine) > 0  # the planted forks yield pairs
    assert (mine.chosen_chars >= mine.rejected_chars).all()
    assert (mine.chosen_conv != mine.rejected_conv).all()
    c = duckdb.connect()
    odf = c.execute(dpo_pairs_sql(f"{d}/shards/*.parquet")).fetchdf()
    import pandas as pd

    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), odf.reset_index(drop=True), check_dtype=False
    )


def test_dpo_pairs_planted(ray_session, tmp_path):
    # two conversations share turns 0-2 exactly, diverge at turn 3 with
    # different lengths; a third unrelated conv produces no pair
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfrust_ray.pipelines.conversation import dpo_pairs

    rows = []
    for cid, cont in (("cA", "short"), ("cB", "a much longer continuation here")):
        for i, txt in enumerate(["hello", "hi there", "ok"]):
            rows.append((cid, i, txt))
        rows.append((cid, 3, cont))
    rows += [("cZ", 0, "totally"), ("cZ", 1, "unrelated"), ("cZ", 2, "conv"),
             ("cZ", 3, "tail")]
    os.makedirs(tmp_path / "shards", exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "text": [r[2] for r in rows],
            }
        ),
        tmp_path / "shards" / "part0.parquet",
    )
    out = dpo_pairs(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0].chosen_conv == "cB" and out.iloc[0].rejected_conv == "cA"


# -------------------------------------------------------- tokenizer fertility


def test_tokenizer_fertility_oracle(ray_session, con):
    from pdfrust_ray.pipelines.llmdata import (
        tokenizer_fertility,
        tokenizer_fertility_sql,
    )

    mine = tokenizer_fertility(SF)
    assert len(mine) == 5  # one row per language
    # word-soup text: every token spans >1 char, fertility > 1000 milli
    assert (mine.chars_per_token_milli > 1000).all()
    _assert_oracle(con, mine, tokenizer_fertility_sql())


# ----------------------------------------------------------- corpus datasheet


def test_corpus_datasheet_oracle(ray_session, con):
    from pdfrust_ray.pipelines.llmdata import corpus_datasheet, corpus_datasheet_sql

    mine = corpus_datasheet(SF)
    vals = dict(zip(mine.metric, mine.value))
    assert vals["n_docs"] == 500 and vals["n_langs"] == 5
    assert vals["neardup_docs"] > 0
    assert vals["n_tokens"] * 1000 // vals["n_docs"] == vals["mean_doc_tokens_milli"]
    _assert_oracle(con, mine, corpus_datasheet_sql())
