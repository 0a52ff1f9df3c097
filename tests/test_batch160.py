"""Batch-160: assistant phrase census + co-supplier tie strength."""

SF = "/root/testdata/sf0.001"


def test_assistant_phrase_census_brute(ray_session):
    from pdfrust_ray.fixtures.corpus import ensure_corpus
    from pdfrust_ray.pipelines.conversation import (
        _ASSISTANT_PROBES,
        assistant_phrase_census,
    )
    import glob
    import pandas as pd
    import pyarrow.parquet as pq

    corpus = ensure_corpus("t1")
    out = assistant_phrase_census(corpus)
    t = pd.concat(
        pq.read_table(f).to_pandas()
        for f in sorted(glob.glob(f"{corpus}/shards/*.parquet"))
    )
    texts = t.loc[t["role"] == "assistant", "text"].tolist()
    for p in _ASSISTANT_PROBES:
        row = out[out["phrase"] == p].iloc[0]
        assert int(row["occurrences"]) == sum(s.count(p) for s in texts)
        assert int(row["n_turns"]) == sum(1 for s in texts if p in s)
    # the probe lexicon is non-vacuous on this corpus
    assert int(out["occurrences"].sum()) > 0


def test_cosupplier_histogram_brute(ray_session):
    from pdfrust_ray.pipelines.relational import cosupplier_degree_histogram
    import collections
    import itertools
    import pyarrow.parquet as pq

    out = cosupplier_degree_histogram(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).to_pandas()
    edges = set(zip(li["l_partkey"], li["l_suppkey"]))
    by_part = collections.defaultdict(set)
    for p, s in edges:
        by_part[p].add(s)
    w = collections.Counter()
    for supps in by_part.values():
        for a, b in itertools.combinations(sorted(supps), 2):
            w[(a, b)] += 1
    hist = collections.Counter(w.values())
    got = dict(zip(out["shared_parts"].astype(int), out["n_pairs"].astype(int)))
    assert got == dict(hist)
    # weights spread across more than one bucket (non-degenerate)
    assert len(out) > 1
