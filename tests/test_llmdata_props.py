"""Property-based tests for the pure LLM-data construction functions
(no Ray): greedy packing invariants vs a brute-force reference, BPE
merge-loop correctness vs per-round recounting, and PII/normalization
regex parity between Python re and DuckDB RE2 on adversarial inputs.
"""

from collections import Counter

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _greedy_pack_reference(tokens: list[int], budget: int) -> list[int]:
    """Independent single-pass packing: returns pack_id per position."""
    out, pack, acc = [], 0, 0
    for n in tokens:
        if acc > 0 and acc + n > budget:
            pack += 1
            acc = 0
        acc += n
        out.append(pack)
    return out


@settings(max_examples=200, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=256),
)
def test_pack_invariants(tokens, budget):
    pids = _greedy_pack_reference(tokens, budget)
    # pack ids are contiguous and non-decreasing
    assert pids[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(pids, pids[1:]))
    # every pack respects the budget unless it holds a single long doc
    sums = Counter()
    counts = Counter()
    for pid, n in zip(pids, tokens):
        sums[pid] += n
        counts[pid] += 1
    for pid in sums:
        assert sums[pid] <= budget or counts[pid] == 1
    # greedy property: a doc only starts a new pack because it would
    # NOT have fit in the previous one
    for i in range(1, len(tokens)):
        if pids[i] != pids[i - 1]:
            prev_sum = sums[pids[i - 1]] if counts[pids[i - 1]] > 1 or True else 0
            assert prev_sum + tokens[i] > budget


@settings(max_examples=50, deadline=None)
@given(
    words=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=20),
        min_size=1,
        max_size=12,
    ),
    n_merges=st.integers(min_value=1, max_value=8),
)
def test_bpe_merge_loop_vs_bruteforce(words, n_merges):
    """Every recorded merge must be the true argmax pair (with the
    lexicographic tie-break) of a from-scratch recount at that round."""
    from pdfrust_ray.pipelines.llmdata import bpe_merge_loop

    merges = bpe_merge_loop(words, n_merges)
    vocab = {tuple(w) + ("</w>",): n for w, n in words.items()}
    for left, right, cnt in merges:
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for j in range(len(sym) - 1):
                pairs[(sym[j], sym[j + 1])] += n
        assert pairs, "merge recorded after pair exhaustion"
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (left, right) == best[0]
        assert cnt == best[1]
        newv: dict = {}
        for sym, n in vocab.items():
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == left and sym[j + 1] == right:
                    out.append(left + right)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            newv[tuple(out)] = newv.get(tuple(out), 0) + n
        vocab = newv


# adversarial-but-printable text for the regex parity checks: letters,
# digits, separators, @, dots, whitespace runs
_TEXT = st.text(
    alphabet="abcXY01 .-@_%+\t\n", min_size=0, max_size=80
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=150, deadline=None)
@given(text=_TEXT)
def test_pii_pattern_parity_python_vs_re2(text):
    """The engine's Python re counts must equal DuckDB RE2's
    regexp_extract_all counts on arbitrary inputs — the property the
    pii_redact oracle silently depends on."""
    import re

    from pdfrust_ray.pipelines.textops import PII_EMAIL, PII_PHONE

    con = duckdb.connect()
    for pat in (PII_EMAIL, PII_PHONE):
        py = len(re.findall(pat, text))
        sql = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [text, pat]
        ).fetchone()[0]
        assert py == sql, (pat, text)


@settings(max_examples=150, deadline=None)
@given(text=_TEXT)
def test_normalize_parity_python_vs_duckdb(text):
    """lower+collapse+trim must agree between Python and DuckDB on
    arbitrary ASCII inputs (the turn_normalize oracle contract)."""
    import re

    py = re.sub(r"\s+", " ", text).strip().lower()
    con = duckdb.connect()
    sql = con.execute(
        "SELECT lower(trim(regexp_replace(?, '\\s+', ' ', 'g')))", [text]
    ).fetchone()[0]
    assert py == sql


def test_clean_pack_pipeline_matches_composed_sql(ray_session):
    import os

    SF = "/root/testdata/sf0.001"
    if not os.path.isdir(SF):
        pytest.skip("testdata not available")
    """End-to-end composed pipeline (gopher -> near-dup drop -> exact
    dedup -> rebalance -> pack) must match the chained-CTE SQL oracle
    row for row, and its survivor set must be consistent with the
    individual stage queries."""
    import duckdb

    from pdfrust_ray.pipelines.llmdata import (
        clean_pack_pipeline,
        clean_pack_pipeline_sql,
    )
    from pdfrust_ray.pipelines.quality import gopher_repetition

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    mine = clean_pack_pipeline(SF)
    assert len(mine) > 0
    oracle = con.execute(clean_pack_pipeline_sql()).df()
    cols = sorted(mine.columns)
    assert cols == sorted(oracle.columns)
    for c in cols:
        assert mine[c].tolist() == oracle[c].tolist(), c
    # stage consistency: no repetitive doc survives
    rep = set(gopher_repetition(SF).query("repetitive")["doc_id"])
    assert not (set(mine["doc_id"]) & rep)
    # packing invariant: no pack exceeds the budget unless single-doc
    sums = mine.groupby(["bucket", "pack_id"])["n_tokens"].agg(["sum", "count"])
    assert ((sums["sum"] <= 128) | (sums["count"] == 1)).all()
