"""Property-based tests (hypothesis) for the round-6 pure logic:
hash_split threshold arithmetic, the lexical Jaccard scorer, and the
decontamination gram invariants — cheap per-example (no Spark jobs),
hardening the surfaces the oracle pairs only probe at fixed points."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tulflow_spark.ext.rerank import token_jaccard_scorer

_word = st.text(alphabet="abcdefghijklmnop", min_size=1, max_size=6)
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@given(st.lists(st.floats(0.01, 1.0), min_size=2, max_size=5),
       st.integers(0, 10_000))
@settings(max_examples=200, deadline=None)
def test_hash_split_thresholds_partition_exhaustively(raw, doc_id):
    """The threshold chain assigns every md5 key to exactly one split,
    for ANY normalized weight vector — including chains whose cumulative
    sum hits 1.0 early (the 'g' sentinel clamp)."""
    total = sum(raw)
    names = [f"s{i}" for i in range(len(raw))]
    weights = dict(zip(names, [w / total for w in raw]))
    # replicate hash_split's driver-side threshold derivation
    cum = 0.0
    thresholds = []
    for name in sorted(weights)[:-1]:
        cum += weights[name]
        thresholds.append(
            (name, "g" if cum >= 1.0 else format(int(cum * 16**8), "08x"))
        )
    key8 = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
    assigned = sorted(weights)[-1]
    for name, t in thresholds:
        if key8 < t:
            assigned = name
            break
    # exactly one split wins and it is a declared split
    assert assigned in weights
    # thresholds are monotone non-decreasing strings
    ts = [t for _, t in thresholds]
    assert ts == sorted(ts)


@given(_text, _text)
@settings(max_examples=200, deadline=None)
def test_token_jaccard_bounds_and_symmetry(a, b):
    s_ab = token_jaccard_scorer(pd.Series([a]), pd.Series([b]))[0]
    s_ba = token_jaccard_scorer(pd.Series([b]), pd.Series([a]))[0]
    assert s_ab == s_ba
    assert 0.0 <= s_ab <= 1.0
    assert token_jaccard_scorer(pd.Series([a]), pd.Series([a]))[0] == (
        1.0 if a.strip() else 0.0
    )
    # reference implementation agreement
    ta = set(a.split())
    tb = set(b.split())
    expect = len(ta & tb) / len(ta | tb) if (ta | tb) else 0.0
    assert math.isclose(s_ab, expect)


@given(st.lists(_word, min_size=0, max_size=15), st.integers(2, 5))
@settings(max_examples=200, deadline=None)
def test_gram_count_matches_token_arithmetic(tokens, n):
    """Python reference of the gram construction: a doc with t tokens has
    max(t - n + 1, 0) positional n-grams; distinct count is bounded by
    it.  (The Spark expression's parity with DuckDB is oracle-gated; this
    pins the combinatorics the bounds rely on.)"""
    grams = [" ".join(tokens[i : i + n])
             for i in range(max(len(tokens) - n + 1, 0))]
    assert len(grams) == max(len(tokens) - n + 1, 0)
    assert len(set(grams)) <= len(grams)
    # every gram has exactly n tokens
    assert all(len(g.split()) == n for g in grams)
