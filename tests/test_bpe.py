"""Learned BPE: the distributed trainer must reproduce, merge for merge,
an independent in-test implementation of the published algorithm (Sennrich
et al. 2016), with the same deterministic tie-break."""

from __future__ import annotations

from collections import Counter

import pytest

from tulflow_spark.ext.bpe import END, bpe_encode, bpe_train, word_vocab

# --- independent reference trainer (dict-based, single-process) -----------


def ref_train(texts: list[str], num_merges: int, min_freq: int = 2):
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w) + (END,)] += 1
    merges = []
    for _ in range(num_merges):
        stats = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += freq
        if not stats:
            break
        # count DESC, then (left, right) ASC — mirror of the Spark orderBy
        (left, right), n = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_freq:
            break
        merges.append((left, right))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


CORPUS = [
    "the lower the newer the wider",
    "low lower lowest new newer newest",
    "wide wider widest low low low",
    "new new newer lowest wide wide",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


def test_word_vocab_counts(spark, docs):
    v = {r.word: r.freq for r in word_vocab(docs).collect()}
    assert v["the"] == 3 and v["low"] == 4 and v["newer"] == 3


def test_trainer_matches_reference_exactly(spark, docs):
    want = ref_train(CORPUS, 20)
    got = bpe_train(docs, 20, checkpoint_every=5)
    assert got == want
    assert len(got) == 20


def test_trainer_min_freq_stops_early(spark, docs):
    got = bpe_train(docs, 500, min_freq=4)
    want = ref_train(CORPUS, 500, min_freq=4)
    assert got == want
    assert 0 < len(got) < 500


def test_encode_uses_learned_merges(spark, docs):
    merges = ref_train(CORPUS, 30)
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    # 'low' appears 4 times and 'lowest'/'lower' share the prefix: 'low'
    # must have fused into a single symbol somewhere in doc 1
    toks1 = out[1].tokens
    assert any(t.startswith("low") and len(t) >= 3 for t in toks1)
    assert out[1].n_tokens == len(toks1)
    # greedy fold and the classic encoder agree on a fresh word made of
    # learned pieces
    ranks = {p: i for i, p in enumerate(merges)}
    from tulflow_spark.ext.bpe import _encode_word

    enc = _encode_word("lowness", ranks)
    assert "".join(enc) == "lowness" + END


def test_encode_empty_and_whitespace(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None)], "doc_id bigint, text string"
    )
    out = {r.doc_id: r.n_tokens for r in bpe_encode(df, [("l", "o")]).collect()}
    assert out == {0: 0, 1: 0, 2: 0}
