"""Persisted MinHash index (ext/dedup_store.py): save / match / dedup /
append semantics on a hand-built corpus plus the real documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from tulflow_spark.ext.dedup_store import (
    append_to_minhash_index,
    dedup_against_index,
    match_against_index,
    save_minhash_index,
)

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "pack my box with five dozen liquor jugs before the long trip"),
    (3, "completely unrelated text about astronomy and the orbits of mars"),
]
SCHEMA = "doc_id long, text string"


def _index(spark, tmp_path):
    path = str(tmp_path / "mhidx")
    n = save_minhash_index(
        spark.createDataFrame(BASE, SCHEMA), "doc_id", "text", path
    )
    assert n == 3
    return path


def test_exact_copy_matches_at_one(spark, tmp_path):
    path = _index(spark, tmp_path)
    new = spark.createDataFrame([(101, BASE[0][1])], SCHEMA)
    m = match_against_index(spark, path, new, "doc_id", "text").collect()
    assert len(m) == 1
    assert (m[0].new_id, m[0].match_id, m[0].est_jaccard) == (101, 1, 1.0)


def test_near_dup_and_unrelated(spark, tmp_path):
    path = _index(spark, tmp_path)
    # appended word: 10 of 11 shingles shared (J ~ 0.91) — reliably
    # banded at k=32/bands=8, unlike a mid-text edit at J ~ 0.5
    near = BASE[1][1] + " yesterday"
    new = spark.createDataFrame(
        [(102, near), (103, "totally fresh content on deep sea biology")],
        SCHEMA,
    )
    m = {r.new_id: r for r in match_against_index(
        spark, path, new, "doc_id", "text", threshold=0.5
    ).collect()}
    assert 102 in m and m[102].match_id == 2
    assert 0.5 <= m[102].est_jaccard <= 1.0
    assert 103 not in m


def test_dedup_survivors_and_append_roundtrip(spark, tmp_path):
    path = _index(spark, tmp_path)
    new = spark.createDataFrame(
        [(101, BASE[0][1]), (103, "totally fresh content on deep sea biology")],
        SCHEMA,
    )
    clean = dedup_against_index(spark, path, new, "doc_id", "text")
    assert set(clean.columns) == {"doc_id", "text"}
    assert {r.doc_id for r in clean.collect()} == {103}
    # append the survivor; a copy of it must now match
    assert append_to_minhash_index(spark, path, clean, "doc_id", "text") == 1
    again = spark.createDataFrame(
        [(201, "totally fresh content on deep sea biology")], SCHEMA
    )
    m = match_against_index(spark, path, again, "doc_id", "text").collect()
    assert len(m) == 1 and m[0].match_id == 103 and m[0].est_jaccard == 1.0


def test_incremental_agrees_with_batch_lsh(spark, sf_dir, tmp_path):
    """Index half the documents table, match the other half against it:
    every reported match must also be a minhash_lsh_pairs candidate of
    the union corpus at the same parameters (the incremental path finds a
    subset-restricted view of the batch result, with the estimator in
    place of exact Jaccard)."""
    from tulflow_spark.ext.dedup import minhash_lsh_pairs
    from tulflow_spark.io import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "mhidx")
    save_minhash_index(old, "doc_id", "text", path)
    inc = match_against_index(
        spark, path, new, "doc_id", "text", threshold=0.9
    ).collect()
    # batch reference: cross-parity pairs (one even, one odd id) at a
    # threshold low enough that est>=0.9 implies batch-candidate status
    batch = minhash_lsh_pairs(
        docs, "doc_id", "text", k=32, bands=8, threshold=0.3
    ).collect()
    batch_pairs = {
        frozenset((r.id_a, r.id_b)) for r in batch
        if (r.id_a % 2) != (r.id_b % 2)
    }
    assert len(inc) > 0  # the corpus contains cross-half near-dups
    for r in inc:
        assert frozenset((r.new_id, r.match_id)) in batch_pairs, (
            r.new_id, r.match_id,
        )
