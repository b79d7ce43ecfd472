"""sinks/training_export.py: deterministic shard export + manifest audit."""

from __future__ import annotations

import json

from tulflow_spark.sinks.training_export import (
    verify_training_shards,
    write_training_shards,
)


def _corpus(spark, n=300):
    return spark.createDataFrame(
        [(i, f"doc {i} body", 5 + i % 7) for i in range(n)],
        "doc_id long, text string, n_tok int",
    )


def test_export_roundtrip_and_manifest(spark, tmp_path):
    df = _corpus(spark)
    m = write_training_shards(
        df, str(tmp_path / "exp"), "doc_id", token_count_col="n_tok"
    )
    assert m["total_rows"] == 300
    assert m["total_tokens"] == sum(5 + i % 7 for i in range(300))
    assert sum(s["rows"] for s in m["shards"].values()) == 300
    # manifest on disk equals the returned dict
    on_disk = json.loads((tmp_path / "exp" / "manifest.json").read_text())
    assert on_disk == json.loads(json.dumps(m, sort_keys=True))
    # every row readable, shard column present, ids complete
    back = spark.read.parquet(str(tmp_path / "exp" / "data"))
    assert back.count() == 300
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(range(300))


def test_export_is_seed_deterministic(spark, tmp_path):
    df = _corpus(spark, 100)
    m1 = write_training_shards(df, str(tmp_path / "a"), "doc_id")
    m2 = write_training_shards(
        df.repartition(7), str(tmp_path / "b"), "doc_id"
    )
    assert m1["shards"] == m2["shards"]  # partitioning-insensitive
    m3 = write_training_shards(
        df, str(tmp_path / "c"), "doc_id", seed="epoch-1"
    )
    assert m3["shards"] != m1["shards"]  # new epoch = new permutation


def test_verify_detects_tampering(spark, tmp_path):
    df = _corpus(spark, 120)
    write_training_shards(df, str(tmp_path / "v"), "doc_id")
    assert verify_training_shards(spark, str(tmp_path / "v"))["ok"]
    # corrupt: delete one shard directory wholesale
    import shutil

    victim = next((tmp_path / "v" / "data").glob("shard=*"))
    shutil.rmtree(victim)
    got = verify_training_shards(spark, str(tmp_path / "v"))
    assert not got["ok"]
    assert any("missing on disk" in m for m in got["mismatches"])


def test_append_versions_manifest_and_extends_shards(spark, tmp_path):
    from tulflow_spark.sinks.training_export import append_training_shards

    df = _corpus(spark, 200)
    m1 = write_training_shards(
        df, str(tmp_path / "inc"), "doc_id", token_count_col="n_tok"
    )
    assert m1["version"] == 1
    new = spark.createDataFrame(
        [(i, f"new doc {i}", 4) for i in range(1000, 1100)],
        "doc_id long, text string, n_tok int",
    )
    m2 = append_training_shards(spark, str(tmp_path / "inc"), new)
    assert m2["version"] == 2
    assert m2["total_rows"] == 300
    assert m2["total_tokens"] == m1["total_tokens"] + 400
    # the superseded manifest is archived verbatim
    archived = json.loads(
        (tmp_path / "inc" / "manifest-v00001.json").read_text()
    )
    assert archived == json.loads(json.dumps(m1, sort_keys=True))
    # post-append audit passes; all 300 ids present
    assert verify_training_shards(spark, str(tmp_path / "inc"))["ok"]
    back = spark.read.parquet(str(tmp_path / "inc" / "data"))
    assert back.count() == 300


def test_compact_one_file_per_shard_manifest_commit(spark, tmp_path):
    from tulflow_spark.sinks.training_export import (
        append_training_shards,
        compact_training_shards,
    )

    df = _corpus(spark, 150)
    write_training_shards(
        df, str(tmp_path / "c"), "doc_id", token_count_col="n_tok"
    )
    new = spark.createDataFrame(
        [(i, f"n{i}", 3) for i in range(500, 560)],
        "doc_id long, text string, n_tok int",
    )
    m2 = append_training_shards(spark, str(tmp_path / "c"), new)
    m3 = compact_training_shards(spark, str(tmp_path / "c"))
    assert m3["version"] == 3 and m3["data_dir"] == "data-v00003"
    # one parquet file per shard directory in the compacted layout
    for sd in (tmp_path / "c" / "data-v00003").glob("shard=*"):
        files = [f for f in sd.iterdir() if f.suffix == ".parquet"]
        assert len(files) == 1, sd
    # audit (resolving data_dir from the manifest) still green, counts kept
    got = verify_training_shards(spark, str(tmp_path / "c"))
    assert got["ok"], got
    back = spark.read.parquet(str(tmp_path / "c" / "data-v00003"))
    assert back.count() == 210
    assert m3["shards"] == m2["shards"]  # stats unchanged by compaction


def test_vacuum_removes_only_superseded_dirs(spark, tmp_path):
    from tulflow_spark.sinks.training_export import (
        compact_training_shards,
        vacuum_training_export,
    )

    df = _corpus(spark, 80)
    write_training_shards(df, str(tmp_path / "v2"), "doc_id")
    compact_training_shards(spark, str(tmp_path / "v2"))
    assert (tmp_path / "v2" / "data").exists()
    deleted = vacuum_training_export(str(tmp_path / "v2"))
    assert deleted == ["data"]
    assert not (tmp_path / "v2" / "data").exists()
    assert (tmp_path / "v2" / "data-v00002").exists()
    assert verify_training_shards(spark, str(tmp_path / "v2"))["ok"]


def test_export_all_null_token_shard_records_null(spark, tmp_path):
    """ADVICE r6: a shard whose every row has NULL token_count must land
    in the manifest as tokens=null (not crash on int(None)), stay out of
    total_tokens, and still verify green."""
    df = spark.createDataFrame(
        [(i, f"doc {i}", None if i % 2 else 7) for i in range(40)],
        "doc_id long, text string, n_tok int",
    )
    m = write_training_shards(
        df, str(tmp_path / "nulls"), "doc_id", token_count_col="n_tok"
    )
    # with 40 ids over 256 shards, some shard holds only odd (NULL) ids
    assert any(s["tokens"] is None for s in m["shards"].values())
    assert m["total_tokens"] == sum(7 for i in range(40) if i % 2 == 0)
    audit = verify_training_shards(spark, str(tmp_path / "nulls"))
    assert audit["ok"], audit["mismatches"]
