#!/usr/bin/env python
"""Generate above-sf0.1 scale probes for documents/embeddings (r4 VERDICT
#6): tile the driver's sf0.1 corpus K times with controlled perturbation.

Tiling preserves the source-domain skew of the driver corpus and — because
most rows replicate verbatim across copies — creates realistic crawl-style
duplication: K-cliques for the dedup graph, K-deep LSH buckets, K-fold
exact-dup groups.  That is exactly the structure the bucket-cap and skew
claims need stressing under.  ~10% of copied docs get a suffix token so the
near-dup (not exact-dup) path sees load too; copied embeddings get small
deterministic Gaussian noise for the same reason.

Usage: python tools/make_scaledata.py [K] [out_dir]
  K default 10 (≈sf1: 50k docs / 20k vectors); out defaults to
  /root/repo/scaledata/sf1.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scaledata/sf1"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(5)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = docs.num_rows
    doc_id = docs.column("doc_id").to_numpy()
    text = docs.column("text").to_pylist()
    lang = docs.column("lang").to_pylist()
    source = docs.column("source").to_pylist()

    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for c in range(k):
        mutate = rng.random(n) < (0.1 if c else 0.0)
        for i in range(n):
            t = text[i]
            if mutate[i] and t:
                t = f"{t} copyvar{c}"
            ids.append(int(doc_id[i]) + c * 10_000_000)
            texts.append(t)
            langs.append(lang[i])
            sources.append(source[i])
            n_chars.append(len(t) if t else 0)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
    )

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    m = emb.num_rows
    vec_id = emb.column("vec_id").to_numpy()
    vecs = np.asarray(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = emb.column("label").to_numpy()
    all_ids, all_vecs, all_labels = [], [], []
    for c in range(k):
        v = vecs.copy()
        if c:
            v += rng.normal(0, 0.01, size=v.shape).astype(np.float32)
        all_ids.append(vec_id + c * 10_000_000)
        all_vecs.append(v)
        all_labels.append(labels)
    flat = np.concatenate(all_vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(all_ids), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.reshape(-1), pa.float32()), flat.shape[1]
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(
                    np.concatenate(all_labels).astype(np.int32), pa.int32()
                ),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )
    print(f"wrote {len(ids)} docs / {flat.shape[0]} vectors to {out_dir}")


if __name__ == "__main__":
    main()
