"""ANN index persistence: save/load for the IVF index and PQ codebook —
at 100 TB an index is trained once and served by many jobs, never
retrained per query.

Layout on disk (any pyarrow-reachable filesystem via fsio):

- IVF:  ``{path}/assigned/cluster=<k>/*.parquet`` (the vectors,
  PARTITIONED BY cluster — so a probe of ``n_probes`` clusters is a
  partition-pruned scan reading only those directories, the on-disk
  analogue of the in-memory probe filter) + ``{path}/centroids.json``.
- PQ:   ``{path}/codes/*.parquet`` (id + m-byte codes) +
  ``{path}/codebook.json`` ((m, ksub, dsub) nested lists).

Loaded indexes reproduce the in-memory search results exactly (pinned by
tests/test_ann_store.py, including the partition-pruning plan property).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from tulflow_spark.io import read_parquet as _read_parquet
from pyspark.sql import functions as F

from tulflow_spark import fsio
from tulflow_spark.ext.ivf import IvfIndex


class LoadedIvfIndex(IvfIndex):
    """IvfIndex whose centroids came from disk (no pyspark.ml model)."""

    def __init__(self, centroids: np.ndarray, assigned: DataFrame,
                 vec_col: str, id_col: str):
        self.model = None
        self.assigned = assigned
        self.vec_col = vec_col
        self.id_col = id_col
        self.centroids = centroids


def save_ivf_index(index: IvfIndex, path: str) -> None:
    """Write the assigned vectors partitioned by cluster + the centroid
    sidecar.  The partitioned layout is the point: a later probe scans
    only the probed clusters' directories."""
    index.assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{path}/assigned"
    )
    fs, p = fsio.resolve(f"{path}/centroids.json")
    with fs.open_output_stream(p) as out:
        out.write(json.dumps(index.centroids.tolist()).encode("utf-8"))


def load_ivf_index(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> LoadedIvfIndex:
    fs, p = fsio.resolve(f"{path}/centroids.json")
    with fs.open_input_stream(p) as stream:
        centroids = np.asarray(json.loads(stream.read().decode("utf-8")))
    assigned = _read_parquet(spark, f"{path}/assigned")
    return LoadedIvfIndex(centroids, assigned, vec_col, id_col)


def save_pq(codebook: np.ndarray, codes: DataFrame, path: str) -> None:
    """Persist the (m, ksub, dsub) codebook + the encoded-codes frame."""
    codes.write.mode("overwrite").parquet(f"{path}/codes")
    fs, p = fsio.resolve(f"{path}/codebook.json")
    with fs.open_output_stream(p) as out:
        out.write(json.dumps(codebook.tolist()).encode("utf-8"))


def load_pq(spark: SparkSession, path: str) -> tuple[np.ndarray, DataFrame]:
    fs, p = fsio.resolve(f"{path}/codebook.json")
    with fs.open_input_stream(p) as stream:
        codebook = np.asarray(json.loads(stream.read().decode("utf-8")))
    return codebook, _read_parquet(spark, f"{path}/codes")


def assign_euclidean(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid assignment under EUCLIDEAN distance (the metric
    pyspark.ml KMeans trained the IVF coarse quantizer with — assignment
    for maintenance must match the index's own metric, not cosine).
    Map-only: one ``(batch × d)·(d × k)`` numpy computation per Arrow
    batch, centroids ride in the closure."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf("int")
    def nearest(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
            # argmin ||x-c||² = argmin (c·c − 2 x·c); x·x is constant per row
            d2 = c_sq[None, :] - 2.0 * (X @ C.T)
            yield pd.Series(np.argmin(d2, axis=1).astype("int32"))

    return df.withColumn("cluster", nearest(F.col(vec_col)))


def append_to_ivf_index(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    vec_col: str = "embedding",
) -> int:
    """Incremental index maintenance: assign a batch of NEW vectors to the
    saved index's existing centroids (no retrain) and append them into the
    cluster-partitioned layout.  Returns the number of appended rows.

    The 100 TB operating mode: the coarse quantizer is retrained rarely
    (distribution drift), while daily ingest appends — a map-only
    assignment plus a partitioned append, no shuffle of existing data."""
    fs, p = fsio.resolve(f"{path}/centroids.json")
    with fs.open_input_stream(p) as stream:
        centroids = np.asarray(json.loads(stream.read().decode("utf-8")))
    assigned = assign_euclidean(new_df, centroids, vec_col)
    n = assigned.count()
    assigned.write.mode("append").partitionBy("cluster").parquet(
        f"{path}/assigned"
    )
    return n


def save_ivfpq(index, path: str) -> None:
    """Persist an :class:`~tulflow_spark.ext.ivfpq.IvfPqIndex`: the encoded
    (id, cluster, codes) frame PARTITIONED BY cluster — so a probe of
    n_probes clusters is a partition-pruned directory scan over m-byte
    codes, the full serving layout (train once / serve many) — plus the
    centroid and residual-codebook sidecars."""
    index.encoded.select(
        index.id_col, "cluster", "pq_codes"
    ).write.mode("overwrite").partitionBy("cluster").parquet(
        f"{path}/codes"
    )
    fs, p = fsio.resolve(f"{path}/meta.json")
    with fs.open_output_stream(p) as out:
        out.write(json.dumps({
            "centroids": index.centroids.tolist(),
            "codebook": index.codebook.tolist(),
            "id_col": index.id_col,
            "vec_col": index.vec_col,
        }).encode("utf-8"))


def load_ivfpq(spark: SparkSession, path: str):
    """Load a served IVF-PQ index: codes come back cluster-partitioned
    (probe filters prune directories), the model sidecars rebuild the
    driver-side centroids/codebook.  Loaded search == in-memory search
    (pinned in tests/test_ann_store.py); exact re-rank is unavailable
    (codes-only store keeps no raw vectors — rerank against the source
    table instead)."""
    from tulflow_spark.ext.ivfpq import IvfPqIndex

    fs, p = fsio.resolve(f"{path}/meta.json")
    with fs.open_input_stream(p) as stream:
        meta = json.loads(stream.read().decode("utf-8"))
    encoded = _read_parquet(spark, f"{path}/codes")
    return IvfPqIndex(
        centroids=np.asarray(meta["centroids"]),
        codebook=np.asarray(meta["codebook"]),
        encoded=encoded,
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
    )


def append_to_ivfpq(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental IVF-PQ maintenance: assign NEW vectors to the saved
    coarse centroids (max-cosine, the index's assignment metric), encode
    their residuals with the EXISTING codebook, and append the m-byte
    codes into the cluster-partitioned layout — no retrain, no shuffle of
    existing codes.  Returns the number of appended rows.

    Same operating mode as :func:`append_to_ivf_index`: quantizers retrain
    rarely (drift), ingest appends daily; appended vectors are immediately
    searchable because :func:`ivfpq_topk` only reads (cluster, codes)."""
    from pyspark.sql import functions as F

    from tulflow_spark.ext.kmeans import assign_clusters
    from tulflow_spark.ext.pq import pq_encode

    fs, p = fsio.resolve(f"{path}/meta.json")
    with fs.open_input_stream(p) as stream:
        meta = json.loads(stream.read().decode("utf-8"))
    centroids = np.asarray(meta["centroids"])
    codebook = np.asarray(meta["codebook"])
    assigned = assign_clusters(
        new_df.select(id_col, vec_col), centroids.tolist(), vec_col=vec_col
    )
    from tulflow_spark.ext.ivfpq import with_residuals

    with_res = with_residuals(assigned, centroids, vec_col)
    encoded = pq_encode(with_res, codebook, vec_col="_residual").select(
        id_col, "cluster", "pq_codes"
    )
    # cache around the two actions: counting must not re-run the
    # assignment + Arrow-batched pq_encode pipeline the write executes
    encoded = encoded.cache()
    try:
        n = encoded.count()
        encoded.write.mode("append").partitionBy("cluster").parquet(
            f"{path}/codes"
        )
    finally:
        encoded.unpersist()
    return n


def ivfpq_assignment_drift(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.25,
) -> tuple[float, bool, DataFrame]:
    """Retrain-trigger policy for :func:`append_to_ivfpq`: PSI between the
    stored index's cluster-size distribution and a candidate batch's
    assignment distribution (same max-cosine metric the index assigns
    with).  Returns ``(psi, should_retrain, per_cluster_table)`` — retrain
    the coarse quantizer when appended traffic concentrates into clusters
    the index wasn't balanced for (the standard PSI > 0.25 action level;
    0.1-0.25 is "watch").

    Cost shape: the stored side reads ONLY the ``cluster`` partition
    column of the codes layout (no code bytes touched) and both sides
    partial-aggregate to k rows before the shuffle; the PSI arithmetic is
    ext.monitor.psi_table's engine-exact ROUND(…,9) form.
    """
    from tulflow_spark.ext.kmeans import assign_clusters
    from tulflow_spark.ext.monitor import psi_table

    fs, p = fsio.resolve(f"{path}/meta.json")
    with fs.open_input_stream(p) as stream:
        meta = json.loads(stream.read().decode("utf-8"))
    centroids = np.asarray(meta["centroids"])
    stored = _read_parquet(spark, f"{path}/codes").select(
        F.lit(0).alias("_split"), F.col("cluster")
    )
    new = assign_clusters(
        new_df.select(id_col, vec_col), centroids.tolist(), vec_col=vec_col
    ).select(F.lit(1).alias("_split"), "cluster")
    tbl = psi_table(
        stored.unionByName(new), "_split", "cluster",
        n_buckets=len(centroids),
    )
    psi = float(
        tbl.agg(
            F.round(
                F.sum(F.col("term").cast("decimal(30,9)")).cast("double"), 9
            )
        ).head()[0]
    )
    return psi, psi > threshold, tbl
