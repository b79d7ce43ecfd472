"""IVF (inverted-file) approximate nearest-neighbor index over an embedding
column — the coarse-quantization scale path for similarity search.

Shape (classic IVF-Flat):

1. **train**: KMeans (pyspark.ml, fixed seed) over a sample → ``n_clusters``
   centroids;
2. **assign**: every vector gets its nearest-centroid id — a one-time
   map-side pass (pyspark.ml transform); write the table partitioned/
   bucketed by ``cluster`` and searches become partition-pruned scans;
3. **search**: score the query against centroids (driver-side, tiny), pick
   the ``n_probes`` nearest clusters, exact-rerank ONLY those clusters'
   rows (scan fraction ≈ n_probes / n_clusters).

Compared to sign-LSH (`similarity.lsh_topk`): IVF adapts to the data
distribution (centroids follow density), costs a training pass, and gives a
tunable recall/latency dial via ``n_probes``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tulflow_spark.ext.similarity import cosine


class IvfIndex:
    def __init__(self, model, assigned: DataFrame, vec_col: str, id_col: str):
        self.model = model
        self.assigned = assigned  # original columns + 'cluster'
        self.vec_col = vec_col
        self.id_col = id_col
        self.centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])

    def search(self, vec, k: int = 10, n_probes: int = 4) -> DataFrame:
        """Exact rerank within the n_probes nearest clusters."""
        q = np.asarray(list(vec), dtype=float)
        # nearest centroids by euclidean distance (KMeans' own metric)
        dists = np.linalg.norm(self.centroids - q, axis=1)
        probe_ids = [int(i) for i in np.argsort(dists)[:n_probes]]
        qcol = F.array(*[F.lit(float(x)) for x in q])
        return (
            self.assigned.filter(F.col("cluster").isin(probe_ids))
            .select(
                F.col(self.id_col),
                cosine(F.col(self.vec_col), qcol).alias("cosine_sim"),
            )
            .orderBy(F.col("cosine_sim").desc(), F.col(self.id_col))
            .limit(k)
        )


def build_ivf_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
) -> IvfIndex:
    """Train + assign.  The assigned frame is lazily computed; persist or
    write it bucketed-by-cluster for repeated querying at scale."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="_features", predictionCol="cluster"
    ).fit(feat)
    assigned = model.transform(feat).drop("_features")
    return IvfIndex(model, assigned, vec_col, id_col)
